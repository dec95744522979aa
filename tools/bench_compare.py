"""Compare two bench JSON records query-by-query.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json

Accepts either the raw bench.py output line or the driver's wrapper
({"parsed": {...}} / {"tail": "..."}). Prints per-query ratios for the
common set, the common-set totals, and entries unique to each side.
Box-noise caveat: single-machine timings drift 15-20% day to day —
read RATIOS on the common set, not absolute seconds (BASELINE.md).
"""

from __future__ import annotations

import json
import sys


def load_queries(
    path: str,
) -> tuple[dict[str, float], float | None, dict[str, float]]:
    """Returns (per-query medians, sentinel median or None, extras)."""
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d["queries"], d.get("sentinel"), d.get("extras", {})
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        p = d["parsed"]
        return p["queries"], p.get("sentinel"), p.get("extras", {})
    # driver wrapper with a (possibly left-truncated) 'tail' fragment —
    # recover per-query medians with a regex over the region before the
    # raw 'runs' dict (entries there are lists, not scalars, so they
    # don't match)
    import re

    tail = d.get("tail", "")
    region = tail.split('"runs"')[0]
    pairs = re.findall(r'"(q\w+)":\s*([0-9.]+)', region)
    if not pairs:
        raise SystemExit(f"{path}: no queries dict found")
    m = re.search(r'"sentinel":\s*([0-9.]+)', tail)
    extras: dict[str, float] = {}
    ex_region = tail.split('"extras"')
    if len(ex_region) > 1:
        # the extras dict runs to its closing brace; entries are scalars
        ex_body = ex_region[1].split("}")[0]
        extras = {
            k: float(v)
            for k, v in re.findall(r'"(\w+)":\s*([0-9.]+)', ex_body)
        }
    return (
        {k: float(v) for k, v in pairs},
        (float(m.group(1)) if m else None),
        extras,
    )


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a_path, b_path = sys.argv[1], sys.argv[2]
    (a, sent_a, ex_a), (b, sent_b, ex_b) = load_queries(a_path), load_queries(b_path)
    # sentinel normalization (VERDICT r05 #3): the sentinel is a fixed,
    # never-optimized probe, so sent_b/sent_a measures the BOX between
    # the two records; dividing it out of each ratio attributes what is
    # left to the code. norm = raw * sent_a / sent_b.
    scale = (sent_a / sent_b) if sent_a and sent_b else None
    if scale is not None:
        print(
            f"sentinel A={sent_a:.2f}s B={sent_b:.2f}s -> box drift "
            f"x{sent_b / sent_a:.2f}; 'norm' divides it out"
        )
    else:
        print("sentinel missing on one side: raw ratios only")
    common = sorted(set(a) & set(b))
    hdr = f"{'query':34s} {'A':>8s} {'B':>8s}  ratio B/A"
    print(hdr + ("      norm" if scale is not None else ""))
    for q in common:
        r = b[q] / a[q] if a[q] else float("inf")
        rn = r * scale if scale is not None else None
        judged = rn if rn is not None else r
        flag = "  <<<" if judged <= 0.8 else ("  !!!" if judged >= 1.5 else "")
        norm_s = f"  {rn:8.2f}" if rn is not None else ""
        print(f"{q:34s} {a[q]:8.2f} {b[q]:8.2f}  {r:8.2f}{norm_s}{flag}")
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    # a driver-wrapped artifact (timings only in its truncated 'tail')
    # parses to zero common time — report inf instead of crashing
    tr = tb / ta if ta else float("inf")
    tn = f"  {tr * scale:8.2f}" if scale is not None else ""
    print(f"{'COMMON TOTAL':34s} {ta:8.2f} {tb:8.2f}  {tr:8.2f}{tn}")
    for name, only in (("A", set(a) - set(b)), ("B", set(b) - set(a))):
        if only:
            print(f"only in {name}: {', '.join(sorted(only))}")
    # extras: the pytest-only operators (beyond the capped 50-query
    # registry) — same ratio/norm treatment so a regression in an
    # operator with no registry slot is still visible round-over-round
    ex_common = sorted(set(ex_a) & set(ex_b))
    if ex_common:
        print("\nextras (non-registry operators)")
        for q in ex_common:
            r = ex_b[q] / ex_a[q] if ex_a[q] else float("inf")
            rn = r * scale if scale is not None else None
            judged = rn if rn is not None else r
            flag = "  <<<" if judged <= 0.8 else ("  !!!" if judged >= 1.5 else "")
            norm_s = f"  {rn:8.2f}" if rn is not None else ""
            print(f"{q:34s} {ex_a[q]:8.2f} {ex_b[q]:8.2f}  {r:8.2f}{norm_s}{flag}")
    for name, only in (("A", set(ex_a) - set(ex_b)), ("B", set(ex_b) - set(ex_a))):
        if only:
            print(f"extras only in {name}: {', '.join(sorted(only))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
