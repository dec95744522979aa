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


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
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
    return {k: float(v) for k, v in pairs}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load_queries(a_path), load_queries(b_path)
    common = sorted(set(a) & set(b))
    print(f"{'query':34s} {'A':>8s} {'B':>8s}  ratio B/A")
    for q in common:
        r = b[q] / a[q] if a[q] else float("inf")
        flag = "  <<<" if r <= 0.8 else ("  !!!" if r >= 1.5 else "")
        print(f"{q:34s} {a[q]:8.2f} {b[q]:8.2f}  {r:8.2f}{flag}")
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    print(f"{'COMMON TOTAL':34s} {ta:8.2f} {tb:8.2f}  {tb / ta:8.2f}")
    for name, only in (("A", set(a) - set(b)), ("B", set(b) - set(a))):
        if only:
            print(f"only in {name}: {', '.join(sorted(only))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
