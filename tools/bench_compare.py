"""Compare two bench JSON records query-by-query.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json

Accepts either the raw bench.py output line or the driver's wrapper
({"parsed": {...}} / {"tail": "..."}). Prints per-query ratios for the
common set, the common-set totals, and entries unique to each side.
Box-noise caveat: single-machine timings drift 15-20% day to day and
3-5x single-run — read the 'norm' column, not raw seconds. Since r10
each record carries per-query 'sentinel_at' probes (a fixed scan+agg
timed immediately before that query's runs), so 'norm' divides out the
box state AT each query, not just the session average — the r09
failure mode was a 3.5x mid-session drift that start/end sentinels
could not attribute.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> tuple[
    dict[str, float], float | None, dict[str, float], dict[str, float],
    float | None, dict[str, float],
]:
    """Returns (per-query medians, sentinel median or None, extras,
    per-query sentinel_at or {}, driver_sentinel or None,
    per-query driver_sentinel_at or {})."""
    with open(path) as fh:
        d = json.load(fh)
    p = None
    if "queries" in d:
        p = d
    elif isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        p = d["parsed"]
    if p is not None:
        return (
            p["queries"],
            p.get("sentinel"),
            p.get("extras", {}),
            p.get("sentinel_at", {}),
            p.get("driver_sentinel"),
            p.get("driver_sentinel_at", {}),
        )
    # driver wrapper with a (possibly left-truncated) 'tail' fragment.
    # Since r11 the emitted key order puts the compact essentials LAST
    # ("sentinel", "driver_sentinel", "queries", "sf"), so the medians
    # live after the '"queries"' marker; pre-r11 artifacts had them
    # before the raw 'runs' dict.
    import re

    def _scalar_dict(tail: str, key: str) -> dict[str, float]:
        region = tail.split(f'"{key}"')
        if len(region) < 2:
            return {}
        body = region[1].split("}")[0]
        return {
            k: float(v)
            for k, v in re.findall(r'"([\w#]+)":\s*([0-9.]+)', body)
        }

    tail = d.get("tail", "")
    if '"queries"' in tail:
        region = tail.split('"queries"', 1)[1].split("}", 1)[0]
        pairs = re.findall(r'"(q\w+)":\s*([0-9.]+)', region)
    else:
        # pre-r11 artifacts truncated the 'queries' medians away; the
        # raw per-run LISTS often survive in the tail — recover each
        # query's median from them (list values can't be confused with
        # extras/sentinel scalars)
        import statistics

        lists = re.findall(r'"(q\w+)":\s*\[([0-9.,\s]+)\]', tail)
        if lists:
            pairs = [
                (k, statistics.median(float(x) for x in v.split(",")))
                for k, v in lists
            ]
        else:
            region = tail.split('"runs"')[0]
            pairs = re.findall(r'"(q\w+)":\s*([0-9.]+)', region)
    if not pairs:
        raise SystemExit(f"{path}: no queries dict found")
    m = re.search(r'"sentinel":\s*([0-9.]+)', tail)
    dm = re.search(r'"driver_sentinel":\s*([0-9.]+)', tail)
    return (
        {k: float(v) for k, v in pairs},
        (float(m.group(1)) if m else None),
        _scalar_dict(tail, "extras"),
        _scalar_dict(tail, "sentinel_at"),
        (float(dm.group(1)) if dm else None),
        _scalar_dict(tail, "driver_sentinel_at"),
    )


# queries whose wall-clock is dominated by single-threaded DRIVER work
# (Py4J plan-build / analyzer — q34 profiles at ~4.5k round-trips, q55
# runs per-target towers off driver threads): the scan sentinel cannot
# normalize these, so their 'norm' uses the driver sentinel family
# when both artifacts carry it (marked 'd' in the output)
DRIVER_BOUND = {"q34_replication_roundtrip", "q55_multi_target_fanout"}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, sent_a, ex_a, sat_a, dsent_a, dsat_a = load_queries(a_path)
    b, sent_b, ex_b, sat_b, dsent_b, dsat_b = load_queries(b_path)
    # sentinel normalization (VERDICT r05 #3 / r09 #1): the sentinel is
    # a fixed, never-optimized probe, so sentinel_B/sentinel_A measures
    # the BOX between the two measurements; dividing it out of each
    # ratio attributes what is left to the code. Per-query probes
    # (sentinel_at, r10) beat the session median whenever present.
    scale = (sent_a / sent_b) if sent_a and sent_b else None
    if scale is not None:
        n_pq = len(set(sat_a) & set(sat_b))
        print(
            f"sentinel A={sent_a:.2f}s B={sent_b:.2f}s -> session box "
            f"drift x{sent_b / sent_a:.2f}; 'norm' divides out the "
            + (f"per-query probe ({n_pq} in common)" if n_pq else "session median")
        )
    else:
        print("sentinel missing on one side: raw ratios only")

    def _norm(q: str, ra: float, rb: float, fb_a=None, fb_b=None):
        """Ratio B/A with the best available sentinel divided out."""
        sa = sat_a.get(q, fb_a if fb_a else sent_a)
        sb = sat_b.get(q, fb_b if fb_b else sent_b)
        raw = rb / ra if ra else float("inf")
        if sa and sb:
            return raw, raw * (sa / sb)
        return raw, (raw * scale if scale is not None else None)

    def _driver_norm(q: str, ra: float, rb: float):
        """Driver-sentinel-normalized ratio for driver-bound queries,
        or None when either side lacks the driver family."""
        da = dsat_a.get(q, dsent_a)
        db = dsat_b.get(q, dsent_b)
        if da and db and ra:
            return (rb / ra) * (da / db)
        return None

    common = sorted(set(a) & set(b))
    hdr = f"{'query':34s} {'A':>8s} {'B':>8s}  ratio B/A"
    print(hdr + ("      norm" if scale is not None else ""))
    norm_total_a = norm_total_b = 0.0
    for q in common:
        r, rn = _norm(q, a[q], b[q])
        dmark = ""
        if q in DRIVER_BOUND:
            dn = _driver_norm(q, a[q], b[q])
            if dn is not None:
                rn, dmark = dn, "d"  # driver-normalized column
        judged = rn if rn is not None else r
        flag = "  <<<" if judged <= 0.8 else ("  !!!" if judged >= 1.5 else "")
        norm_s = f"  {rn:8.2f}{dmark}" if rn is not None else ""
        print(f"{q:34s} {a[q]:8.2f} {b[q]:8.2f}  {r:8.2f}{norm_s}{flag}")
        # sentinel-deflated seconds (box-independent units) for totals
        sa = sat_a.get(q, sent_a)
        sb = sat_b.get(q, sent_b)
        if sa and sb:
            norm_total_a += a[q] / sa
            norm_total_b += b[q] / sb
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    # a driver-wrapped artifact (timings only in its truncated 'tail')
    # parses to zero common time — report inf instead of crashing
    tr = tb / ta if ta else float("inf")
    if norm_total_a:
        tn = f"  {norm_total_b / norm_total_a:8.2f}"
    elif scale is not None:
        tn = f"  {tr * scale:8.2f}"
    else:
        tn = ""
    print(f"{'COMMON TOTAL':34s} {ta:8.2f} {tb:8.2f}  {tr:8.2f}{tn}")
    for name, only in (("A", set(a) - set(b)), ("B", set(b) - set(a))):
        if only:
            print(f"only in {name}: {', '.join(sorted(only))}")
    # extras: the pytest-only operators (beyond the capped 50-query
    # registry) — normalized with the extras-block sentinel when
    # present, else the session sentinel
    ex_common = sorted(set(ex_a) & set(ex_b))
    if ex_common:
        exs_a = sat_a.get("__extras__")
        exs_b = sat_b.get("__extras__")
        print("\nextras (non-registry operators)")
        for q in ex_common:
            r, rn = _norm(q, ex_a[q], ex_b[q], fb_a=exs_a, fb_b=exs_b)
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
