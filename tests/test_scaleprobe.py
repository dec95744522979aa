"""Scale-linearity pins for the heavy lanes (VERDICT r08 #7).

The probe corpus puts every replica in its own token namespace, so the
TRUE cost model of each lane is linear in the multiplier (cluster
sizes do not grow with corpus size — the realistic regime); the
assertion is that measured wall time at 8x input stays well under the
~15x bound the verdict set for a 10x step. A quadratic lane (e.g. a
band bucket that grows with the corpus, or an all-pairs join sneaking
in) would read ~64x here and fail loudly. Both measurements run in the
same session back-to-back, so the box-noise caveat (3-5x ACROSS
sessions) does not apply to the ratio.

Driver memory: the lanes must not accumulate driver-side state with
corpus size — RSS high-water growth across the whole probe is bounded.
"""
from __future__ import annotations


def test_heavy_lanes_scale_linearly(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.scaleprobe import (
        run_probe,
    )

    factor = 8
    probe = run_probe(
        spark,
        "/root/testdata/sf0.1",
        str(tmp_path),
        base_mult=1,
        factor=factor,
        zorder_base_mult=1,
        zorder_divisor=10,  # 60k -> 480k rows: the ratio is the pin
    )
    hi = f"{factor}x"
    for lane in ("minhash_cc", "close", "zorder"):
        r = probe[lane]
        # sanity: the big leg really processed factor x the rows
        assert r[hi]["rows"] == factor * r["1x"]["rows"]
        assert r["ratio"] <= 15.0, (lane, r)
    # the replica-namespaced corpus repeats the base cluster structure
    # once per replica: counts scale linearly up to the 32-bit
    # base-hash birthday collisions (~1.8M distinct shingles at 8x ->
    # a handful of accidental cross-replica merges; observed 5/38k —
    # allow 0.3%)
    def _close_to(hi_v, lo_v):
        return abs(hi_v - factor * lo_v) <= max(3, 0.003 * factor * lo_v)

    mc = probe["minhash_cc"]
    assert _close_to(mc[hi]["clusters"], mc["1x"]["clusters"]), mc
    cl = probe["close"]
    assert _close_to(cl[hi]["changed"], cl["1x"]["changed"]), cl
    # driver-side memory stays flat-ish: no collect() of anything that
    # grows with the corpus (high-water growth across the whole probe,
    # both scales and all lanes, bounded well under the data size)
    assert probe["rss_mb_after"] - probe["rss_mb_before"] <= 1500


def test_remaining_heavy_lanes_scale_linearly(spark, tmp_path):
    """VERDICT r09 #3: the three lanes with the minhash-family risk
    profile but (until r10) no measurement — SemDeDup's blocked
    intra-cluster triangle join (n_seeds scales with the corpus, so
    per-cluster pair counts stay bounded), the contamination screen's
    inverted-index fanout (token namespaces keep per-replica shingle
    dfs constant), and BPE training's per-round pair agg. Same <=15x
    gate for an 8x step; a quadratic lane would read ~64x."""
    from aws_glue_data_catalog_replication_utility_spark.scaleprobe import (
        run_probe,
    )

    factor = 8
    probe = run_probe(
        spark,
        "/root/testdata/sf0.1",
        str(tmp_path),
        base_mult=1,
        factor=factor,
        lanes=("semdedup", "contamination", "bpe"),
    )
    hi = f"{factor}x"
    for lane in ("semdedup", "contamination", "bpe"):
        r = probe[lane]
        assert r[hi]["rows"] == factor * r["1x"]["rows"]
        assert r["ratio"] <= 15.0, (lane, r)
    # replica-namespaced structure: per-replica results repeat, so
    # counts scale linearly (sign namespaces scramble cross-replica
    # cosines only toward zero — a scrambled pair can still land above
    # the 0.3 threshold occasionally, so allow a small overage)
    sd = probe["semdedup"]
    assert sd[hi]["dropped"] >= factor * sd["1x"]["dropped"] * 0.97
    ct = probe["contamination"]
    assert abs(ct[hi]["pairs"] - factor * ct["1x"]["pairs"]) <= max(
        3, 0.003 * factor * ct["1x"]["pairs"]
    )
    assert probe["rss_mb_after"] - probe["rss_mb_before"] <= 1500
