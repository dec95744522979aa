"""Synthetic scale probes for the heavy lanes (VERDICT r08 #7).

Driver testdata caps at sf0.1, so the 100x-scale claims rested on plan
shape alone; these probes measure WALL-TIME GROWTH of the three
heaviest lanes at 1x vs 10x of a synthetically scaled corpus and pin
that the growth is at most modestly super-linear (<= ~15x for 10x —
the slack covers shuffle constants and box noise, while still failing
loudly on anything quadratic, which would read 100x).

The corpus construction is the part that makes the measurement honest:
replicating sf0.1 documents verbatim would create one giant duplicate
cluster per source doc, whose band buckets grow QUADRATICALLY in the
multiplier — a corpus that punishes the very banding that makes the
lanes linear. Instead every replica lives in its own token namespace
(each token suffixed with the replica id), so replicas share no
shingles: the pair/cluster structure of the base corpus repeats once
per replica and the TRUE cost model is linear in the multiplier. This
mirrors real 100 TB corpora, where near-dup cluster sizes do not grow
with corpus size.

Lanes:
- minhash_cc: scan -> MinHash signatures -> LSH band pairs -> exact
  estimator verify -> alternating-star connected components (the q53 /
  near-dedup chain).
- close: `close_near_dedup_state` mode='full' over a fabricated
  stream state holding the whole corpus's banded signatures (the
  closure pass's worst case — the incremental mode exists precisely
  to avoid this on a live stream).
- zorder: quantile probe + bucket/interleave + range exchange +
  within-partition sort over replicated lineitem (the bench
  `zorder_layout` lane at multiplier scale).

Used by bench.py (small multipliers, per-round extras) and
tools/scale_probe.py (the big one-off table in SURVEY.md).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_scaled_corpus(
    spark: SparkSession, sf_dir: str, mult: int, out: str
) -> int:
    """documents x mult with per-replica token namespaces, written to
    parquet (generation stays OUTSIDE lane timers). Returns row count.
    The replica axis drives parallelism: the small documents relation
    is broadcast and each replica partition generates its own rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(mult).select(F.col("id").alias("r")).repartition(
        min(int(mult), spark.sparkContext.defaultParallelism)
    )
    corpus = reps.crossJoin(F.broadcast(docs)).select(
        (F.col("doc_id") * 100_000 + F.col("r")).alias("doc_id"),
        F.regexp_replace(
            F.col("text"), F.lit(r"(\S+)"), F.concat(F.lit("$1x"), F.col("r"))
        ).alias("text"),
    )
    corpus.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def lane_minhash_cc(spark: SparkSession, corpus_path: str) -> dict:
    """scan -> signatures -> band pairs -> exact-est verify -> CC."""
    from .functions.dedup import (
        connected_components_star,
        minhash_band_pairs,
        minhash_signature_arrays,
    )
    from .streaming.neardedup import _est_col

    docs = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    sigs = minhash_signature_arrays(docs, num_hashes=12).withColumn(
        "sig", F.array(*[F.col(f"mh_{i}") for i in range(12)])
    )
    cand = minhash_band_pairs(sigs, num_hashes=12, bands=4)
    s_a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("__sa"))
    s_b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("__sb"))
    pairs = (
        cand.join(s_a, "id_a")
        .join(s_b, "id_b")
        .select("id_a", "id_b", _est_col("__sa", "__sb", 12))
        .where(F.col("est") >= 0.7)
        .select("id_a", "id_b")
    )
    labels = connected_components_star(
        pairs, docs.select("doc_id"), "doc_id"
    )
    n_clusters = labels.select("label").distinct().count()
    return {
        "seconds": round(time.perf_counter() - t0, 3),
        "clusters": int(n_clusters),
    }


def setup_close_state(
    spark: SparkSession, corpus_path: str, state_root: str
) -> None:
    """Fabricate the stream-state layout close_near_dedup_state folds:
    every corpus doc a keeper (all-greedy decisions), all banded
    signatures in one batch directory — the closure pass then has to
    regenerate the full pair set, run CC, and rewrite the changed
    rows, which is exactly the cost being probed. Setup is untimed."""
    from .streaming.neardedup import _banded_signatures

    docs = spark.read.parquet(corpus_path)
    banded = _banded_signatures(docs, n=5, num_hashes=12, bands=4, normalize=False)
    banded.write.mode("overwrite").parquet(
        f"{state_root}/signatures/batch_id=0"
    )
    docs.select(
        "doc_id",
        F.lit(True).alias("keep"),
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("double").alias("est"),
        F.lit(0).cast("long").alias("batch_id"),
    ).write.mode("overwrite").parquet(f"{state_root}/decisions/batch_id=0")


def lane_close(spark: SparkSession, state_root: str) -> dict:
    from .streaming.close import close_near_dedup_state

    t0 = time.perf_counter()
    rep = close_near_dedup_state(
        spark, state_root, num_hashes=12, threshold=0.7, mode="full"
    )
    return {
        "seconds": round(time.perf_counter() - t0, 3),
        "changed": rep["changed_verdicts"],
        "docs": rep["docs"],
    }


def lane_zorder(
    spark: SparkSession, sf_dir: str, mult: int, divisor: int = 1
) -> dict:
    """The bench zorder_layout lane over (lineitem / divisor) x mult
    (keys offset per replica so the z-domain grows with the data, as
    it would in the wild). `divisor` shrinks the BASE slice — the
    per-round bench probes 60k -> 600k rows (divisor=10) so its wall
    budget stays bounded; the one-off big table (tools/scale_probe.py)
    runs the full 600k -> 6M."""
    from .functions.layout import zorder_layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    if divisor > 1:
        li = li.where(F.col("l_orderkey") % divisor == 0)
    reps = spark.range(mult).select(F.col("id").alias("r")).repartition(
        min(int(mult), spark.sparkContext.defaultParallelism)
    )
    big = reps.crossJoin(F.broadcast(li)).select(
        (F.col("l_orderkey") + F.col("r") * 10_000_000).alias("l_orderkey"),
        "l_partkey",
        "l_quantity",
    )
    t0 = time.perf_counter()
    zorder_layout(
        big, ["l_orderkey", "l_partkey"], n_files=32 * mult
    ).write.format("noop").mode("overwrite").save()
    return {"seconds": round(time.perf_counter() - t0, 3)}


def run_probe(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    base_mult: int,
    factor: int = 10,
    lanes: tuple[str, ...] = ("minhash_cc", "close", "zorder"),
    zorder_base_mult: int = 1,
    zorder_divisor: int = 1,
) -> dict:
    """Each lane at its base multiplier and base*factor; returns
    {lane: {"1x": s, "<factor>x": s, "ratio": r, ...}} plus driver RSS
    high-water before/after (MB) — the lanes must not accumulate
    driver-side state with corpus size. The doc lanes scale sf0.1
    documents (5k x base_mult rows); zorder scales lineitem (600k x
    zorder_base_mult rows), its own axis because lineitem is already
    120x the doc count."""
    import resource
    import shutil

    out: dict = {
        "base_mult": base_mult,
        "factor": factor,
        "zorder_base_mult": zorder_base_mult,
        "rss_mb_before": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
    }
    hi = f"{factor}x"
    mults = {"1x": base_mult, hi: base_mult * factor}
    doc_lanes = [
        l for l in lanes if l in ("minhash_cc", "close", "contamination", "bpe")
    ]
    corpora = {}
    if doc_lanes:
        for tag, m in mults.items():
            p = f"{work_dir}/corpus_{tag}"
            n = build_scaled_corpus(spark, sf_dir, m, p)
            corpora[tag] = (p, n)
    emb_corpora = {}
    if "semdedup" in lanes:
        for tag, m in mults.items():
            p = f"{work_dir}/emb_{tag}"
            n = build_scaled_embeddings(spark, sf_dir, m, p)
            emb_corpora[tag] = (p, n)
    for lane in lanes:
        res: dict = {}
        for tag in ("1x", hi):
            if lane == "minhash_cc":
                path, n = corpora[tag]
                r = lane_minhash_cc(spark, path)
                r["rows"] = n
            elif lane == "close":
                path, n = corpora[tag]
                state = f"{work_dir}/state_{tag}"
                shutil.rmtree(state, ignore_errors=True)
                setup_close_state(spark, path, state)
                r = lane_close(spark, state)
                r["rows"] = n
            elif lane == "zorder":
                zm = zorder_base_mult * (1 if tag == "1x" else factor)
                r = lane_zorder(spark, sf_dir, zm, divisor=zorder_divisor)
                r["rows"] = 600_000 * zm // zorder_divisor
            elif lane == "semdedup":
                path, n = emb_corpora[tag]
                # clusters scale with the corpus (the SemDeDup recipe),
                # keeping intra-cluster pair counts bounded
                r = lane_semdedup(spark, path, n_seeds=8 * mults[tag])
                r["rows"] = n
            elif lane == "contamination":
                path, n = corpora[tag]
                r = lane_contamination(spark, path)
                r["rows"] = n
            elif lane == "bpe":
                path, n = corpora[tag]
                r = lane_bpe(spark, path)
                r["rows"] = n
            else:
                raise ValueError(lane)
            res[tag] = r
        res["ratio"] = round(
            res[hi]["seconds"] / max(res["1x"]["seconds"], 1e-9), 2
        )
        out[lane] = res
    out["rss_mb_after"] = (
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    )
    return out


def build_scaled_embeddings(
    spark: SparkSession, sf_dir: str, mult: int, out: str
) -> int:
    """embeddings x mult with per-replica SIGN namespaces: every
    replica multiplies each dimension by a deterministic ±1 pattern
    keyed on (replica, dim). Within a replica all cosines are EXACTLY
    preserved (the signs square away), across replicas they scramble
    toward zero — so the base corpus's near-dup structure repeats once
    per replica and never merges across replicas, the same honesty
    argument as the token namespaces (module docstring). Ids are
    r*100_000 + vec_id, keeping ids 0..n_seeds-1 present (replica 0)
    for the deterministic IVF seeding."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    reps = spark.range(mult).select(F.col("id").alias("r")).repartition(
        min(int(mult), spark.sparkContext.defaultParallelism)
    )
    scaled = reps.crossJoin(F.broadcast(emb)).select(
        (F.col("r") * 100_000 + F.col("vec_id")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(
                F.xxhash64(F.col("r"), i) % 2 == 0, x
            ).otherwise(-x),
        ).alias("embedding"),
    )
    scaled.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def lane_semdedup(
    spark: SparkSession, emb_path: str, n_seeds: int
) -> dict:
    """SemDeDup's blocked intra-cluster triangle join (the pair_blocks²
    task risk, functions/similarity.py). The 100 TB contract is that
    n_clusters scales WITH the corpus (cluster sizes stay bounded — the
    SemDeDup recipe itself: clusters ~ n/k), so the probe scales
    n_seeds by the multiplier and the triangle cost must then be
    ~linear in total rows."""
    from .functions.similarity import semantic_dedup

    emb = spark.read.parquet(emb_path)
    t0 = time.perf_counter()
    out = semantic_dedup(emb, threshold=0.3, n_seeds=n_seeds)
    dropped = out.where(~F.col("keep")).count()
    return {
        "seconds": round(time.perf_counter() - t0, 3),
        "dropped": int(dropped),
    }


def lane_contamination(spark: SparkSession, corpus_path: str) -> dict:
    """The inverted-index shingle equi-join (functions/dedup.py):
    fanout is sum over shingles of df_corpus x df_eval — token
    namespaces keep per-replica dfs constant, so the sum must grow
    linearly with replicas. Both sides scale (the eval set is a fixed
    slice of the corpus), the worst case for the join."""
    from .functions.dedup import contamination_pairs

    docs = spark.read.parquet(corpus_path)
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    t0 = time.perf_counter()
    n = contamination_pairs(
        docs, eval_docs, n=5, min_containment=0.3, max_df=20
    ).count()
    return {"seconds": round(time.perf_counter() - t0, 3), "pairs": int(n)}


def lane_bpe(spark: SparkSession, corpus_path: str) -> dict:
    """BPE training's per-round pair aggregation (functions/bpe.py):
    each merge round re-aggregates the word relation — namespaced
    tokens multiply the distinct-word relation linearly, so each
    round's agg input (and thus total wall) must stay ~linear."""
    from .functions.bpe import train_bpe

    docs = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    model = train_bpe(docs, n_merges=10)
    return {
        "seconds": round(time.perf_counter() - t0, 3),
        "merges": len(model["merges"]),
    }
