"""Streaming incremental SEMANTIC dedup through the persistent ANN index.

The third streaming loop, composing the other two: `streaming/embed.py`
turns ingested text into indexed vectors, `functions/similarity.py
semantic_dedup` defines the batch semantics, and this module runs the
recipe incrementally — each micro-batch of documents embeds, probes the
persistent index (which holds ONLY prior keepers), and a doc whose
exact cosine against any stored keeper clears `threshold` is flagged a
semantic duplicate on arrival; survivors' vectors append to the index
so later arrivals dedup against them. The lexical twin is
`streaming/neardedup.py` (MinHash store); this one catches paraphrases
the shingle lanes can't.

Semantics (greedy keep-first, consistent with the other incremental
lanes):
- cross-batch: candidates come from the ANN probe (`k` neighbors over
  `nprobe` clusters) and are verified by EXACT cosine against the
  index's stored float embeddings — ANN bounds the candidate set, the
  verify is never approximate. Recall < 1 by construction (a dup whose
  keeper lives outside the probed clusters is missed) — the nprobe/k
  knobs trade it; the batch `sem-dedup` job is the full re-sweep.
- within-batch: exact all-pairs via `semantic_dedup` with every doc in
  one cluster (micro-batches are bounded; the blocked triangle join
  keeps even a fat batch parallel) — no recall loss inside the batch.
- a doc's verdict is its best match overall (highest cosine, ties to
  the smallest keeper id).

State & replay: verdicts land under `{state_root}/decisions/batch_id=N`
(overwritten on replay, the `_append_batch` discipline); the index is
self-healing via delete-before-anything — a replayed batch first
deletes its own doc ids from the index (no-op on first delivery), so it
never matches ITSELF from its earlier, uncommitted append, and the
keeper re-append is an in-place replace (streaming/embed.py's
effectively-once discipline).

Scale: per batch — one bounded embed (two shuffles), one ANN search
(directory-pruned scan of nprobe clusters per query), one equi-join
back to the probed clusters' stored vectors for the exact verify, one
blocked within-batch self-join. The index IS the state store: cluster
directories keep the probe scan O(corpus/n_clusters), and
`compact_ann_index` is the maintenance path when drift skews them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

DOC_SCHEMA = "doc_id long, text string"


def _best(cands: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cosine").desc(), F.col("dup_of").asc()
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def start_semantic_dedup_stream(
    spark: SparkSession,
    docs_path: str | None = None,
    index_root: str = "",
    state_root: str = "",
    checkpoint_path: str = "",
    threshold: float = 0.9,
    k: int = 3,
    nprobe: int = 2,
    pair_blocks: int = 8,
    dim: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
    max_queries: int = 10_000,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
    close_every: int | None = None,
):
    """Start the incremental semantic-dedup stream. The ANN index at
    `index_root` MUST already exist (seed it from the initial corpus
    via `build_ann_index` / the `index` CLI job) — it doubles as the
    keeper store. Returns the StreamingQuery; read verdicts with
    `read_semantic_decisions`.

    close_every=N runs the transitive-closure pass
    (streaming/close.close_semantic_dedup_state) inline after every
    Nth micro-batch — foreachBatch is serial, so the stream is
    effectively stopped while it runs (the close pass's contract).
    Crash-replay window: same eventual-convergence behavior as the
    near lane (see start_near_dedup_stream) — the inline close runs
    before the offsets commit, a replayed batch regresses only its own
    directories to greedy verdicts, and the next pass (whose watermark
    is inclusive of its own batch) re-folds them."""
    from ..functions.ann_index import (
        append_to_ann_index,
        delete_from_ann_index,
        load_ann_meta,
        search_ann_index,
    )
    from ..functions.similarity import (
        _fold_dot,
        _fold_norm2,
        hashed_tf_embedding,
        semantic_dedup,
    )

    if not os.path.exists(f"{index_root}/meta.json"):
        raise ValueError(
            f"no ANN index at {index_root}; build it first — it is the "
            f"keeper store this stream dedups against"
        )
    meta = load_ann_meta(index_root)
    if dim is None:
        dim = int(meta["dim"])
    vec_id = meta["id_col"]

    if source is not None:
        stream = source.load(spark)
    else:
        if docs_path is None:
            raise ValueError("pass either docs_path or a source adapter")
        reader = spark.readStream.schema(DOC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.json(docs_path)

    dec_root = f"{state_root}/decisions"

    def unit(col):
        # zero-norm guard: empty docs embed to the zero vector; unit-
        # normalize it to itself (cosine 0, never a duplicate) instead
        # of raising DIVIDE_BY_ZERO under ANSI mode
        v = col.cast("array<double>")
        raw = F.sqrt(_fold_norm2(v))
        nrm = F.when(raw == 0, F.lit(1.0)).otherwise(raw)
        return F.transform(v, lambda x: x / nrm)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # replay self-heal FIRST: a batch re-delivered after a crash
        # between append and offset-commit must not find its own
        # earlier vectors as "prior keepers" (cosine 1.0 self-dups)
        delete_from_ann_index(
            spark,
            index_root,
            batch_df.select(F.col(id_col).cast("long").alias(vec_id)),
        )
        emb = hashed_tf_embedding(
            batch_df, id_col=id_col, text_col=text_col, dim=dim,
            normalize=normalize,
        ).localCheckpoint(eager=True)  # consumed by search/verify/intra/append
        try:
            # --- 1. candidates among PRIOR keepers via the ANN probe,
            # verified by EXACT cosine against the stored embeddings
            cand = search_ann_index(
                spark,
                index_root,
                emb.select(F.col(id_col).alias("query_id"), "embedding"),
                k=k,
                nprobe=nprobe,
                max_queries=max_queries,
            )
            stored = (
                spark.read.option("basePath", f"{index_root}/vectors")
                .parquet(f"{index_root}/vectors")
                .select(F.col(vec_id).alias("dup_of"), F.col("embedding").alias("__sv"))
            )
            prior = (
                cand.select(F.col("query_id").alias("doc_id"), F.col("vec_id").alias("dup_of"))
                .join(stored, on="dup_of")
                .join(
                    emb.select(F.col(id_col).alias("doc_id"), F.col("embedding").alias("__qv")),
                    on="doc_id",
                )
                .select(
                    "doc_id",
                    "dup_of",
                    _fold_dot(unit(F.col("__qv")), unit(F.col("__sv"))).alias("cosine"),
                )
                .where((F.col("cosine") >= threshold) & (F.col("doc_id") != F.col("dup_of")))
            )
            dup_prior = _best(prior)

            # --- 2. exact within-batch pass among the survivors (one
            # cluster = all pairs; the blocked join keeps it parallel)
            survivors = emb.join(
                dup_prior.select(F.col("doc_id").alias(id_col)),
                on=id_col,
                how="left_anti",
            )
            intra = semantic_dedup(
                survivors,
                threshold=threshold,
                id_col=id_col,
                assignments=survivors.select(id_col, F.lit(0).alias("cluster")),
                pair_blocks=pair_blocks,
            ).where(~F.col("keep")).select(
                F.col(id_col).alias("doc_id"), "dup_of", "cosine"
            )
            dups = _best(dup_prior.unionByName(intra))

            # --- 3. verdicts: one row per input doc
            decisions = (
                batch_df.select(F.col(id_col).alias("doc_id"))
                .dropDuplicates()
                .join(dups, on="doc_id", how="left")
                .select(
                    "doc_id",
                    F.col("dup_of").isNull().alias("keep"),
                    "dup_of",
                    "cosine",
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            decisions.write.mode("overwrite").parquet(
                f"{dec_root}/batch_id={batch_id}"
            )

            # --- 4. only keepers enter the index
            keepers = emb.join(
                dups.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
            ).select(F.col(id_col).alias(vec_id), "embedding")
            append_to_ann_index(spark, keepers, index_root)
            # --- 5. dropped docs' embeddings land in the COLD log for
            # the closure pass (streaming/close): transitive chains
            # through dropped docs are only discoverable if their
            # vectors survive. Overwrite-on-replay, same as decisions.
            emb.join(
                dups.select(F.col("doc_id").alias(id_col)), on=id_col,
                how="left_semi",
            ).select(F.col(id_col).alias(vec_id), "embedding").write.mode(
                "overwrite"
            ).parquet(f"{state_root}/dup_vectors/batch_id={batch_id}")
        finally:
            emb.unpersist()
        if close_every and (batch_id + 1) % close_every == 0:
            from .close import close_semantic_dedup_state

            close_semantic_dedup_state(
                spark, state_root, index_root,
                threshold=threshold, pair_blocks=pair_blocks,
            )

    writer = stream.writeStream.foreachBatch(dedup_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_semantic_decisions(spark: SparkSession, state_root: str) -> DataFrame:
    """All per-doc verdicts across batches: (doc_id, keep, dup_of,
    cosine, batch_id)."""
    root = f"{state_root}/decisions"
    return spark.read.option("basePath", root).parquet(root)
