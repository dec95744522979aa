"""Streaming incremental near-duplicate detection (MinHash/LSH).

The batch plane has the full fuzzy-dedup chain (`near-dedup` CLI:
LSH candidates -> exact verify -> connected components); this module is
its STREAMING shape: each micro-batch of documents is checked against a
persisted signature store of every prior KEEPER, so a near-duplicate of
anything already ingested is flagged the moment it arrives — the
incremental corpus-construction loop (ingest -> dedup -> keep) instead
of a nightly full-corpus job.

Semantics (greedy keep-first, the standard incremental variant):
- a batch doc whose estimated Jaccard against ANY stored keeper clears
  `threshold` is a duplicate of that keeper (best match wins: highest
  estimate, ties to the smallest keeper id);
- surviving docs are near-deduped WITHIN the batch the same way
  (smallest id in a matching pair keeps);
- only keepers' band signatures enter the store, so later arrivals
  compare against keepers, never against dropped duplicates.
Unlike the batch pipeline this does NOT compute transitive closure
across batches — a chain A~B~C where A never bucket-matches C directly
keeps both A's and C's verdicts greedy. That is the documented price of
O(batch) incremental work; run the batch `near-dedup` job for a
full-closure re-sweep.

Similarity is the MinHash estimator itself (fraction of equal signature
components, `est` has granularity 1/num_hashes) over the SAME portable
hash family as the batch lanes (functions/dedup.py), so stream and
batch agree on signatures bit-for-bit.

State & replay: the store is parquet under
`{state_root}/signatures/batch_id=N` (keepers' exploded band keys +
signature) and decisions under `{state_root}/decisions/batch_id=N`, one
row per input doc (doc_id, keep, dup_of, est, batch_id). A replayed
micro-batch OVERWRITES its own batch_id directories (the
`_append_batch` discipline, streaming/ingest.py) — effectively-once
without coordination.

Scale: per batch the work is one narrow signature projection over the
batch, one equi-join of the batch's band keys against the store
(shuffle bounded by band-bucket sizes — never doc x store), and one
within-batch band self-join. The store scan is the incremental cost;
it is append-only, partitioned by batch for retention/compaction, and
carries only keepers (bands x num_hashes ints per doc). At 100 TB the
same plan holds because every join is banded; the store read stays
columnar and the band-key shuffle is the only wide edge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_SCHEMA = "doc_id long, text string"


def _banded_signatures(
    docs: DataFrame,
    n: int,
    num_hashes: int,
    bands: int,
    normalize: bool,
) -> DataFrame:
    """(doc_id, band, band_key, sig): one exploded band-bucket row per
    (doc, band), carrying the full signature array for the estimator.
    Docs with fewer than n tokens have no shingles and are excluded —
    they cannot near-dup anything (same exclusion as the batch lanes)."""
    from ..functions.dedup import minhash_signature_arrays

    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    sigs = minhash_signature_arrays(
        docs,
        n=n,
        num_hashes=num_hashes,
        ensure_parallelism=False,  # streaming batch: no df.rdd probe
        normalize=normalize,
    )
    keys = F.array(
        *[
            F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
    )
    sig = F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)])
    return sigs.select(
        "doc_id",
        F.posexplode(keys).alias("band", "band_key"),
        sig.alias("sig"),
    )


def _est_col(a: str, b: str, num_hashes: int) -> F.Column:
    """The MinHash Jaccard estimator: fraction of equal components."""
    return (
        F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes)
    ).alias("est")


def _best_match(cands: DataFrame, num_hashes: int, threshold: float) -> DataFrame:
    """One row per duplicate doc: its best matching keeper (max est,
    ties to the smallest keeper id)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("est").desc(), F.col("dup_of").asc()
    )
    return (
        cands.where(F.col("est") >= threshold)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def start_near_dedup_stream(
    spark: SparkSession,
    docs_path: str | None = None,
    state_root: str = "",
    checkpoint_path: str = "",
    n: int = 5,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
    normalize: bool = False,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
):
    """Start the incremental near-dedup stream over a documents
    directory (ndjson {doc_id, text} files; one file = one micro-batch
    under max_files_per_trigger=1) or any adapter with
    `load(spark) -> streaming DataFrame[doc_id, text]`. Returns the
    StreamingQuery; read verdicts with `read_dedup_decisions` and the
    keeper signature store grows under `{state_root}/signatures`."""
    if source is not None:
        stream = source.load(spark)
    else:
        if docs_path is None:
            raise ValueError("pass either docs_path or a source adapter")
        reader = spark.readStream.schema(DOC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.json(docs_path)

    sig_root = f"{state_root}/signatures"
    dec_root = f"{state_root}/decisions"

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        banded = _banded_signatures(batch_df, n, num_hashes, bands, normalize)
        banded = banded.localCheckpoint(eager=True)  # 3 consumers below
        try:
            # --- 1. duplicates of PRIOR keepers (earlier batches only:
            # a replayed batch must not match its own previous write)
            store = None
            if os.path.exists(sig_root):
                store = (
                    spark.read.option("basePath", sig_root)
                    .parquet(sig_root)
                    .where(F.col("batch_id") < batch_id)
                )
            if store is not None:
                prior = (
                    banded.alias("new")
                    .join(
                        store.alias("old"),
                        on=["band", "band_key"],
                    )
                    .select(
                        F.col("new.doc_id").alias("doc_id"),
                        F.col("old.doc_id").alias("dup_of"),
                        _est_col("new.sig", "old.sig", num_hashes),
                    )
                )
                dup_prior = _best_match(
                    prior.dropDuplicates(["doc_id", "dup_of"]), num_hashes, threshold
                )
            else:
                dup_prior = None

            # --- 2. within-batch duplicates among the survivors
            survivors = banded
            if dup_prior is not None:
                survivors = banded.join(
                    dup_prior.select("doc_id"), on="doc_id", how="left_anti"
                )
            a, b = survivors.alias("a"), survivors.alias("b")
            intra = (
                a.join(b, on=["band", "band_key"])
                .where(F.col("a.doc_id") > F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("dup_of"),
                    _est_col("a.sig", "b.sig", num_hashes),
                )
                .dropDuplicates(["doc_id", "dup_of"])
            )
            dup_intra = _best_match(intra, num_hashes, threshold)

            dups = (
                dup_prior.unionByName(dup_intra) if dup_prior is not None else dup_intra
            )
            # a doc can appear in both lanes; keep its best verdict
            dups = _best_match(dups, num_hashes, 0.0)

            # --- 3. verdicts: one row per input doc (docs too short to
            # shingle keep trivially — nothing to compare)
            decisions = (
                batch_df.select("doc_id")
                .dropDuplicates()
                .join(dups, on="doc_id", how="left")
                .select(
                    "doc_id",
                    F.col("dup_of").isNull().alias("keep"),
                    "dup_of",
                    "est",
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            decisions.write.mode("overwrite").parquet(
                f"{dec_root}/batch_id={batch_id}"
            )

            # --- 4. only keepers' signatures enter the store
            keepers = banded.join(
                dups.select("doc_id"), on="doc_id", how="left_anti"
            )
            keepers.write.mode("overwrite").parquet(
                f"{sig_root}/batch_id={batch_id}"
            )
        finally:
            banded.unpersist()

    writer = stream.writeStream.foreachBatch(dedup_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dedup_decisions(spark: SparkSession, state_root: str) -> DataFrame:
    """All per-doc verdicts across batches: (doc_id, keep, dup_of, est,
    batch_id)."""
    root = f"{state_root}/decisions"
    return spark.read.option("basePath", root).parquet(root)
