"""Streaming text -> embedding -> ANN index loop (VERDICT r06 #6).

The batch plane has the full chain (`embed` CLI -> `index` /
`index-append`); this module closes the STREAMING loop: newly ingested
documents flow text -> `hashed_tf_embedding` -> `append_to_ann_index`
incrementally, one index version per micro-batch — the Spark-native
shape of the reference's per-message upsert into a live store
(GlueUtil.java:397-451: each arriving message batch-writes its entities
immediately, it never waits for a nightly rebuild).

Why foreachBatch and not a continuous transform: the embedding's
explode -> groupBy(id, bucket) -> groupBy(id) shape is not
watermark-safe as a streaming aggregation (the doc id is not event
time, so state would grow per document forever). Inside foreachBatch
the micro-batch is a plain bounded DataFrame: the batch operator runs
unchanged, state is zero, and the index maintenance is the only side
effect. Replay safety is delete-before-append: a batch whose append
landed but whose offset commit did not (crash in between) re-runs on
restart, and the delete of its own ids turns the second append into an
in-place replace instead of a duplicate — effectively-once per doc id
over the at-least-once bus.

Scale: per micro-batch cost is the batch embedding (two bounded
shuffles) plus a partition-scoped parquet append into the cluster
directories the batch's vectors land in; driver state stays
config-sized (the stored centroids/codebook literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_SCHEMA = "doc_id long, text string"


def start_embed_stream(
    spark: SparkSession,
    docs_path: str | None = None,
    index_root: str = "",
    checkpoint_path: str = "",
    dim: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
    recover_on_start: bool = True,
):
    """Start the incremental embed-and-index stream over a documents
    directory (ndjson files of {doc_id, text}; drop a file, it becomes
    a micro-batch — the same sandbox bus shape as the event stream) or
    any adapter passed as `source` (anything with
    `load(spark) -> streaming DataFrame[doc_id, text]`).

    The ANN index at `index_root` MUST already exist (built offline via
    build_ann_index / the `index` CLI job): streaming appends assign
    against the STORED centroids/codebook, and the embedding dimension
    is read from the index meta unless `dim` overrides it (a mismatch
    raises on the first batch rather than silently degrading recall).
    Each non-empty micro-batch bumps the index version on its append
    (plus once more for the self-heal delete when a replayed batch's
    ids were already present). Returns the StreamingQuery; callers
    awaitTermination().

    Concurrency with maintenance (r10, the index commit protocol): a
    crashed `index-compact` leaves a pending swap that every mutation
    refuses — `recover_on_start` (default) runs the idempotent
    recovery once at stream start so an operator's dead cron job
    cannot park the ingest loop; a compact racing a LIVE stream
    resolves the other way (the batch's append commits, the compact's
    version re-check aborts it for a clean re-run)."""
    import os

    from ..functions.ann_index import (
        append_to_ann_index,
        delete_from_ann_index,
        load_ann_meta,
        recover_ann_index,
    )
    from ..functions.similarity import hashed_tf_embedding

    if not os.path.exists(f"{index_root}/meta.json"):
        raise ValueError(
            f"no ANN index at {index_root}; build it first (the stream "
            f"appends against the stored centroids/codebook)"
        )
    if recover_on_start:
        recover_ann_index(index_root)
    meta = load_ann_meta(index_root)
    if dim is None:
        dim = int(meta["dim"])

    if source is not None:
        stream = source.load(spark)
    else:
        if docs_path is None:
            raise ValueError("pass either docs_path or a source adapter")
        reader = spark.readStream.schema(DOC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.json(docs_path)

    def embed_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        emb = hashed_tf_embedding(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            dim=dim,
            normalize=normalize,
        ).select(
            # the index names its own id column; align to it
            F.col(id_col).alias(meta["id_col"]),
            "embedding",
        )
        # effectively-once over an at-least-once bus: a micro-batch
        # replayed after a crash-between-append-and-commit would
        # double-append (verify_ann_index would flag dup_ids). Deleting
        # the batch's ids first makes the append idempotent PER ID —
        # a no-op on first delivery (ids absent), a self-heal on replay
        # — the same delete-then-insert discipline as the partition
        # full-refresh commit (GDCUtil.java:61-111).
        delete_from_ann_index(
            spark,
            index_root,
            batch_df.select(F.col(id_col).cast("long").alias(meta["id_col"])),
        )
        append_to_ann_index(spark, emb, index_root)

    writer = stream.writeStream.foreachBatch(embed_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
