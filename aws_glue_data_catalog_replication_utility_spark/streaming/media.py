"""Streaming multimodal feature extraction.

The fourth streaming loop: binary media blobs (image/audio/video
columns of a multimodal corpus) arrive as micro-batches and run the
SAME Arrow `mapInPandas` decoders as the batch plane
(`functions/multimodal.py` — decode_image / decode_audio /
sample_frames / blob_features), writing one typed feature partition per
micro-batch. Nothing is re-implemented: inside foreachBatch the
micro-batch is a bounded DataFrame, so the batch operators run
unchanged with zero streaming state — the same foreachBatch argument as
the embed loop (`streaming/embed.py`).

Two operational properties the batch decoders already guarantee carry
over, and matter MORE on a stream:
- garbage survives: an undecodable or NULL blob becomes an `error` row
  instead of a thrown task — one poison message never kills the
  long-running query (the DLQ philosophy of the event plane, applied
  to media);
- replay is idempotent: each batch OVERWRITES its own
  `batch_id=N` directory (the `_append_batch` discipline), so
  at-least-once re-delivery converges without coordination.

Scale: the decode is map-only (no shuffle at all — `.explain` shows a
single mapInPandas over the scan), so throughput scales linearly with
executors; Arrow batch size bounds per-task memory against fat blobs
via `spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BLOB_SCHEMA = "doc_id long, blob binary"

_KINDS = ("image", "audio", "frames", "stats")


def start_media_stream(
    spark: SparkSession,
    blobs_path: str | None = None,
    out_root: str = "",
    checkpoint_path: str = "",
    kind: str = "image",
    every: int = 2,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
):
    """Start the media feature-extraction stream over a parquet
    directory of (doc_id, blob) rows (or any adapter with
    `load(spark) -> streaming DataFrame`). `kind` picks the decoder:
    image -> decode_image, audio -> decode_audio, frames ->
    sample_frames(every), stats -> blob_features. Features land under
    `{out_root}/features/batch_id=N`; read them back with
    `read_media_features`."""
    from ..functions.multimodal import (
        blob_features,
        decode_audio,
        decode_image,
        sample_frames,
    )

    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    extract = {
        "image": lambda df: decode_image(df, id_col=id_col, blob_col=blob_col),
        "audio": lambda df: decode_audio(df, id_col=id_col, blob_col=blob_col),
        "frames": lambda df: sample_frames(
            df, every=every, id_col=id_col, blob_col=blob_col
        ),
        "stats": lambda df: blob_features(df, id_col=id_col, blob_col=blob_col),
    }[kind]

    if source is not None:
        stream = source.load(spark)
    else:
        if blobs_path is None:
            raise ValueError("pass either blobs_path or a source adapter")
        reader = spark.readStream.schema(BLOB_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.parquet(blobs_path)

    feat_root = f"{out_root}/features"

    def media_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extract(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(f"{feat_root}/batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(media_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_media_features(spark: SparkSession, out_root: str) -> DataFrame:
    """All extracted features across batches (schema depends on the
    stream's `kind`, plus batch_id)."""
    root = f"{out_root}/features"
    return spark.read.option("basePath", root).parquet(root)
