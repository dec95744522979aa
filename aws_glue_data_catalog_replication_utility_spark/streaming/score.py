"""Streaming quality-classifier scoring: the learned filter applied
on arrival.

The SIXTH streaming loop: newly ingested documents are scored by the
trained linear model (`functions/classifier.score_quality`) inside
foreachBatch — keepers flow to `keep/batch_id=N`, rejects to
`reject/batch_id=N` with their scores, so a corpus builder pointed at
the keep/ tree only ever reads the filtered stream. foreachBatch (not
a continuous transform) for the same reason as the embed loop: the
embedding's explode->groupBy TF aggregation is not watermark-safe as
a streaming transform, but a micro-batch is a bounded DataFrame where
it runs unchanged (streaming/embed.py:11).

Operational contract (identical to the other loops): scoring never
throws on content (NULL/empty text embeds to the zero vector — the
bias decides), replay is idempotent (each batch OVERWRITES its own
batch_id directory), and the weights are plan literals — no model
object crosses the driver/executor boundary.

Reference anchor: the event plane's per-message dispatch predicate
(TableWithPartitions routing) with a learned predicate over content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.classifier import score_quality


def start_score_stream(
    spark: SparkSession,
    model: dict,
    in_path: str | None = None,
    schema: str = "doc_id long, text string",
    out_root: str = "",
    checkpoint_path: str = "",
    keep_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
):
    """Score a document stream with a trained quality model; route
    keep/reject per micro-batch. Output rows carry the input columns
    plus (quality_logit, quality_prob)."""
    if not model.get("weights"):
        raise ValueError("model has no weights — train it first")
    if source is not None:
        stream = source.load(spark)
    else:
        if in_path is None:
            raise ValueError("pass in_path or a source adapter")
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        stream = reader.parquet(in_path)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = batch_df.join(
            score_quality(
                batch_df, model, id_col=id_col, text_col=text_col,
                keep_threshold=keep_threshold,
            ),
            on=id_col,
        )
        scored.where("quality_keep").drop("quality_keep").write.mode(
            "overwrite"
        ).parquet(f"{out_root}/keep/batch_id={batch_id}")
        scored.where("NOT quality_keep").drop("quality_keep").write.mode(
            "overwrite"
        ).parquet(f"{out_root}/reject/batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
