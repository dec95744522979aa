"""Structured Streaming event plane: the SNS/SQS flow as a stream job.

Reference semantics being reproduced (SURVEY.md §2A #8-10, #21, #32-33):
- SNS/SQS consumption with at-least-once redelivery — a failed Lambda
  throws and the message comes back (SQSUtil.java:17-134,
  ExportLargeTable.java:136-141, ImportLargeTable.java:78-81);
- per-message dispatch on `message_type` (ImportDatabaseOrTable.java:117-145);
- idempotent apply so redelivery converges (the reference relies on
  create-if-absent + update-in-place; we rely on the join+overwrite MERGE).

Spark-native shape: `readStream` over the events directory (file source —
each dropped file is a batch of messages), `foreachBatch` running the SAME
`import_events` plan the batch job runs, writing a new catalog-state
version per micro-batch. Checkpointing makes batch replay at-least-once;
the idempotent MERGE makes it effectively-once. Audit/DLQ appends are
keyed by micro-batch id and written with per-batch overwrite, so a
replayed batch rewrites its own audit partition instead of duplicating it.

State layout under `state_root` (local FS in tests; object store in prod —
version discovery would move to a manifest file there, the write protocol
is already last-version-wins):

    state_root/v=<N>/{databases,tables,partitions}/   parquet snapshots
    state_root/audit/db_import/batch_id=<B>/          parquet, per-batch
    state_root/audit/table_import/batch_id=<B>/
    state_root/dlq/batch_id=<B>/
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..model import DATABASE, MESSAGE, PARTITION, TABLE
from ..plans.importer import import_events

_V_RE = re.compile(r"^v=(\d+)$")


def latest_version(state_root: str) -> int | None:
    """Highest committed state version, or None when uninitialized."""
    if not os.path.isdir(state_root):
        return None
    versions = [
        int(m.group(1))
        for d in os.listdir(state_root)
        if (m := _V_RE.match(d)) and os.path.exists(os.path.join(state_root, d, "_DONE"))
    ]
    return max(versions, default=None)


def read_state(
    spark: SparkSession, state_root: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(databases, tables, partitions) at the latest version; empty
    snapshots when no version exists yet."""
    v = latest_version(state_root)
    if v is None:
        return (
            spark.createDataFrame([], DATABASE),
            spark.createDataFrame([], TABLE),
            spark.createDataFrame([], PARTITION),
        )
    base = f"{state_root}/v={v}"
    return (
        spark.read.parquet(f"{base}/databases"),
        spark.read.parquet(f"{base}/tables"),
        spark.read.parquet(f"{base}/partitions"),
    )


def write_state(
    dbs: DataFrame, tables: DataFrame, parts: DataFrame, state_root: str
) -> int:
    """Commit a new state version (write all three planes, then the
    _DONE marker — readers only see fully-written versions)."""
    v = (latest_version(state_root) or 0) + 1
    base = f"{state_root}/v={v}"
    dbs.write.mode("overwrite").parquet(f"{base}/databases")
    tables.write.mode("overwrite").parquet(f"{base}/tables")
    parts.write.mode("overwrite").parquet(f"{base}/partitions")
    with open(f"{base}/_DONE", "w") as fh:
        fh.write("")
    return v


def _append_batch(df: DataFrame, root: str, batch_id: int) -> None:
    """Idempotent per-batch append: a replayed micro-batch overwrites its
    own batch_id directory instead of duplicating rows (the streaming
    analogue of the reference's (id, run_id) audit keys)."""
    df.write.mode("overwrite").parquet(f"{root}/batch_id={batch_id}")


def start_event_stream(
    spark: SparkSession,
    events_path: str,
    state_root: str,
    checkpoint_path: str,
    target_catalog_id: str = "999999999999",
    side_channel_path: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the streaming import: events_path is a directory of ndjson
    message files (the SNS topic equivalent — drop a file, it becomes a
    micro-batch). Returns the StreamingQuery; callers awaitTermination().

    available_now=True drains everything currently present then stops —
    the test/batch-catchup mode; False runs continuously.
    """
    reader = spark.readStream.schema(MESSAGE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(events_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        tgt_dbs, tgt_tables, tgt_parts = read_state(spark, state_root)
        result = import_events(
            spark,
            batch_df,
            tgt_dbs,
            tgt_tables,
            tgt_parts,
            target_catalog_id=target_catalog_id,
            side_channel_path=side_channel_path,
            run_id=batch_id,
        )
        write_state(result.databases, result.tables, result.partitions, state_root)
        _append_batch(result.db_import_audit, f"{state_root}/audit/db_import", batch_id)
        _append_batch(
            result.table_import_audit, f"{state_root}/audit/table_import", batch_id
        )
        _append_batch(result.dlq, f"{state_root}/dlq", batch_id)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_audit(spark: SparkSession, state_root: str, which: str) -> DataFrame:
    """Read a persisted audit table ('db_import' | 'table_import') or the
    'dlq' across all batches."""
    root = f"{state_root}/dlq" if which == "dlq" else f"{state_root}/audit/{which}"
    return spark.read.option("basePath", root).parquet(root)
