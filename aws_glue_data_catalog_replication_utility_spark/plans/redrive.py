"""DLQ re-drive job — the dead-letter consumer.

Reference: DLQImportDatabaseOrTable.java:29-166 — the DLQ Lambda parses
each dead-lettered message's SchemaType attribute and re-runs the SAME
import logic (processDatabseSchema / processTableSchema); a message that
fails again re-enters the DLQ (retry loop).

Spark-native: rebuild the event envelope from the DLQ rows and feed it
back through `import_events`. Because the import plan is idempotent,
re-driving a message that meanwhile succeeded is a no-op; re-driving one
whose blocker was fixed (e.g. the side channel became readable) converges
the target. Failures come back out on the returned result's `dlq` plane —
the retry loop as a dataflow fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .importer import ImportResult, import_events

# DLQ schema_type -> event message_type (SQSUtil.java:26-32 attribute
# values {Database, Table, largeTable}; unknown types pass through and
# re-dead-letter inside import_events' dispatch). 'Partition' rows (a
# partition that failed per-row validation) and 'corruptPartitionLine'
# rows re-park BY DESIGN: they are data errors a retry cannot fix — the
# fix is a corrected re-export, whose fresh full-refresh sync supersedes
# the parked row.
_TYPE_MAP = {"Database": "database", "Table": "table", "largeTable": "largeTable"}


def dlq_to_events(dlq: DataFrame) -> DataFrame:
    """Rebuild the event envelope from dead-lettered rows."""
    type_expr = F.col("schema_type")
    for k, v in _TYPE_MAP.items():
        type_expr = F.when(F.col("schema_type") == k, F.lit(v)).otherwise(type_expr)
    return dlq.select(
        "event_id",
        type_expr.alias("message_type"),
        F.col("source_glue_catalog_id").alias("source_catalog_id"),
        "export_batch_id",
        "payload",
        F.lit(None).cast("string").alias("bucket_name"),
        F.lit(None).cast("string").alias("region_name"),
    )


def redrive_dlq(
    spark: SparkSession,
    dlq: DataFrame,
    target_databases: DataFrame,
    target_tables: DataFrame,
    target_partitions: DataFrame,
    target_catalog_id: str = "999999999999",
    side_channel_path: str | None = None,
    run_id: int = 0,
) -> ImportResult:
    """Re-run the import over dead-lettered messages. The result's `dlq`
    holds the messages that failed AGAIN (the reference's re-enqueue,
    DLQImportDatabaseOrTable.java:157-165)."""
    return import_events(
        spark,
        dlq_to_events(dlq),
        target_databases,
        target_tables,
        target_partitions,
        target_catalog_id=target_catalog_id,
        side_channel_path=side_channel_path,
        run_id=run_id,
    )
