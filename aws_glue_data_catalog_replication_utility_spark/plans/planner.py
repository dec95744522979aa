"""Replication planner job — entry point 1 (SURVEY.md §3.1).

Reference: GDCReplicationPlanner.java:39-137 — scan all databases,
keep those matching configured name prefixes, publish one JSON message
per database, audit each publish.

Spark plan: one scan + one (broadcast) prefix filter + one projection
into the message envelope + one audit projection. No shuffles at all
when prefixes are literals (the filter folds into the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.joins import prefix_semi_join


def tokenize_prefixes(prefix_string: str, separator: str = ",") -> list[str]:
    """Config string -> prefix list (GDCReplicationPlanner.java:109-116).
    Empty config means replicate everything (:70-81)."""
    if not prefix_string:
        return []
    return [p.strip() for p in prefix_string.split(separator) if p.strip()]


def plan_replication(
    databases: DataFrame,
    prefix_string: str = "",
    separator: str = ",",
    run_id: int = 0,
    batch_id: str = "0",
) -> tuple[DataFrame, DataFrame]:
    """Returns (db_messages, db_export_audit).

    db_messages: the event rows fanned out to the export stage — payload
    is the full database JSON (SNSUtil.java:101-109), message_type =
    'database'.
    """
    required = prefix_semi_join(
        databases, tokenize_prefixes(prefix_string, separator), col="name"
    )

    # failure lane: a database with no name cannot form a message — the
    # reference records failed publishes in the audit with
    # is_exported=false (SNSUtil.java:115-123 catch + DDBUtil insert)
    # rather than dropping them silently
    publishable = F.col("name").isNotNull() & (F.col("name") != "")

    payload = F.to_json(
        F.struct(
            "name", "description", "location_uri", "parameters", "create_time"
        )
    )
    messages = required.where(publishable).select(
        F.concat_ws("|", "catalog_id", "name").alias("event_id"),
        F.lit("database").alias("message_type"),
        F.col("catalog_id").alias("source_catalog_id"),
        F.lit(batch_id).alias("export_batch_id"),
        payload.alias("payload"),
        F.lit(None).cast("string").alias("bucket_name"),
        F.lit(None).cast("string").alias("region_name"),
    )

    audit = required.select(
        F.coalesce("name", F.lit("<unnamed>")).alias("db_id"),
        F.lit(run_id).cast("long").alias("export_run_id"),
        F.lit(batch_id).alias("export_batch_id"),
        F.col("catalog_id").alias("source_glue_catalog_id"),
        payload.alias("database_schema"),
        F.when(
            publishable,
            F.concat_ws("-", F.lit("msg"), "catalog_id", "name"),
        ).alias("sns_msg_id"),
        publishable.alias("is_exported"),
        F.when(~publishable, F.lit("database has no name; publish failed")).alias(
            "error"
        ),
    )
    return messages, audit
