"""Export job — entry point 2 (SURVEY.md §3.2).

Reference: ExportDatabaseWithTables.java + ExportLargeTable.java —
per database: scan tables, per table: scan partitions, then route:
<= threshold partitions -> inline TableWithPartitions SNS payload;
> threshold -> LargeTable envelope + ndjson partitions to S3.

Spark plan (whole catalog in ONE job, no per-entity loop):
  tables ⋉ requested_dbs               (broadcast semi join)
  parts groupBy(table) count            (one shuffle, partial agg)
  route small/large (when/otherwise)
  small: parts collect_list per table   (same shuffle key, sorted arrays
         for determinism) -> inline JSON payload
  large: envelope + side-channel ndjson write partitioned by table
The reference's per-message Lambda fan-out becomes partition-parallel
execution of one plan.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark.sql import types as T

from ..functions._exprcache import check_context, register_cache
from ..model import STORAGE_DESCRIPTOR
from ..operators.routing import DEFAULT_PARTITION_THRESHOLD, threshold_route
from ..sources.ndjson import write_partitions_ndjson

# catalog_id is part of every join key: two catalogs exported in one
# batch may contain same-named db/table pairs and must not merge
_TBL_KEY = ["catalog_id", "database_name", "name"]

# the inline partition_list element type, derived from the model constant
# (one source of truth for the SD shape)
_INLINE_PARTITION_LIST_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("values", T.ArrayType(T.StringType())),
            T.StructField("storage_descriptor", STORAGE_DESCRIPTOR),
        ]
    )
)


@lru_cache(maxsize=1)
def _table_struct() -> F.Column:
    """The replicated table projection: TableInput fields
    (GlueUtil.java:175-192 — createdBy / createTime / updateTime are
    NOT replicated; table-level parameters win, :183-190). Memoized —
    plan-independent, consumed by several export towers per call
    (callers go through export_catalog, which runs check_context)."""
    return F.struct(
        "database_name",  # needed for addressing on the import side
        "name",
        "owner",
        "description",
        "last_access_time",
        "retention",
        "table_type",
        "view_original_text",
        "view_expanded_text",
        "parameters",
        "partition_keys",
        "storage_descriptor",
    )


@lru_cache(maxsize=1)
def _partition_struct() -> F.Column:
    """PartitionInput projection + addressing (GlueUtil.java:407-413)."""
    return F.struct("database_name", "table_name", "values", "storage_descriptor")


register_cache(_table_struct.cache_clear)
register_cache(_partition_struct.cache_clear)


def export_catalog(
    spark: SparkSession,
    db_messages: DataFrame,
    tables: DataFrame,
    partitions: DataFrame,
    threshold: int = DEFAULT_PARTITION_THRESHOLD,
    batch_id: str = "0",
    run_id: int = 0,
    side_channel_path: str | None = None,
    bucket_name: str = "side-channel",
    region_name: str = "local",
    run_date: str = "2024-01-01",
    truncate_lineage: bool = True,
    materialized_out: list[DataFrame] | None = None,
    side_channel_writer_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (table_messages, table_export_audit). Side-channel ndjson
    is written when any table routes large and a path is given.

    side_channel_writer_out: when given, the ndjson write is NOT run
    inline — a zero-arg callable is appended instead, letting the caller
    overlap the write (an independent Spark job) with its own plan
    building, e.g. on a thread joined via import_events'
    side_channel_ready barrier. The caller MUST run it before anything
    reads the side channel.

    db_messages: planner output — scopes which databases export
    (join on the db name inside event_id's payload is avoided; we use
    the audit-friendly source_catalog_id + name columns carried along).

    truncate_lineage=True materializes the routed table set (scoped
    tables + partition counts) with persist+count: it feeds four
    consumers (small lane, large lane, audit, the eager ndjson write),
    each of which would otherwise re-execute the scope join + count
    aggregation. The routed relation is METADATA-sized (one row per
    exported table — bounded by catalog size, never table data), so
    the materialization is cheap at any scale; pass False to keep the
    plan fully lazy.

    materialized_out: when given, the persisted routed frame is appended
    so the CALLER owns its lifetime (unpersist once the returned plans
    have executed). Without it the cache entry lives until session end —
    fine for a one-shot batch job, a leak in a long-lived loop (ADVICE
    r04)."""
    check_context()  # memoized struct Columns die with their SparkContext
    requested = db_messages.select(
        F.get_json_object("payload", "$.name").alias("database_name"),
        F.col("source_catalog_id").alias("catalog_id"),
    ).dropDuplicates(["database_name", "catalog_id"])

    scoped_tables = tables.join(
        F.broadcast(requested), on=["database_name", "catalog_id"], how="left_semi"
    )

    parts_keyed = partitions.withColumnRenamed("table_name", "name")
    routed = threshold_route(
        scoped_tables,
        parts_keyed,
        on=_TBL_KEY,
        threshold=threshold,
        count_col="n_partitions",
    )
    if truncate_lineage:
        # persist (not checkpoint): routed's lineage is two scans + one
        # count agg — shallow; materialization is what its four
        # consumers need. LAZY: the first consumer to execute (normally
        # the eager ndjson write below) fills the cache as part of its
        # own job — a dedicated count job beforehand was pure overhead
        routed = routed.persist()
        if materialized_out is not None:
            materialized_out.append(routed)

    # failure lane: a table with no name cannot form a message or a
    # side-channel key — it audits as is_exported=False with a reason
    # (SNSUtil.java:115-123 failed-publish audit analogue) instead of
    # silently vanishing
    publishable = F.col("name").isNotNull() & (F.col("name") != "")

    # ---- small path: inline partition arrays, deterministic order ------
    small_tables = routed.where((F.col("route") == "inline") & publishable)
    inline_parts = (
        partitions.join(
            small_tables.select(
                F.col("catalog_id"),
                F.col("database_name"),
                F.col("name").alias("table_name"),
            ),
            on=["catalog_id", "database_name", "table_name"],
            how="left_semi",
        )
        .groupBy("catalog_id", "database_name", "table_name")
        .agg(
            # deterministic inline order: sort by the partition values
            # only (the full struct isn't orderable — SDs contain maps)
            F.array_sort(
                F.collect_list(F.struct("values", "storage_descriptor")),
                lambda l, r: F.when(l["values"] < r["values"], F.lit(-1))
                .when(l["values"] > r["values"], F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("partition_list")
        )
        .withColumnRenamed("table_name", "name")
    )
    small = small_tables.join(inline_parts, on=_TBL_KEY, how="left").withColumn(
        "partition_list",
        F.coalesce(
            "partition_list",
            # empty-array fallback typed from the model constant so the
            # SD schema cannot drift from model.STORAGE_DESCRIPTOR
            F.array().cast(_INLINE_PARTITION_LIST_TYPE),
        ),
    )
    small_msgs = small.select(
        F.concat_ws("|", "catalog_id", "database_name", "name").alias("event_id"),
        F.lit("table").alias("message_type"),
        F.col("catalog_id").alias("source_catalog_id"),
        F.lit(batch_id).alias("export_batch_id"),
        F.to_json(
            F.struct(
                _table_struct().alias("table"),
                F.col("partition_list").alias("partition_list"),
            )
        ).alias("payload"),
        F.lit(None).cast("string").alias("bucket_name"),
        F.lit(None).cast("string").alias("region_name"),
    )

    # ---- large path: envelope + ndjson side-channel --------------------
    large_tables = routed.where((F.col("route") == "large") & publishable)
    object_key = F.concat_ws(
        "_",
        F.date_format(F.lit(run_date), "yyyy-MM-dd"),
        F.lit(str(run_id)),
        "catalog_id",
        "database_name",
        "name",
    )  # dated key shape, ExportLargeTable.java:97-101 — run_date/run_id
    # are injected job parameters, never wall-clock, for reproducibility
    large_msgs = large_tables.select(
        F.concat_ws("|", "catalog_id", "database_name", "name").alias("event_id"),
        F.lit("largeTable").alias("message_type"),
        F.col("catalog_id").alias("source_catalog_id"),
        F.lit(batch_id).alias("export_batch_id"),
        F.to_json(
            F.struct(
                F.col("catalog_id"),
                F.lit(True).alias("large_table"),
                F.col("n_partitions").alias("number_of_partitions"),
                _table_struct().alias("table"),
                object_key.alias("s3_object_key"),
                F.lit(bucket_name).alias("s3_bucket_name"),
            )
        ).alias("payload"),
        F.lit(bucket_name).alias("bucket_name"),
        F.lit(region_name).alias("region_name"),
    )

    if side_channel_path is not None:
        large_parts = partitions.join(
            large_tables.select(
                "catalog_id", "database_name", F.col("name").alias("table_name")
            ),
            on=["catalog_id", "database_name", "table_name"],
            how="left_semi",
        )
        if side_channel_writer_out is not None:
            path = side_channel_path
            side_channel_writer_out.append(
                lambda: write_partitions_ndjson(large_parts, path)
            )
        else:
            write_partitions_ndjson(large_parts, side_channel_path)

    messages = small_msgs.unionByName(large_msgs)

    audit = routed.select(
        F.concat_ws("|", "name", "database_name").alias("table_id"),
        F.lit(run_id).cast("long").alias("export_run_id"),
        F.lit(batch_id).alias("export_batch_id"),
        F.col("catalog_id").alias("source_glue_catalog_id"),
        F.to_json(_table_struct()).alias("table_schema"),
        F.when(
            publishable,
            F.concat_ws("-", F.lit("msg"), "catalog_id", "database_name", "name"),
        ).alias("sns_msg_id"),
        publishable.alias("is_exported"),
        (F.col("route") == "large").alias("is_large_table"),
        F.when((F.col("route") == "large") & publishable, F.lit(bucket_name))
        .alias("s3_bucket_name"),
        F.when((F.col("route") == "large") & publishable, object_key)
        .alias("object_key"),
        F.when(~publishable, F.lit("table has no name; publish failed")).alias(
            "error"
        ),
    )
    return messages, audit
