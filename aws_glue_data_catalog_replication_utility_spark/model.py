"""Catalog-plane data model: Spark schemas for Database / Table / Partition
snapshots, message envelopes, and audit rows.

Mirrors the reference's POJO fields (SURVEY.md §1.1):
- Database: GlueUtil.java:142-149, sample_database_schema.json:1-4
- Table/StorageDescriptor: GlueUtil.java:175-192, sample_table_schema.json
- Partition: GlueUtil.java:407-412, sample_partitions_schema.json
- Audit shapes: DDBUtil.java:54-65,103-105,150-157,199-205

Design decisions (vs the reference):
- `columns[].type` Hive strings stay OPAQUE strings — partitions of the
  same table may carry different nested structs (schema drift,
  sample_partitions_schema.json:31 vs :104), so no global parse.
- Timestamps are TimestampNTZ, not Gson locale strings.
- Run/batch ids are injected job parameters (SNSUtil.java:91-92 uses
  currentTimeMillis; we keep them explicit for reproducibility).
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache as _lru_cache

from pyspark.sql import types as T

from .functions._exprcache import register_cache as _register_cache

# ---------------------------------------------------------------------------
# core structs
# ---------------------------------------------------------------------------

COLUMN = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),  # opaque Hive type grammar
    ]
)

SERDE_INFO = T.StructType(
    [
        T.StructField("serialization_library", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)

SORT_COLUMN = T.StructType(
    [
        T.StructField("column", T.StringType()),
        T.StructField("sort_order", T.IntegerType()),
    ]
)

STORAGE_DESCRIPTOR = T.StructType(
    [
        T.StructField("columns", T.ArrayType(COLUMN)),
        T.StructField("location", T.StringType()),
        T.StructField("input_format", T.StringType()),
        T.StructField("output_format", T.StringType()),
        T.StructField("compressed", T.BooleanType()),
        T.StructField("number_of_buckets", T.IntegerType()),
        T.StructField("serde_info", SERDE_INFO),
        T.StructField("bucket_columns", T.ArrayType(T.StringType())),
        T.StructField("sort_columns", T.ArrayType(SORT_COLUMN)),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("stored_as_sub_directories", T.BooleanType()),
    ]
)

DATABASE = T.StructType(
    [
        T.StructField("catalog_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("location_uri", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("create_time", T.TimestampNTZType()),
    ]
)

TABLE = T.StructType(
    [
        T.StructField("catalog_id", T.StringType()),
        T.StructField("database_name", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("create_time", T.TimestampNTZType()),
        T.StructField("update_time", T.TimestampNTZType()),
        T.StructField("last_access_time", T.TimestampNTZType()),
        T.StructField("retention", T.IntegerType()),
        T.StructField("table_type", T.StringType()),
        T.StructField("view_original_text", T.StringType()),
        T.StructField("view_expanded_text", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("created_by", T.StringType()),  # dropped on replicate
        T.StructField("partition_keys", T.ArrayType(COLUMN)),
        T.StructField("storage_descriptor", STORAGE_DESCRIPTOR),
    ]
)

PARTITION = T.StructType(
    [
        T.StructField("catalog_id", T.StringType()),
        T.StructField("database_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("values", T.ArrayType(T.StringType())),
        T.StructField("creation_time", T.TimestampNTZType()),
        T.StructField("last_access_time", T.TimestampNTZType()),
        T.StructField("storage_descriptor", STORAGE_DESCRIPTOR),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)

# TableInput projection: the 10 fields that survive replication
# (GlueUtil.java:175-192 drops databaseName/createTime/updateTime/createdBy;
# table-level `parameters` wins over SD parameters, :183-190).
TABLE_INPUT_FIELDS = [
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
]

# Partition -> PartitionInput keeps only these (GlueUtil.java:407-413).
PARTITION_INPUT_FIELDS = ["values", "storage_descriptor"]

# ---------------------------------------------------------------------------
# event envelope (SNS/SQS message plane -> one events table)
# ---------------------------------------------------------------------------

MESSAGE = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        # {database, table, largeTable} — SNSUtil.java:64-67,143-146,34-39
        T.StructField("message_type", T.StringType()),
        T.StructField("source_catalog_id", T.StringType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("payload", T.StringType()),  # JSON body
        T.StructField("bucket_name", T.StringType()),
        T.StructField("region_name", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)

# ---------------------------------------------------------------------------
# audit plane (DynamoDB-equivalent append-only tables)
# ---------------------------------------------------------------------------

DB_EXPORT_STATUS = T.StructType(
    [
        T.StructField("db_id", T.StringType()),
        T.StructField("export_run_id", T.LongType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("source_glue_catalog_id", T.StringType()),
        T.StructField("database_schema", T.StringType()),
        T.StructField("sns_msg_id", T.StringType()),
        T.StructField("is_exported", T.BooleanType()),
    ]
)

TABLE_EXPORT_STATUS = T.StructType(
    [
        T.StructField("table_id", T.StringType()),  # "<table>|<db>"
        T.StructField("export_run_id", T.LongType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("source_glue_catalog_id", T.StringType()),
        T.StructField("table_schema", T.StringType()),
        T.StructField("sns_msg_id", T.StringType()),
        T.StructField("is_exported", T.BooleanType()),
        T.StructField("is_large_table", T.BooleanType()),
        T.StructField("s3_bucket_name", T.StringType()),
        T.StructField("object_key", T.StringType()),
    ]
)

DB_IMPORT_STATUS = T.StructType(
    [
        T.StructField("db_id", T.StringType()),
        T.StructField("import_run_id", T.LongType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("target_glue_catalog_id", T.StringType()),
        T.StructField("source_glue_catalog_id", T.StringType()),
        T.StructField("is_created", T.BooleanType()),
    ]
)

TABLE_IMPORT_STATUS = T.StructType(
    [
        T.StructField("table_id", T.StringType()),
        T.StructField("import_run_id", T.LongType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("database_name", T.StringType()),
        T.StructField("table_schema", T.StringType()),
        T.StructField("target_glue_catalog_id", T.StringType()),
        T.StructField("source_glue_catalog_id", T.StringType()),
        T.StructField("table_created", T.BooleanType()),
        T.StructField("table_updated", T.BooleanType()),
        T.StructField("export_has_partitions", T.BooleanType()),
        T.StructField("partitions_updated", T.BooleanType()),
    ]
)

DLQ = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("schema_type", T.StringType()),  # Table | Database
        T.StructField("payload", T.StringType()),
        T.StructField("export_batch_id", T.StringType()),
        T.StructField("source_glue_catalog_id", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic in-memory catalog fixtures for tests
# ---------------------------------------------------------------------------

def _ts(day: int, hour: int = 0) -> _dt.datetime:
    return _dt.datetime(2024, 1, day, hour, 0, 0)


def _sd(location: str, cols: list[tuple[str, str]] | None = None) -> dict:
    cols = cols or [("id", "string"), ("value", "int")]
    return {
        "columns": [{"name": n, "type": t} for n, t in cols],
        "location": location,
        "input_format": "org.apache.hadoop.mapred.TextInputFormat",
        "output_format": "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
        "compressed": True,
        "number_of_buckets": -1,
        "serde_info": {
            "serialization_library": "org.openx.data.jsonserde.JsonSerDe",
            "parameters": {"paths": ",".join(n for n, _ in cols)},
        },
        "bucket_columns": [],
        "sort_columns": [],
        "parameters": {},
        "stored_as_sub_directories": False,
    }


def sample_catalog(
    spark,
    catalog_id: str = "123412341234",
    n_dbs: int = 4,
    parts_per_table: tuple[int, ...] = (0, 3, 10, 11, 31),
):
    """Build a deterministic source-catalog snapshot (databases, tables,
    partitions DataFrames) shaped like the reference fixtures — prefixes
    raw_data_/processed_data_/tmp_, the 10/11 partition-count boundary,
    the 31-partition fixture case, and one deep nested Hive type.
    """
    prefixes = ["raw_data_", "processed_data_", "tmp_", "other_"]
    dbs, tables, parts = [], [], []
    deep_type = (
        "struct<sha:string,author:struct<name:string,email:string>,"
        "files:array<struct<path:string,bytes:int>>>"
    )
    for i in range(n_dbs):
        db = f"{prefixes[i % len(prefixes)]}db{i}"
        dbs.append(
            {
                "catalog_id": catalog_id,
                "name": db,
                "description": f"database {i}",
                "location_uri": f"s3://bucket/{db}/",
                "parameters": {"owner_team": f"team{i}"},
                "create_time": _ts(1 + i),
            }
        )
        for j, n_parts in enumerate(parts_per_table):
            tbl = f"table_{j}"
            cols = [("id", "string"), ("payload", deep_type if j == 1 else "string")]
            tables.append(
                {
                    "catalog_id": catalog_id,
                    "database_name": db,
                    "name": tbl,
                    "owner": "owner",
                    "description": f"table {j} of {db}",
                    "create_time": _ts(1 + i, 1),
                    "update_time": _ts(1 + i, 2),
                    "last_access_time": _ts(1 + i, 3),
                    "retention": 0,
                    "table_type": "EXTERNAL_TABLE",
                    "view_original_text": None,
                    "view_expanded_text": None,
                    "parameters": {"classification": "json", "compressionType": "gzip"},
                    "created_by": "arn:aws:iam::123412341234:user/someone",
                    "partition_keys": [
                        {"name": "year", "type": "string"},
                        {"name": "month", "type": "string"},
                        {"name": "day", "type": "string"},
                    ]
                    if n_parts
                    else [],
                    "storage_descriptor": _sd(f"s3://bucket/{db}/{tbl}/", cols),
                }
            )
            for p in range(n_parts):
                # schema drift: every 7th partition carries an extra column
                drift = [("id", "string"), ("extra", "boolean")] if p % 7 == 3 else None
                parts.append(
                    {
                        "catalog_id": catalog_id,
                        "database_name": db,
                        "table_name": tbl,
                        "values": ["2024", "01", f"{p + 1:02d}"],
                        "creation_time": _ts(2 + i, p % 24),
                        "last_access_time": _ts(2 + i, p % 24),
                        "storage_descriptor": _sd(
                            f"s3://bucket/{db}/{tbl}/2024/01/{p + 1:02d}/", drift
                        ),
                        "parameters": {},
                    }
                )
    return (
        spark.createDataFrame(dbs, DATABASE),
        spark.createDataFrame(tables, TABLE),
        spark.createDataFrame(parts, PARTITION),
    )


def empty_catalog(spark):
    """Empty target-catalog snapshot (all three planes)."""
    return (
        spark.createDataFrame([], DATABASE),
        spark.createDataFrame([], TABLE),
        spark.createDataFrame([], PARTITION),
    )


def _synthetic_columns(catalog_id: str):
    """The select-list column sets of `synthetic_catalog`, memoized per
    catalog_id (n_dbs only parameterizes the spark.range sources, never
    these Columns): building them costs a few hundred Py4J round trips,
    which a repeated pipeline benchmark should pay once."""
    from .functions._exprcache import check_context

    check_context()
    return _synthetic_columns_cached(catalog_id)


def synthetic_catalog(spark, catalog_id: str = "123412341234", n_dbs: int = 24):
    """Spark-native catalog generator: same shape as `sample_catalog`
    (prefix cycle, per-table partition counts (0,3,10,11,31) straddling
    the routing threshold) but built from `spark.range` + expressions —
    no driver-side row lists, so generating a million-table catalog is
    as distributed as processing one. Used by the pipeline benchmark
    (q34) so the measurement is engine time, not driver materialization.
    """
    from pyspark.sql import functions as F

    db_cols, tbl_key_cols, tbl_cols, part_key_cols, part_cols = _synthetic_columns(
        catalog_id
    )

    # partition counts sized to the data, not the cluster default — a
    # 24-row relation on 32 tasks is pure scheduling overhead; scales up
    # with n_dbs for genuinely large generated catalogs
    par = max(1, n_dbs // 12)
    dbs = spark.range(0, n_dbs, 1, par).select(*db_cols)
    tables = spark.range(0, n_dbs * 5, 1, par).select(*tbl_key_cols).select(*tbl_cols)
    partitions = (
        tables.where(F.col("__n_parts") > 0)
        .select(*part_key_cols)
        .select(*part_cols)
    )
    return dbs, tables.drop("__n_parts"), partitions


def _synthetic_columns_build(catalog_id: str):
    from pyspark.sql import functions as F

    prefixes = F.array(
        F.lit("raw_data_"), F.lit("processed_data_"), F.lit("tmp_"), F.lit("other_")
    )
    parts_per_table = F.array(*[F.lit(n) for n in (0, 3, 10, 11, 31)])
    ts0 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")

    def sd(location):
        return F.struct(
            F.array(
                F.struct(F.lit("id").alias("name"), F.lit("string").alias("type")),
                F.struct(F.lit("payload").alias("name"), F.lit("string").alias("type")),
            ).alias("columns"),
            location.alias("location"),
            F.lit("org.apache.hadoop.mapred.TextInputFormat").alias("input_format"),
            F.lit(
                "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat"
            ).alias("output_format"),
            F.lit(True).alias("compressed"),
            F.lit(-1).alias("number_of_buckets"),
            F.struct(
                F.lit("org.openx.data.jsonserde.JsonSerDe").alias(
                    "serialization_library"
                ),
                F.create_map(F.lit("paths"), F.lit("id,payload")).alias("parameters"),
            ).alias("serde_info"),
            F.array().cast("array<string>").alias("bucket_columns"),
            F.array().cast("array<struct<column:string,sort_order:int>>").alias(
                "sort_columns"
            ),
            F.create_map().cast("map<string,string>").alias("parameters"),
            F.lit(False).alias("stored_as_sub_directories"),
        )

    db_cols = (
        F.lit(catalog_id).alias("catalog_id"),
        F.concat(
            F.element_at(prefixes, (F.col("id") % 4 + 1).cast("int")),
            F.lit("db"),
            F.col("id"),
        ).alias("name"),
        F.concat(F.lit("database "), F.col("id")).alias("description"),
        F.concat(F.lit("s3://bucket/db"), F.col("id"), F.lit("/")).alias(
            "location_uri"
        ),
        F.create_map(
            F.lit("owner_team"), F.concat(F.lit("team"), F.col("id"))
        ).alias("parameters"),
        ts0.alias("create_time"),
    )

    tbl_key_cols = (
        (F.col("id") / 5).cast("long").alias("__db"),
        (F.col("id") % 5).cast("int").alias("__j"),
    )
    tbl_cols = (
        F.lit(catalog_id).alias("catalog_id"),
        F.concat(
            F.element_at(prefixes, (F.col("__db") % 4 + 1).cast("int")),
            F.lit("db"),
            F.col("__db"),
        ).alias("database_name"),
        F.concat(F.lit("table_"), F.col("__j")).alias("name"),
        F.lit("owner").alias("owner"),
        F.concat(F.lit("table "), F.col("__j")).alias("description"),
        ts0.alias("create_time"),
        ts0.alias("update_time"),
        ts0.alias("last_access_time"),
        F.lit(0).alias("retention"),
        F.lit("EXTERNAL_TABLE").alias("table_type"),
        F.lit(None).cast("string").alias("view_original_text"),
        F.lit(None).cast("string").alias("view_expanded_text"),
        F.create_map(F.lit("classification"), F.lit("json")).alias("parameters"),
        F.lit("arn:aws:iam::123412341234:user/someone").alias("created_by"),
        F.when(
            F.element_at(parts_per_table, F.col("__j") + 1) > 0,
            F.array(
                F.struct(F.lit("year").alias("name"), F.lit("string").alias("type")),
                F.struct(F.lit("month").alias("name"), F.lit("string").alias("type")),
                F.struct(F.lit("day").alias("name"), F.lit("string").alias("type")),
            ),
        )
        .otherwise(F.array().cast("array<struct<name:string,type:string>>"))
        .alias("partition_keys"),
        sd(
            F.concat(
                F.lit("s3://bucket/db"), F.col("__db"), F.lit("/table_"), F.col("__j"), F.lit("/")
            )
        ).alias("storage_descriptor"),
        F.element_at(parts_per_table, F.col("__j") + 1).alias("__n_parts"),
    )

    part_key_cols = (
        F.col("catalog_id"),
        F.col("database_name"),
        F.col("name").alias("table_name"),
        F.explode(F.sequence(F.lit(1), F.col("__n_parts"))).alias("__p"),
    )
    part_cols = (
        F.col("catalog_id"),
        F.col("database_name"),
        F.col("table_name"),
        F.array(
            F.lit("2024"), F.lit("01"), F.lpad(F.col("__p").cast("string"), 2, "0")
        ).alias("values"),
        ts0.alias("creation_time"),
        ts0.alias("last_access_time"),
        sd(
            F.concat(
                F.lit("s3://bucket/"),
                F.col("database_name"),
                F.lit("/"),
                F.col("table_name"),
                F.lit("/2024/01/"),
                F.lpad(F.col("__p").cast("string"), 2, "0"),
                F.lit("/"),
            )
        ).alias("storage_descriptor"),
        F.create_map().cast("map<string,string>").alias("parameters"),
    )
    return db_cols, tbl_key_cols, tbl_cols, part_key_cols, part_cols


_synthetic_columns_cached = _lru_cache(maxsize=8)(_synthetic_columns_build)
_register_cache(_synthetic_columns_cached.cache_clear)
