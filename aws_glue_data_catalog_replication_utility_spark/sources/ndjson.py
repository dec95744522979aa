"""ndjson side-channel for large partition sets.

Reference: tables above the partition threshold ship their partition
list as newline-delimited JSON in S3, one Partition per line
(ExportLargeTable.java:171-176), read back line-by-line with Gson
(S3Util.java:201-236). Spark-native: `df.write.json` / schema'd
`spark.read.json` with PERMISSIVE corrupt-record capture replacing the
reference's JsonSyntaxException catch (ImportDatabaseOrTable.java:129-132).

The write is partitioned by (database_name, table_name), so each large
table gets its own directory — the side-channel 'object' — and a
1000-executor import prunes straight to the tables it's applying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import PARTITION

CORRUPT_COL = "_corrupt_record"


PARTITION_DIR_COLS = ("catalog_id", "database_name", "table_name")


def write_partitions_ndjson(parts: DataFrame, path: str) -> None:
    """One ndjson directory per (catalog_id, database_name, table_name) —
    catalog_id in the key so two catalogs exported in one batch cannot
    merge their partition lists. Repartitioned on the dir key first so
    each table writes ONE object — the reference's one-S3-object-per-
    table layout (ExportLargeTable.java:97-104) — instead of one shard
    per upstream task per table. The partition count is EXPLICIT:
    a bare repartition(cols) lets AQE coalesce the metadata-sized
    shuffle into one task, serializing every table's to_json behind a
    single core (measured 0.8s on the q34 critical path); pinning it to
    the session default keeps the per-table writes parallel while still
    hashing each table to exactly one task."""
    n = max(parts.sparkSession.sparkContext.defaultParallelism, 1)
    (
        parts.repartition(n, *[F.col(c) for c in PARTITION_DIR_COLS])
        .write.mode("overwrite")
        .partitionBy(*PARTITION_DIR_COLS)
        .json(path)
    )


def read_partitions_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd read; malformed lines land in _corrupt_record instead of
    failing the job (the DLQ feed).

    Implemented as a text scan + `from_json` rather than a schema'd
    `.json()` read: the json file source forbids plans that reference
    only its corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    which is exactly what the DLQ branch does after column pruning.
    `from_json` has no such restriction, and the text scan still gets
    partition-directory pruning on (database_name, table_name).
    """
    import pyspark.sql.types as T

    payload_fields = [
        f for f in PARTITION.fields if f.name not in PARTITION_DIR_COLS
    ]
    schema = T.StructType(
        payload_fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)  # partition dirs restore catalog/db/table
    return raw.select(
        # partition-type inference would read numeric catalog ids as
        # longs — pin the declared string type
        F.col("catalog_id").cast("string").alias("catalog_id"),
        "database_name",
        "table_name",
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("p"),
    ).select("catalog_id", "database_name", "table_name", "p.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, corrupt_rows). Corrupt rows keep
    the partition-dir addressing columns so the DLQ can say WHICH
    table's side channel carried the bad line."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        *PARTITION_DIR_COLS, CORRUPT_COL
    )
    return good, bad
