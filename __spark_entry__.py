"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (smoke check).
queries()      -> every declared operator query (SURVEY.md §2B).
oracle_sql()   -> matching DuckDB SQL per query (correctness gate).

Implementations live in aws_glue_data_catalog_replication_utility_spark;
this module is just the registry surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_glue_data_catalog_replication_utility_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.registry()[Q.FLAGSHIP](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same tables, same column
    names); queries without an entry get the weaker rows-only check."""
    return Q.oracles()
