"""Threshold-based routing: the small-vs-large table split.

Reference: ExportDatabaseWithTables.java:73,172-216 — tables with more
than `partitionThreshold` (default 10) partitions bypass the inline SNS
payload (256 KB cap) and take the S3 ndjson side-channel.

Spark form: ONE aggregation for all tables (map-side partial counts, one
shuffle on the group key), joined back, tagged with when/otherwise. The
reference loops table-by-table; we do the whole catalog in one plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_PARTITION_THRESHOLD = 10  # ExportDatabaseWithTables.java:73


def threshold_route(
    items: DataFrame,
    children: DataFrame,
    on: Sequence[str],
    threshold: int = DEFAULT_PARTITION_THRESHOLD,
    count_col: str = "n_children",
    route_col: str = "route",
    small: str = "inline",
    large: str = "large",
) -> DataFrame:
    """Tag each `items` row small/large by its count of `children` rows.

    Items with no children count 0 (left join) and route small — the
    reference publishes empty-partition tables inline
    (ExportDatabaseWithTables.java:174 with an empty partitionList).
    """
    on = list(on)
    counts = children.groupBy(*on).agg(F.count(F.lit(1)).alias(count_col))
    routed = (
        items.join(counts, on=on, how="left")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
        .withColumn(
            route_col,
            F.when(F.col(count_col) <= F.lit(threshold), F.lit(small)).otherwise(
                F.lit(large)
            ),
        )
    )
    return routed
