"""Window operators: latest-run dedup over audit-shaped tables.

The reference's audit tables are keyed (entity_id, run_id)
(template.yaml:39-45, DDBUtil.java) — 'current status' is the row with
the max run_id per entity. Spark form: row_number over a window, rank 1.

Scale: one shuffle on the partition key; for the common max-only case
prefer `max_by`-style aggregation (one pass, partial aggregation
map-side) over the window sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_by(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
    desc: bool = True,
    tiebreak_desc: bool | None = None,
) -> DataFrame:
    """One row per key: the latest by order_col (ties broken by tiebreak
    columns, then arbitrarily-but-deterministically by all remaining
    columns is NOT attempted — callers must pass a unique tiebreak).

    tiebreak_desc controls the tiebreak direction independently of the
    order column; None (default) follows `desc`."""
    if tiebreak_desc is None:
        tiebreak_desc = desc
    ordering = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    ordering += [
        F.col(c).desc() if tiebreak_desc else F.col(c).asc() for c in tiebreak
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
