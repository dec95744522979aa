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
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions._exprcache import check_context, register_cache


@lru_cache(maxsize=256)
def _rank_col(
    keys: tuple[str, ...],
    order_col: str,
    tiebreak: tuple[str, ...],
    desc: bool,
    tiebreak_desc: bool,
) -> Column:
    """row_number over the (keys, ordering) window, memoized: the window
    spec + rank Column reference only column names, so they are
    plan-independent, and the import pipeline calls latest_by with the
    same handful of key sets on every batch."""
    ordering = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    ordering += [
        F.col(c).desc() if tiebreak_desc else F.col(c).asc() for c in tiebreak
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return F.row_number().over(w)


register_cache(_rank_col.cache_clear)


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
    check_context()
    rn = _rank_col(tuple(keys), order_col, tuple(tiebreak), desc, tiebreak_desc)
    return (
        df.withColumn("__rn", rn)
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
