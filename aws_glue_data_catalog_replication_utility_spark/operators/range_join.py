"""Range (interval) join: match rows to the time intervals containing
them — Spark's planner turns a bare `ts BETWEEN start AND end` join
condition into a broadcast-nested-loop (quadratic per key), the classic
range-join trap.

Scale path: bucketize. Points map to one fixed-width time bucket;
intervals explode to every bucket they overlap (⌈len/width⌉+1 rows —
pick width ≈ typical interval length so that's ~2); the join becomes an
EQUI-join on (key, bucket) — hash join, one shuffle — followed by the
exact range filter. Same candidates-then-exact-filter shape as the LSH
and SimHash banding operators: the bucket key is just LSH for the time
axis.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_BUCKET = "__bucket"


def _bucket_of(ts_col, width_seconds: int):
    # ntz -> instant is exact under the engine's pinned UTC session
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (micros / F.lit(width_seconds * 1_000_000)).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    width_seconds: int = 7200,
) -> DataFrame:
    """Inner-join each `points` row to every `intervals` row (same `by`
    key) whose [start, end] contains its ts — via bucket equi-join +
    exact filter. Equivalent to the naive theta join, never quadratic."""
    by = list(by)
    p = points.withColumn(_BUCKET, _bucket_of(ts_col, width_seconds))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                _bucket_of(start_col, width_seconds),
                _bucket_of(end_col, width_seconds),
            )
        ),
    )
    return (
        p.join(i, on=by + [_BUCKET])
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop(_BUCKET)
    )
