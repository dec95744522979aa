"""Stream-stream interval join: correlate two event streams within a
time bound, with state bounded by watermarks.

The reference correlates its two event kinds (table messages and their
side-channel objects) by retry — redeliver until the other side exists
(ImportLargeTable.java:78-81). The streaming-native form is an interval
join: each side declares a watermark, the join condition bounds how far
the timestamps may drift, and Spark keeps ONLY the rows inside the
watermark horizon as state — late rows age out instead of accumulating
(at 100 TB event volume, unbounded join state is the failure mode this
avoids).

Batch mode runs the identical plan as a plain range-condition join, so
stream output is testable against batch output — the same
one-plan-two-modes pattern as rollup.py / sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Rows of `left` matched to `right` rows with the same `on` key
    whose timestamp lies in [left_ts - lower, left_ts + upper]. Pass
    `watermark` when both inputs are streams: each side's state is
    dropped once the other side's watermark passes the interval bound
    (Spark derives the state horizon from the join condition — this is
    what makes the join runnable unbounded).

    Output columns: all of left's, plus right's non-key columns
    prefixed `r_` (e.g. right's ts arrives as `r_ts`).
    """
    l, r = left.alias("l"), right.alias("r")
    if watermark is not None:
        l = left.withWatermark(left_ts, watermark).alias("l")
        r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    right_cols = [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != on
    ]
    return l.join(r, on=cond).select("l.*", *right_cols)
