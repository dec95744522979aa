"""Event-time windowed aggregation — the streaming-native rollup.

One plan, two run modes: under `readStream` the watermark bounds state
(late rows beyond the horizon drop, REFERENCE has no analogue — its
"streaming" is at-least-once queue consumption, SURVEY.md §2A #32); in
batch mode the same `F.window` plan is a plain aggregation, which is what
the DuckDB oracle checks (q24). Tumbling 1-hour windows: window.start ==
date_trunc('hour', ts), so the batch oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window counts/sums. Pass `watermark` when the
    input is a stream (bounds aggregation state; allows append output)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n",
            "sum_value",
        )
    )
