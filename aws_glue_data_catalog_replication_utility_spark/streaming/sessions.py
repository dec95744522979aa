"""Session windows: the stateful streaming operator, Spark-native.

Gap-based sessions are the one aggregation whose window boundaries are
data-dependent — under `readStream` Spark keeps per-key open-session
state, merges it as events arrive, and closes sessions once the
watermark passes the gap (no hand-rolled applyInPandasWithState needed:
`F.session_window` IS the built-in custom-stateful operator, so we stay
JVM-side per the engine's UDF-last policy).

Batch mode runs the identical plan with no state (all data present), so
the stream output is testable against the batch output — same pattern
as rollup.py. The lag+running-sum formulation of the same analysis is
the oracle-checked q35 (strict '>' gap boundary vs session_window's
half-open '[start, last+gap)'; both deterministic, documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
    key_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Per-key gap-based session aggregates. Pass `watermark` when the
    input is a stream (bounds the open-session state; sessions emit once
    closed)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
