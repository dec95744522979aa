"""Custom stateful streaming operator: `applyInPandasWithState`.

Every other stateful need in this engine maps to a built-in (session
windows -> F.session_window, redelivery dedup ->
dropDuplicatesWithinWatermark, interval correlation -> stream-stream
join), per the UDF-last policy. This module covers the one shape the
built-ins cannot express: ORDER-SENSITIVE per-key running state — here,
per-user ingest progress with an out-of-order counter, the monitoring
signal an event-plane operator watches to size watermarks (the
reference's analogue is redelivery visibility on the SQS queues,
SQSUtil.java:17-51: how often does the bus hand us the past again?).

An event is out-of-order iff its event time precedes the maximum event
time seen in PRIOR micro-batches of that key (arrival order inside one
batch is normalized by an event-time sort, so intra-batch shuffling
never counts). That comparison against mutable per-key history is what
needs `applyInPandasWithState`: a windowed aggregation cannot see the
running maximum, and dropDuplicates has no notion of "older than what
came before".

Scale: state per key is four scalars (total, ooo, max_value, last event
time) — O(keys), no event retention; the operator emits ONE row per
(key, micro-batch) in update mode. Arrow batches per key are processed
vectorized (no per-row Python loop).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("ooo_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("ooo", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def user_event_progress(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running ingest progress over a stream: cumulative event
    count, count of out-of-order arrivals (event time older than the
    max seen in prior batches), running max value, and the latest event
    time — one output row per (user, micro-batch). On a batch
    DataFrame collapsed to one "micro-batch" the operator degenerates
    to a plain aggregation with ooo_events = 0 (pinned in tests as the
    batch-equivalence oracle)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            total, ooo, max_value, last_us = state.get
        else:
            total, ooo, max_value, last_us = 0, 0, None, None
        batch_n = 0
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            if not len(pdf):
                continue
            us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            if last_us is not None:
                ooo += int((us < last_us).sum())
                last_us = max(last_us, int(us.max()))
            else:
                last_us = int(us.max())
            vmax = pdf[value_col].max()
            if not pd.isna(vmax):
                vmax = float(vmax)
                max_value = vmax if max_value is None else max(max_value, vmax)
            total += int(len(pdf))
            batch_n += int(len(pdf))
        state.update((total, ooo, max_value, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [batch_n],
                "total_events": [total],
                "ooo_events": [ooo],
                "max_value": [max_value],
                "last_ts": [
                    pd.Timestamp(last_us, unit="us") if last_us is not None else None
                ],
            }
        )

    return (
        events.select(user_col, ts_col, value_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            PROGRESS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
