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
time seen in PRIOR micro-batches of that key. The prior-batch maximum
is snapshotted BEFORE the per-chunk loop and held fixed across every
Arrow chunk of the micro-batch (the running batch max is folded into
state exactly once, after the loop), so the count is independent of
`spark.sql.execution.arrow.maxRecordsPerBatch` — intra-batch order and
chunk boundaries never count. That comparison against mutable per-key
history is what needs `applyInPandasWithState`: a windowed aggregation
cannot see the running maximum, and dropDuplicates has no notion of
"older than what came before".

Scale: state per key is four scalars (total, ooo, max_value, last event
time) — O(keys), no event retention; the operator emits ONE row per
(key, micro-batch) in update mode. Arrow batches per key are processed
vectorized (no per-row Python loop). On an infinite key space, pass
`state_ttl_ms` to evict idle keys: the operator switches to
`GroupStateTimeout.EventTimeTimeout` and drops a key's state once the
watermark passes `last_event + ttl` (the Spark-native analogue of the
reference's SQS visibility/redelivery horizon, template.yaml:124); a
re-arriving key restarts from empty state.
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
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-user running ingest progress over a stream: cumulative event
    count, count of out-of-order arrivals (event time strictly older
    than the max seen in PRIOR micro-batches — chunk-boundary
    independent by construction), running max value, and the latest
    event time — one output row per (user, micro-batch). On a batch
    DataFrame collapsed to one "micro-batch" the operator degenerates
    to a plain aggregation with ooo_events = 0 (pinned in tests as the
    batch-equivalence oracle).

    `state_ttl_ms`: when set, a watermark (`watermark_delay` lateness)
    is applied to `ts_col` and per-key state is evicted once the
    watermark passes the key's last event time + ttl. Eviction emits no
    row (the key simply stops existing, as with an expired SQS
    visibility horizon); a later event for the key restarts from empty
    state. When None (default) state lives forever (NoTimeout) —
    appropriate for bounded key spaces and the batch-degenerate leg."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl = state_ttl_ms

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            total, ooo, max_value, last_us = state.get
        else:
            total, ooo, max_value, last_us = 0, 0, None, None
        # Out-of-order means older than PRIOR micro-batches' max only:
        # compare every chunk against the pre-batch snapshot, never
        # against earlier chunks of the same batch (Arrow chunking at
        # arrow.maxRecordsPerBatch must not change the count).
        prior_last = last_us
        batch_max_us = None
        batch_n = 0
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            if not len(pdf):
                continue
            us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            if prior_last is not None:
                ooo += int((us < prior_last).sum())
            chunk_max = int(us.max())
            batch_max_us = (
                chunk_max if batch_max_us is None else max(batch_max_us, chunk_max)
            )
            vmax = pdf[value_col].max()
            if not pd.isna(vmax):
                vmax = float(vmax)
                max_value = vmax if max_value is None else max(max_value, vmax)
            total += int(len(pdf))
            batch_n += int(len(pdf))
        if batch_max_us is not None:
            last_us = batch_max_us if last_us is None else max(last_us, batch_max_us)
        state.update((total, ooo, max_value, last_us))
        if ttl is not None and last_us is not None:
            # Timeout fires when the watermark passes this timestamp;
            # it must sit strictly above the current watermark or Spark
            # rejects it, hence the max() with wm+1.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_us // 1000 + ttl, wm + 1))
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

    if ttl is not None:
        events = events.withWatermark(ts_col, watermark_delay)
    return (
        events.select(user_col, ts_col, value_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            PROGRESS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout,
        )
    )
