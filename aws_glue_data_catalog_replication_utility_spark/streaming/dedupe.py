"""Streaming event dedup: drop redelivered messages by id.

The reference's event plane is at-least-once (SQS redelivery on failure,
ExportLargeTable.java:136-141); its defense is idempotent apply. That
covers MERGE-shaped sinks — but append-only sinks (audit trails, raw
event archives) would double-append on redelivery. This operator is the
other half of the effectively-once story: per-id dedup with state
BOUNDED by the watermark (an id older than the horizon can't come back,
so its dedup state is dropped — without the watermark the state grows
forever at 100 TB event volume).

Batch mode: the same call degrades to a plain dropDuplicates, so stream
output is testable against batch output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedupe_events(
    events: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """One row per id. Pass `watermark` on streams: state is dropped for
    ids older than the horizon (dropDuplicatesWithinWatermark)."""
    if watermark is not None:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    return events.dropDuplicates(list(id_cols))
