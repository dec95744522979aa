"""Skew handling: deterministic salted joins for hot keys.

The reference dodges skew operationally — one Lambda per message, one
table's partition list per heap (ExportDatabaseWithTables.java:174's
threshold exists because of it). At 100 TB a single hot join key (one
giant database's tables, one ultra-common shingle) lands an entire
shuffle partition on one task. AQE's skew-join split (enabled in the
session factory) handles the sort-merge cases at runtime; this helper is
the explicit, plan-level alternative for when AQE can't — e.g. inside
streaming `foreachBatch` plans or aggregations feeding a join.

Mechanics: the big side gets a deterministic salt in [0, buckets) hashed
from its full row (same input -> same salt, so task retries stay
deterministic — no rand()); the small side is replicated `buckets` times
with every salt value; the join adds the salt to the key, spreading a
hot key across `buckets` tasks at the cost of a `buckets`-times-larger
small side (cheap: the small side is small, or broadcast anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `on`, with a hot key on the big side
    spread over `buckets` shuffle partitions. Result equals the plain
    join (column set and multiset of rows), independent of `buckets`.

    `how` is restricted to joins where every output row is witnessed by a
    big-side row: with right/full outer, an unmatched small-side row is
    replicated once per salt value, so the equality claim would break."""
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows {buckets}x; use one of {sorted(safe)}"
        )
    on = list(on)
    payload = [c for c in big.columns if c not in on]
    # hash the whole row: duplicate-row salts collide (harmless — they
    # were identical work anyway), distinct payloads of one hot key spread
    salt_src = [F.col(c) for c in on] + [F.col(c) for c in payload]
    big_s = big.withColumn(SALT_COL, F.pmod(F.xxhash64(*salt_src), F.lit(buckets)))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return big_s.join(small_s, on=on + [SALT_COL], how=how).drop(SALT_COL)
