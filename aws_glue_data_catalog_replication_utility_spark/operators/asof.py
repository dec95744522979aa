"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the time-series "state at event time" operator
Spark has no native form of.

Spark-first implementation: NOT a range join (whose naive plan is a
broadcast-nested-loop or an exploding theta join) but the union-sort-
carry trick:

    union(left-tagged, right-tagged)
      -> window per key ordered by (ts, right-before-left)
      -> last(right payload, ignoreNulls) carried forward
      -> keep left rows

ONE shuffle on the key, sort within partitions, linear scan — the same
cost as a window aggregate, at any scale; skewed keys split by AQE.
Equal timestamps are inclusive (a right row AT the left row's ts
matches), matching DuckDB/standard ASOF `>=` semantics, which is what
the q42 oracle checks hash-for-hash.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F, types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """left + (for each left row) the most recent right `value_cols` with
    right.ts <= left.ts, per `by` key; nulls when no prior right row.

    `right` must be unique per (by, ts) — pre-dedupe with `latest_by`
    otherwise (ties would make 'the' as-of row ambiguous).
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != ts_col]
    value_cols = list(value_cols)
    left_payload = [c for c in left.columns if c not in by and c != ts_col]

    # All right value columns travel as ONE struct: the struct itself is
    # non-null for every right row (even when every field inside is NULL),
    # so last(..., ignorenulls) skips only the left-row placeholders —
    # a genuine NULL in a right value column propagates instead of being
    # papered over by an older row, and with several value_cols every
    # output field comes from the SAME (latest) right row rather than a
    # per-column mix. This is the DuckDB/standard ASOF contract.
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        *by,
        ts_col,
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(payload_t).alias("__r_payload"),
    )
    r_tag = right.select(
        *by,
        ts_col,
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in value_cols]).alias("__r_payload"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at the same ts -> inclusive match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__r_payload", ignorenulls=True).over(w).alias("__asof"),
    )
    return carried.where(F.col("__is_left") == 1).select(
        *by,
        ts_col,
        *left_payload,
        *[F.col("__asof").getField(c).alias(c) for c in value_cols],
    )
