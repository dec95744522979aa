"""Existence / diff / prefix joins.

The reference's point lookups (GlueUtil.java:63-75 getDatabaseIfExist,
:240-253 getTable) and prefix filter (GDCReplicationPlanner.java:124-137)
are N driver-side RPCs; here each is ONE set-oriented join that Catalyst
can broadcast when the right side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def exists_semi(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of `left` that have a match in `right` (exists check).

    Replaces the reference's per-entity GetDatabase/GetTable existence
    probes (GlueUtil.java:63-75,240-253). left-semi join: only left
    columns survive, duplicates on the right don't multiply rows.
    """
    return left.join(right, on=list(on), how="left_semi")


def missing_anti(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of `left` with NO match in `right` (the to-create diff).

    The set form of 'create if EntityNotFoundException'
    (GlueUtil.java:142-167).
    """
    return left.join(right, on=list(on), how="left_anti")


def prefix_semi_join(
    df: DataFrame,
    prefixes: Sequence[str] | DataFrame,
    col: str = "name",
    *,
    spark=None,
) -> DataFrame:
    """Keep rows whose lowercased `col` starts with ANY prefix.

    Reference: GDCReplicationPlanner.java:109-137 (tokenize + first-match
    loop) with the empty-config bypass at :70-81.

    Scale note: the prefix list is tiny (config-sized), so we broadcast
    the theta join — each input partition streams once against an
    in-memory prefix array; no shuffle of the big side. An empty prefix
    list (or one containing "") means replicate-everything: return df
    unchanged, skipping the join entirely.
    """
    if isinstance(prefixes, DataFrame):
        pref_df = prefixes
        plist = None
    else:
        plist = [p for p in prefixes if p != ""]
        if not plist:  # empty-prefix bypass (GDCReplicationPlanner.java:70-81)
            return df
        pref_df = None

    if plist is not None:
        # literal fold: OR of startswith — stays in whole-stage codegen,
        # zero shuffle, no join at all
        cond = None
        for p in plist:
            c = F.lower(F.col(col)).startswith(p.lower())
            cond = c if cond is None else (cond | c)
        return df.where(cond)

    # DataFrame-valued prefixes: broadcast theta semi-join
    return df.join(
        F.broadcast(pref_df),
        on=F.lower(df[col]).startswith(F.lower(pref_df["prefix"])),
        how="left_semi",
    )
