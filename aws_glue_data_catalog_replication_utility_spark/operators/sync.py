"""Partition full-refresh sync — the 4-case semantics.

Reference README.md:266-273 / GDCUtil.java:61-111 (duplicated at
ImportLargeTable.java:147-210):

    export ∅ + target ∅  -> noop
    export ∅ + target ∃  -> delete all target partitions of that table
    export ∃ + target ∅  -> add all
    export ∃ + target ∃  -> delete all then add all (NOT a minimal diff)

Net effect: for every table present in the export, the exported
partition set becomes the whole truth; tables absent from the export
keep their target partitions. That is exactly a partition-scoped
INSERT OVERWRITE (Delta `replaceWhere` / dynamic partition overwrite),
expressed here storage-agnostically as anti-join + union.

Scale: one shuffle on (database_name, table_name). A single hot table
with millions of partitions skews that key — AQE skew-join handles the
anti-join side; the union is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_SYNC_KEYS = ("database_name", "table_name")


def full_refresh_sync(
    exported_parts: DataFrame,
    exported_tables: DataFrame,
    target_parts: DataFrame,
    keys: Sequence[str] = DEFAULT_SYNC_KEYS,
    broadcast_scope: bool = True,
) -> DataFrame:
    """New target partition state.

    exported_tables: one row per table present in the export (drives the
    delete-all case even when the table's exported partition set is
    empty — presence of the TABLE in the export, not of partitions, is
    what triggers the wipe, GDCUtil.java:69-79).

    broadcast_scope=True (default) pins the anti-join strategy: the
    scope is ONE ROW PER EXPORTED TABLE — metadata-sized by
    construction — so broadcasting it means the partition relation (the
    big, skew-prone side: one table can hold millions of partitions)
    NEVER shuffles on the sync key at all; a hot (db, table) key cannot
    hurt a join whose big side never exchanges. Pass False only for a
    catalog so large the table list itself breaks broadcast (millions
    of exported tables); that path shuffles both sides and relies on
    AQE's skew-join to split the hot key (pinned in tests)."""
    keys = list(keys)
    scope = exported_tables.select(*keys).dropDuplicates(keys)
    if broadcast_scope:
        scope = F.broadcast(scope)
    else:
        # cut the dedup aggregate out of the join's right child: AQE's
        # skew-join only splits an SMJ whose children are sorts
        # DIRECTLY over shuffle stages — with the aggregate in between,
        # the rule can't match and the hot (db, table) key's partition
        # would run as one straggler task. The scope is metadata-sized
        # (one row per exported table), so materializing it is cheap.
        scope = scope.localCheckpoint(eager=True)
    kept = target_parts.join(scope, on=keys, how="left_anti")
    return kept.unionByName(exported_parts, allowMissingColumns=False)


def snapshot_changeset(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Minimal CDC changeset between two snapshots of the same keyed
    relation: one row per key whose state changed, `change` ∈
    {insert, update, delete}; unchanged keys produce NOTHING (the
    minimal-diff contrast to `full_refresh_sync`'s delete-all-then-add,
    the reference's only sync mode — GDCUtil.java:61-111). insert and
    update rows carry the NEW payload, delete rows the OLD payload.

    Reuses `merge_outcomes` wholesale, so equality is the canonical
    (null-safe, map-normalizing) comparison the import plane already
    pins — a map column reordered between snapshots is NOT an update.
    One full-outer shuffle on the keys; the changeset is typically a
    sliver of either snapshot, which is the 100 TB point: ship/apply
    the sliver, not the snapshot."""
    from pyspark.sql import functions as F

    from .merge import ACTION_COL, merge_outcomes

    out = merge_outcomes(new, old, list(keys), compare_cols)
    return (
        out.where(F.col(ACTION_COL) != "skip")
        .withColumn(
            "change",
            F.when(F.col(ACTION_COL) == "create", F.lit("insert"))
            .when(F.col(ACTION_COL) == "update", F.lit("update"))
            .otherwise(F.lit("delete")),
        )
        .drop(ACTION_COL)
    )


def apply_changeset(
    old: DataFrame, changeset: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Replay a `snapshot_changeset` onto the old snapshot:
    apply_changeset(old, snapshot_changeset(old, new), keys) == new
    row-for-row (the round-trip law, property-tested). One anti-join on
    the (small) changed-key set — broadcastable when the diff is — plus
    a shuffle-free union."""
    from pyspark.sql import functions as F

    gone = (
        changeset.where(F.col("change").isin("update", "delete"))
        .select(*keys)
        .dropDuplicates(list(keys))
    )
    kept = old.join(gone, on=list(keys), how="left_anti")
    add = changeset.where(F.col("change").isin("insert", "update")).drop("change")
    return kept.unionByName(add.select(*old.columns))
