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

from pyspark.sql import DataFrame

DEFAULT_SYNC_KEYS = ("database_name", "table_name")


def full_refresh_sync(
    exported_parts: DataFrame,
    exported_tables: DataFrame,
    target_parts: DataFrame,
    keys: Sequence[str] = DEFAULT_SYNC_KEYS,
) -> DataFrame:
    """New target partition state.

    exported_tables: one row per table present in the export (drives the
    delete-all case even when the table's exported partition set is
    empty — presence of the TABLE in the export, not of partitions, is
    what triggers the wipe, GDCUtil.java:69-79).
    """
    keys = list(keys)
    scope = exported_tables.select(*keys).dropDuplicates(keys)
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
