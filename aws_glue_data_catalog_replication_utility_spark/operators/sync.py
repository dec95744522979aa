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
