"""Generalized MERGE with outcome flags — the heart of the import side.

The reference decides create-vs-update per entity with a GetTable probe
followed by CreateTable/UpdateTable (GlueUtil.java:264-350), recording
TableReplicationStatus flags (created/updated/replicated/error). Here the
whole batch is ONE full-outer join:

    source ⟗ target ON key
      match + changed   -> 'update'
      match + unchanged -> 'skip'      (exists-skip, GDCUtil.java:149-162)
      source only       -> 'create'
      target only       -> 'keep'      (not touched by replication)

`apply_merge` materializes the new target state from those outcomes —
an idempotent join+overwrite MERGE (no Delta dependency). Running it
twice is a no-op, which is what makes the at-least-once event plane
effectively-once (SURVEY.md §3.4).

Scale: one shuffle on the merge key for each side; AQE handles skew
(one huge database's tables landing in one partition). Equality of
'changed' is computed column-wise on the compared fields only, so column
pruning keeps the scan narrow.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import lru_cache

from ..functions._exprcache import check_context, register_cache

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

ACTION_COL = "merge_action"


@lru_cache(maxsize=256)
def _canonical_named(name: str, dt_json: str) -> Column:
    """`canonical(F.col(name), dt)` cached per (column name, type): the
    rewrite recurses over the full catalog struct schema (~hundreds of
    Py4J round-trips for a storage_descriptor), and the resulting
    unresolved Column is plan-independent — merge_outcomes compares the
    same s./t. column names on every call."""
    return canonical(F.col(name), T._parse_datatype_json_string(dt_json))


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def canonical(expr: Column, dt: T.DataType) -> Column:
    """Rewrite `expr` into an equality-comparable form: Spark's `<=>`
    rejects MAP types (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE), and
    catalog rows are full of them (`parameters`, serde parameters inside
    `storage_descriptor`). Maps become a key-sorted JSON string (two maps
    equal iff their entry sets are equal, regardless of internal order);
    structs/arrays are rebuilt with map fields canonicalized, so the
    result is orderable and null-safe comparison works.
    """
    if isinstance(dt, T.MapType):
        entries = F.transform(
            F.map_entries(expr),
            lambda e: F.struct(
                e["key"].alias("key"),
                canonical(e["value"], dt.valueType).alias("value"),
            ),
        )
        return F.to_json(F.array_sort(entries))
    if isinstance(dt, T.ArrayType) and _contains_map(dt.elementType):
        return F.transform(expr, lambda e: canonical(e, dt.elementType))
    if isinstance(dt, T.StructType) and _contains_map(dt):
        rebuilt = F.struct(
            *[canonical(expr[f.name], f.dataType).alias(f.name) for f in dt.fields]
        )
        # struct(...) of a null struct yields a struct of nulls, which
        # would compare equal to a genuinely all-null struct — preserve
        # top-level nullness explicitly
        return F.when(expr.isNull(), F.lit(None)).otherwise(rebuilt)
    return expr


def _tagged(df: DataFrame, tag: str) -> DataFrame:
    return df.select(F.lit(True).alias(tag), "*")


@lru_cache(maxsize=64)
def _merge_select(
    src_schema_json: str,
    tgt_schema_json: str,
    keys: tuple[str, ...],
    compare: tuple[str, ...] | None,
) -> tuple[Column, ...]:
    """The full output select list of `merge_outcomes` — keys, payload
    columns, and the action column — memoized per (schemas, keys,
    compare set). Every Column here references only the fixed `s.`/`t.`
    aliases, so the list is plan-independent; building it costs hundreds
    of Py4J round-trips (the canonical rewrites over storage_descriptor
    alone are ~200 calls, and this box measures multiple ms per call),
    which a repeated pipeline (bench runs, fan-out targets, streaming
    micro-batches) should pay once per process, not per call."""
    src_schema = T._parse_datatype_json_string(src_schema_json)
    tgt_schema = T._parse_datatype_json_string(tgt_schema_json)
    keys_l = list(keys)
    src_cols = [f.name for f in src_schema.fields if f.name not in keys_l]
    tgt_cols = [f.name for f in tgt_schema.fields if f.name not in keys_l]
    compare_cols = (
        list(compare)
        if compare is not None
        else [c for c in src_cols if c in set(tgt_cols)]
    )

    in_src = F.col("s.__src").isNotNull()
    in_tgt = F.col("t.__tgt").isNotNull()

    src_types = {f.name: f.dataType for f in src_schema.fields}
    changed = F.lit(False)
    for c in compare_cols:
        # null-safe inequality; map-bearing columns compare via their
        # canonical (key-sorted JSON) form since <=> rejects MapType
        dt = src_types[c]
        if _contains_map(dt):
            dj = dt.json()
            lhs = _canonical_named(f"s.{c}", dj)
            rhs = _canonical_named(f"t.{c}", dj)
        else:
            lhs, rhs = F.col(f"s.{c}"), F.col(f"t.{c}")
        changed = changed | ~lhs.eqNullSafe(rhs)

    action = (
        F.when(in_src & ~in_tgt, F.lit("create"))
        .when(in_src & in_tgt & changed, F.lit("update"))
        .when(in_src & in_tgt, F.lit("skip"))
        .otherwise(F.lit("keep"))
    )

    # output the surviving row: source wins for create/update/skip,
    # target for keep
    out_cols = [F.col(k).alias(k) for k in keys_l]
    payload_cols = []
    for c in src_cols:
        if c == "__src":
            continue
        if c in set(tgt_cols):
            payload_cols.append(
                F.when(in_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            payload_cols.append(F.col(f"s.{c}").alias(c))
    for c in tgt_cols:
        if c != "__tgt" and c not in set(src_cols):
            payload_cols.append(F.col(f"t.{c}").alias(c))

    return tuple(out_cols + payload_cols + [action.alias(ACTION_COL)])


def merge_outcomes(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer join source/target; returns one row per key with
    `merge_action` ∈ {create, update, skip, keep} plus the source columns
    (for create/update/skip) or target columns (for keep).

    compare_cols: columns whose inequality means 'update'; defaults to all
    non-key source columns present on both sides.
    """
    check_context()  # cached Columns die with their SparkContext
    select_list = _merge_select(
        source.schema.json(),
        target.schema.json(),
        tuple(keys),
        tuple(compare_cols) if compare_cols is not None else None,
    )

    # presence flags must not depend on nullable payload columns: use a
    # sentinel column per side
    s = source.withColumn("__src", F.lit(True)).alias("s")
    t = target.withColumn("__tgt", F.lit(True)).alias("t")
    joined = s.join(t, on=list(keys), how="full_outer")
    return joined.select(*select_list)


def apply_merge(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """New target state after upserting `source`: every source row
    (created or updated) plus untouched target rows. Idempotent."""
    out = merge_outcomes(source, target, keys, compare_cols)
    return out.drop(ACTION_COL)


register_cache(_canonical_named.cache_clear)
register_cache(_merge_select.cache_clear)
