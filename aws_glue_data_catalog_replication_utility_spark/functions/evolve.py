"""Schema evolution for the data plane: align, widen, union-by-name.

The reference evolves METADATA schemas by overwrite (an UPDATE_TABLE
message replaces the whole column list, GlueUtil.java:175-192); the
data plane it moves never changes shape mid-flight. A 100 TB corpus
does: years of parquet written by different producers — columns added
over time, ints that became bigints, floats that became doubles. This
module is the explicit, policy-gated answer to "make these relations
one relation":

- `evolve_to_schema(df, target, ...)`: project/pad/cast `df` to a
  target schema. Missing columns appear as typed NULLs, extra columns
  drop (or fail under strict), and type changes are allowed ONLY along
  the declared widening lattice — a silently lossy cast (bigint ->
  int, double -> float, string -> int) raises instead of corrupting.
- `merge_schemas(schemas)`: least-upper-bound schema across inputs —
  union of columns (first-seen order), each type the lattice join of
  its occurrences.
- `union_evolved(dfs)`: merge_schemas + evolve each + unionByName —
  the UNION ALL BY NAME the parquet estate needs (pinned bit-exact
  against DuckDB's native UNION ALL BY NAME in tests).

Scale notes: everything here is a per-row projection (casts + NULL
literals) — zero shuffles, whole-stage codegen, no schema inference
pass (schemas come from parquet footers Spark already read). The
lattice is deliberately small and total-ordered per family; anything
off-lattice is an error the caller must resolve explicitly (cast
yourself if you really mean it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# widening lattices, per family: any type may widen to a LATER entry
# in its own family; cross-family, integers may widen to doubles
# (exact up to 2^53 — documented, the standard SQL promotion) and
# date -> timestamp_ntz.
_INT_LADDER = ["tinyint", "smallint", "int", "bigint"]
_FLOAT_LADDER = ["float", "double"]


def _simple(dt: T.DataType) -> str:
    return dt.simpleString()


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    """True when `src -> dst` is a lossless (or standard-SQL-promoted)
    widening the lattice allows. Equal types always pass."""
    a, b = _simple(src), _simple(dst)
    if a == b:
        return True
    if a in _INT_LADDER and b in _INT_LADDER:
        return _INT_LADDER.index(a) < _INT_LADDER.index(b)
    if a in _FLOAT_LADDER and b in _FLOAT_LADDER:
        return _FLOAT_LADDER.index(a) < _FLOAT_LADDER.index(b)
    if a in _INT_LADDER and b == "double":
        return True
    if a == "date" and b in ("timestamp_ntz", "timestamp"):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return can_widen(src.elementType, dst.elementType)
    return False


def join_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Lattice join (least upper bound) of two types; raises when the
    pair has no join (the caller must cast explicitly)."""
    if can_widen(a, b):
        return b
    if can_widen(b, a):
        return a
    sa, sb = _simple(a), _simple(b)
    if sa in _INT_LADDER and sb in _FLOAT_LADDER or (
        sb in _INT_LADDER and sa in _FLOAT_LADDER
    ):
        return T.DoubleType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(join_types(a.elementType, b.elementType))
    raise ValueError(f"no schema-evolution join for {sa} and {sb}")


def _as_schema(target) -> T.StructType:
    if isinstance(target, T.StructType):
        return target
    return T.StructType.fromDDL(target)


def evolve_to_schema(
    df: DataFrame,
    target,
    strict_extra: bool = False,
) -> DataFrame:
    """Project `df` onto `target` (StructType or DDL string): pad
    missing columns with typed NULLs, widen types along the lattice,
    drop extra columns (raise instead under `strict_extra`). Raises on
    any narrowing/off-lattice change — data never silently degrades."""
    tgt = _as_schema(target)
    have = {f.name: f for f in df.schema.fields}
    extra = [n for n in df.columns if n not in {f.name for f in tgt.fields}]
    if extra and strict_extra:
        raise ValueError(f"extra columns under strict_extra: {extra}")
    cols = []
    for f in tgt.fields:
        src = have.get(f.name)
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif _simple(src.dataType) == _simple(f.dataType):
            cols.append(F.col(f.name))
        elif can_widen(src.dataType, f.dataType):
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"refusing lossy/off-lattice cast for column {f.name!r}: "
                f"{_simple(src.dataType)} -> {_simple(f.dataType)}"
            )
    return df.select(*cols)


def merge_schemas(schemas: list[T.StructType]) -> T.StructType:
    """Least-upper-bound schema: columns in first-seen order, each type
    the lattice join across every schema that carries it."""
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for s in schemas:
        for f in s.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                types[f.name] = join_types(types[f.name], f.dataType)
    return T.StructType([T.StructField(n, types[n], True) for n in order])


def union_evolved(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL BY NAME across heterogeneous relations: merge the
    schemas, evolve every input, union. Column order = first-seen;
    missing columns are NULL; types are the lattice join."""
    if not dfs:
        raise ValueError("union_evolved needs at least one DataFrame")
    tgt = merge_schemas([d.schema for d in dfs])
    out = evolve_to_schema(dfs[0], tgt)
    for d in dfs[1:]:
        out = out.unionByName(evolve_to_schema(d, tgt))
    return out
