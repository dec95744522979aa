"""Hive type-string validation (SURVEY §1.2).

The reference's data plane carries column types as raw Hive type-grammar
strings (sample_table_schema.json:29 nests array<struct<...>> many
levels deep) and never validates them — an import would replicate a
corrupt type silently. Here every incoming table's column/partition-key
types are validated on import; a table carrying an invalid type routes
to the DLQ + failure audit while its siblings apply (the same
per-entity error discipline as GlueUtil.java:425-449's per-partition
batch errors).

The validator is a PURE COLUMN EXPRESSION (whole-stage codegen, no
UDF, no driver round-trip) built on the classic innermost-reduction
trick: primitives collapse to a marker token, then K unrolled rewrite
rounds collapse one composite nesting level each (array<!> -> !,
map<!,!> -> !, struct<name:!,...> -> !, uniontype<!,...> -> !); the
string is valid iff it fully reduces to the marker. K bounds the
nesting depth (default 16 — the reference's deepest fixture is ~6).

Engine-portable by construction: only global regexp_replace with an
RE2-safe subset (no lookarounds, no backrefs), so the DuckDB oracle
runs the IDENTICAL algorithm (`hive_type_valid_sql` emits it).

Grammar subset (documented contract): lowercase-insensitive, optional
whitespace, primitives {tinyint smallint int integer bigint boolean
float double "double precision" string binary timestamp timestamp_ntz
date void interval decimal[(p,s)] char(n) varchar(n)}, composites
{array<T> map<T,T> struct<name:T,...> uniontype<T,...>}; struct field
names [a-z0-9_]+ (backtick-quoted names are out of subset and report
invalid — conservative: they dead-letter for human review rather than
replicate unchecked).
"""

from __future__ import annotations

from functools import lru_cache

from ._exprcache import check_context, register_cache

from pyspark.sql import Column, functions as F

# primitives -> marker. Parameterized forms are separate alternatives
# WITHOUT a trailing \b — a word boundary cannot follow ')' (non-word
# char), so `decimal(38,18)` at end-of-type would never match inside
# one \b...\b wrapper. Ordered so parameterized forms win their bare
# prefixes (decimal(10,2) before decimal). \b keeps field names like
# `string_col` intact (word chars continue the token, so no boundary).
_PRIM_RE = (
    r"\bdecimal\(\d+(?:,\d+)?\)"
    r"|\b(?:char|varchar)\(\d+\)"
    r"|\b(?:decimal|tinyint|smallint|integer|int|bigint|boolean|float"
    r"|doubleprecision|double|string|binary|timestamp_ntz|timestamp"
    r"|date|void|interval)\b"
)

# one nesting level of each composite, innermost-first. The marker `!`
# is REJECTED from input before the reduction runs (see hive_type_valid:
# a '!' in the raw string would forge an already-reduced subtree, so
# 'array<!>' or bare '!' would validate), which is what licenses using
# it as the reduced-subtree token. Struct field names may themselves
# have collapsed
# to `!` when a name collides with a primitive (e.g. struct<string:int>)
# — harmless acceptance, the TYPE positions are still checked.
_LEVEL_RES = (
    (r"array<!>", "!"),
    (r"map<!,!>", "!"),
    (r"struct<[a-z0-9_!]+:!(?:,[a-z0-9_!]+:!)*>", "!"),
    (r"uniontype<!(?:,!)*>", "!"),
)

DEFAULT_MAX_DEPTH = 16


def hive_type_valid(type_col: Column | str, max_depth: int = DEFAULT_MAX_DEPTH) -> Column:
    """True iff the column's Hive type string is well-formed (subset
    above, nesting depth <= max_depth). NULL/empty -> False. Input
    containing the reduction marker '!' is rejected up front (ADVICE
    r04): without the gate, '!' / 'array<!>' / 'map<!,!>' would forge
    already-reduced subtrees and validate as well-formed, bypassing the
    DLQ lane this validator feeds."""
    c = F.col(type_col) if isinstance(type_col, str) else type_col
    stripped = F.regexp_replace(F.lower(c), r"\s+", "")
    s = F.regexp_replace(stripped, _PRIM_RE, "!")
    for _ in range(max_depth):
        for pat, rep in _LEVEL_RES:
            s = F.regexp_replace(s, pat, rep)
    return c.isNotNull() & ~stripped.contains("!") & (s == "!")


def _stripped_sql(expr: str) -> str:
    return f"regexp_replace(lower({expr}), '\\s+', '', 'g')"


def hive_type_valid_sql(expr: str, max_depth: int = DEFAULT_MAX_DEPTH) -> str:
    """The identical validator as a DuckDB SQL expression over `expr`
    (global regexp_replace, same RE2-safe patterns) — the oracle half
    of the cross-engine contract."""
    prim = _PRIM_RE.replace("'", "''")
    s = f"regexp_replace({_stripped_sql(expr)}, '{prim}', '!', 'g')"
    for _ in range(max_depth):
        for pat, rep in _LEVEL_RES:
            p = pat.replace("'", "''")
            s = f"regexp_replace({s}, '{p}', '{rep}', 'g')"
    return (
        f"({expr} IS NOT NULL"
        f" AND NOT contains({_stripped_sql(expr)}, '!')"
        f" AND {s} = '!')"
    )


def all_column_types_valid(
    columns_col: Column | str,
    partition_keys_col: Column | str,
    max_depth: int = DEFAULT_MAX_DEPTH,
) -> Column:
    """True iff every `type` in a table's storage-descriptor column list
    AND partition-key list is a valid Hive type string. NULL lists pass
    (a table with no columns is odd but type-well-formed); NULL or
    invalid entries fail. One forall over each array — still a narrow
    expression.

    When both columns are given BY NAME the built expression is cached
    per (names, depth): the validator unrolls to ~130 nested
    regexp_replace nodes, each a Py4J round-trip to construct, which
    measurably taxed every parse_events call (the q34 pipeline's
    driver-side plan-build phase). An unresolved Column is plan-
    independent, so reuse across DataFrames is sound."""
    if isinstance(columns_col, str) and isinstance(partition_keys_col, str):
        check_context()  # cached Columns die with their SparkContext
        return _all_column_types_valid_cached(
            columns_col, partition_keys_col, max_depth
        )
    cols = F.col(columns_col) if isinstance(columns_col, str) else columns_col
    pks = (
        F.col(partition_keys_col)
        if isinstance(partition_keys_col, str)
        else partition_keys_col
    )
    ok = lambda arr: arr.isNull() | F.forall(
        arr, lambda f: hive_type_valid(f["type"], max_depth)
    )
    return ok(cols) & ok(pks)


@lru_cache(maxsize=32)
def _all_column_types_valid_cached(
    columns_name: str, partition_keys_name: str, max_depth: int
) -> Column:
    return all_column_types_valid(
        F.col(columns_name), F.col(partition_keys_name), max_depth
    )


register_cache(_all_column_types_valid_cached.cache_clear)
