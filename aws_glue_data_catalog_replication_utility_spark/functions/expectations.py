"""Data-quality expectations: declarative constraint validation.

The reference validates its metadata plane (Hive type strings,
`functions/hive_types.py`; malformed-JSON DLQ routing,
ImportDatabaseOrTable.java:129-132) but has nothing for the DATA
plane. At 100 TB a silent constraint break (null keys, duplicate ids,
orphaned foreign keys, out-of-range measures) poisons every downstream
join and training run — this module is the Deequ-style gate: declare
checks, get one report, optionally sample the violating rows for the
DLQ.

Scale design, the part that matters:
- Every ROW-LOCAL check (not_null / in_range / accepted_values /
  matches / expr) compiles to one conditional-sum column in a SINGLE
  aggregate over a SINGLE scan of the input — adding a tenth check
  adds zero scans and zero shuffles (plan-asserted in tests: one
  FileScan, whole-stage codegen, partial agg map-side).
- `unique` is one hash-shuffle on its key columns (map-side combined);
  violations = rows in excess of one per key, i.e. sum(cnt - 1).
- `foreign_key` is one left-anti join against the referenced keys —
  broadcast-able when the dimension is small (Catalyst/AQE decides;
  the check never forces a shuffle join on a broadcastable dim).
- The report itself is #checks rows assembled from collected SCALARS —
  driver traffic is O(checks), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---- check constructors -------------------------------------------------
# A check is a plain dict: {"kind", "name", ...kind-specific}. Plain data
# so a CLI/JSON spec round-trips 1:1.


def not_null(col: str, name: str | None = None) -> dict:
    return {"kind": "not_null", "col": col, "name": name or f"not_null({col})"}


def in_range(
    col: str, lo=None, hi=None, name: str | None = None
) -> dict:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return {
        "kind": "in_range", "col": col, "lo": lo, "hi": hi,
        "name": name or f"in_range({col},{lo},{hi})",
    }


def accepted_values(col: str, values: list, name: str | None = None) -> dict:
    return {
        "kind": "accepted_values", "col": col, "values": list(values),
        "name": name or f"accepted_values({col})",
    }


def matches(col: str, pattern: str, name: str | None = None) -> dict:
    return {
        "kind": "matches", "col": col, "pattern": pattern,
        "name": name or f"matches({col})",
    }


def expr(sql_predicate: str, name: str | None = None) -> dict:
    return {
        "kind": "expr", "predicate": sql_predicate,
        "name": name or f"expr({sql_predicate})",
    }


def unique(cols: list[str] | str, name: str | None = None) -> dict:
    cols = [cols] if isinstance(cols, str) else list(cols)
    return {
        "kind": "unique", "cols": cols,
        "name": name or f"unique({','.join(cols)})",
    }


def foreign_key(
    col: str, ref: DataFrame, ref_col: str, name: str | None = None
) -> dict:
    return {
        "kind": "foreign_key", "col": col, "ref": ref, "ref_col": ref_col,
        "name": name or f"foreign_key({col})",
    }


def checks_from_spec(spark, spec: list[dict]) -> list[dict]:
    """Hydrate a JSON check spec (what the `expect` CLI job reads):
    constructor-validated, and `foreign_key`'s `ref` path string becomes
    the referenced DataFrame (parquet)."""
    ctors = {
        "not_null": lambda c: not_null(c["col"], c.get("name")),
        "in_range": lambda c: in_range(
            c["col"], c.get("lo"), c.get("hi"), c.get("name")),
        "accepted_values": lambda c: accepted_values(
            c["col"], c["values"], c.get("name")),
        "matches": lambda c: matches(c["col"], c["pattern"], c.get("name")),
        "expr": lambda c: expr(c["predicate"], c.get("name")),
        "unique": lambda c: unique(c["cols"], c.get("name")),
        "foreign_key": lambda c: foreign_key(
            c["col"], spark.read.parquet(c["ref"]), c["ref_col"],
            c.get("name")),
    }
    out = []
    for c in spec:
        if c.get("kind") not in ctors:
            raise ValueError(f"unknown check kind: {c.get('kind')!r}")
        out.append(ctors[c["kind"]](c))
    return out


# ---- evaluation ---------------------------------------------------------


def _row_local_ok(c: dict) -> Column:
    """The per-row PASS predicate for a row-local check. NULL handling
    is explicit per kind: not_null fails on NULL; the value checks PASS
    on NULL (compose with not_null to also forbid NULLs — the SQL
    three-valued-logic convention dbt/Deequ both follow)."""
    kind = c["kind"]
    if kind == "not_null":
        return F.col(c["col"]).isNotNull()
    if kind == "in_range":
        v = F.col(c["col"])
        ok = F.lit(True)
        if c["lo"] is not None:
            ok = ok & (v >= F.lit(c["lo"]))
        if c["hi"] is not None:
            ok = ok & (v <= F.lit(c["hi"]))
        return v.isNull() | ok
    if kind == "accepted_values":
        v = F.col(c["col"])
        return v.isNull() | v.isin(c["values"])
    if kind == "matches":
        v = F.col(c["col"])
        return v.isNull() | v.rlike(c["pattern"])
    if kind == "expr":
        return F.expr(c["predicate"])
    raise ValueError(f"not a row-local check: {kind}")


ROW_LOCAL = ("not_null", "in_range", "accepted_values", "matches", "expr")


def check_expectations(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every check; return a small report DataFrame
    (check string, kind string, violations bigint, total bigint,
    passed boolean) in the declared check order. One scan for ALL
    row-local checks; one job per unique / foreign_key check."""
    spark = df.sparkSession
    row_local = [c for c in checks if c["kind"] in ROW_LOCAL]
    rows: dict[str, tuple[str, int, int]] = {}

    total = None
    if row_local:
        agg = df.agg(
            F.count(F.lit(1)).alias("__total"),
            *[
                # a NULL predicate (possible for `expr` checks under
                # three-valued logic) counts as a VIOLATION — same
                # coalesce the sampling lane applies
                F.sum(
                    (~F.coalesce(_row_local_ok(c), F.lit(False))).cast("long")
                ).alias(f"__c{i}")
                for i, c in enumerate(row_local)
            ],
        ).collect()[0]
        total = agg["__total"]
        for i, c in enumerate(row_local):
            rows[c["name"]] = (c["kind"], int(agg[f"__c{i}"] or 0), total)

    for c in checks:
        if c["kind"] == "unique":
            if total is None:
                total = df.count()
            # rows in excess of one per key; NULL-keyed rows group
            # together like SQL GROUP BY (documented)
            excess = (
                df.groupBy(*c["cols"])
                .count()
                .where(F.col("count") > 1)
                .agg(F.sum(F.col("count") - 1))
                .collect()[0][0]
            )
            rows[c["name"]] = (c["kind"], int(excess or 0), total)
        elif c["kind"] == "foreign_key":
            if total is None:
                total = df.count()
            orphans = (
                df.where(F.col(c["col"]).isNotNull())
                .join(
                    c["ref"].select(
                        F.col(c["ref_col"]).alias(c["col"])
                    ).distinct(),
                    on=c["col"],
                    how="left_anti",
                )
                .count()
            )
            rows[c["name"]] = (c["kind"], int(orphans), total)
        elif c["kind"] not in ROW_LOCAL:
            raise ValueError(f"unknown check kind: {c['kind']}")

    data = [
        (c["name"], *rows[c["name"]], rows[c["name"]][1] == 0)
        for c in checks
    ]
    return spark.createDataFrame(
        data,
        "check string, kind string, violations bigint, total bigint, "
        "passed boolean",
    )


def expectation_violations(
    df: DataFrame, checks: list[dict], limit_per_check: int = 100
) -> DataFrame:
    """Up to `limit_per_check` violating rows per check, as
    (check string, row struct<...all df columns>) — the DLQ feed.
    Bounded output by construction; each failing check costs one
    limited job."""
    spark = df.sparkSession
    if not checks:
        return spark.createDataFrame([], "check string")
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("row")
    parts = []
    for c in checks:
        if c["kind"] in ROW_LOCAL:
            bad = df.where(~F.coalesce(_row_local_ok(c), F.lit(False)))
        elif c["kind"] == "unique":
            dupe_keys = (
                df.groupBy(*c["cols"]).count().where(F.col("count") > 1)
                .select(*c["cols"])
            )
            bad = df.join(dupe_keys, on=c["cols"], how="left_semi")
        elif c["kind"] == "foreign_key":
            bad = df.where(F.col(c["col"]).isNotNull()).join(
                c["ref"].select(
                    F.col(c["ref_col"]).alias(c["col"])
                ).distinct(),
                on=c["col"],
                how="left_anti",
            )
        else:
            raise ValueError(f"unknown check kind: {c['kind']}")
        parts.append(
            bad.select(F.lit(c["name"]).alias("check"), payload)
            .limit(limit_per_check)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
