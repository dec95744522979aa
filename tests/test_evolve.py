"""Schema evolution (`functions/evolve.py`): widening lattice rules,
lossy-cast refusal, and union-by-name pinned bit-exact against DuckDB's
native UNION ALL BY NAME."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from aws_glue_data_catalog_replication_utility_spark.functions.evolve import (
    can_widen,
    evolve_to_schema,
    join_types,
    merge_schemas,
    union_evolved,
)


def test_widening_lattice():
    s = T.StructType.fromDDL
    assert can_widen(T.IntegerType(), T.LongType())
    assert can_widen(T.IntegerType(), T.DoubleType())
    assert can_widen(T.FloatType(), T.DoubleType())
    assert can_widen(T.DateType(), T.TimestampNTZType())
    assert can_widen(T.DecimalType(10, 2), T.DecimalType(12, 2))
    assert can_widen(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())
    )
    # narrowing / off-lattice all refused
    assert not can_widen(T.LongType(), T.IntegerType())
    assert not can_widen(T.DoubleType(), T.FloatType())
    assert not can_widen(T.StringType(), T.IntegerType())
    assert not can_widen(T.IntegerType(), T.StringType())
    assert not can_widen(T.DecimalType(12, 4), T.DecimalType(12, 2))

    assert join_types(T.IntegerType(), T.LongType()).simpleString() == "bigint"
    assert (
        join_types(T.LongType(), T.FloatType()).simpleString() == "double"
    )
    with pytest.raises(ValueError, match="no schema-evolution join"):
        join_types(T.StringType(), T.LongType())


def test_evolve_to_schema_pads_widens_drops(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "a int, b float, extra string"
    )
    out = evolve_to_schema(df, "a bigint, b double, c string")
    assert out.schema.simpleString() == (
        "struct<a:bigint,b:double,c:string>"
    )
    row = out.collect()[0]
    assert (row.a, row.c) == (1, None)
    assert abs(row.b - 2.5) < 1e-9

    with pytest.raises(ValueError, match="extra columns"):
        evolve_to_schema(df, "a bigint", strict_extra=True)
    with pytest.raises(ValueError, match="refusing lossy"):
        evolve_to_schema(df, "a smallint, b double, extra string")


def test_merge_schemas_first_seen_order(spark):
    s1 = T.StructType.fromDDL("a int, b float")
    s2 = T.StructType.fromDDL("b double, c string, a bigint")
    merged = merge_schemas([s1, s2])
    assert merged.simpleString() == (
        "struct<a:bigint,b:double,c:string>"
    )


def test_union_evolved_matches_duckdb_union_by_name(spark, tmp_path):
    """Three generations of the same feed — column added, int widened —
    unioned by name: row set bit-exact vs DuckDB's UNION ALL BY NAME
    over the same parquet files."""
    gen1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"
    )
    gen2 = spark.createDataFrame(
        [(3000000000, "c", 1.5)], "id bigint, name string, score double"
    )
    gen3 = spark.createDataFrame(
        [(4, 2.25), (5, None)], "id int, score double"
    )
    paths = []
    for i, g in enumerate([gen1, gen2, gen3]):
        p = str(tmp_path / f"gen{i}")
        g.coalesce(1).write.parquet(p)
        paths.append(p)

    out = union_evolved(
        [spark.read.parquet(p) for p in paths]
    )
    assert out.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double>"
    )
    got = sorted(map(tuple, out.collect()), key=str)

    con = duckdb.connect()
    want = con.execute(
        f"SELECT * FROM read_parquet('{paths[0]}/*.parquet')"
        f" UNION ALL BY NAME "
        f"SELECT * FROM read_parquet('{paths[1]}/*.parquet')"
        f" UNION ALL BY NAME "
        f"SELECT * FROM read_parquet('{paths[2]}/*.parquet')"
    ).fetchall()
    # align column order: duckdb returns first-seen order too
    assert got == sorted(map(tuple, want), key=str)


def test_union_evolved_zero_shuffle_plan(spark):
    """The scale claim: evolution is pure projection — the unioned plan
    has no Exchange."""
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([(2.5, 3)], "score double, id int")
    plan = (
        union_evolved([a, b])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
