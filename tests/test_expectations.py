"""Data-quality expectations (`functions/expectations.py`): counts
pinned bit-exact against a DuckDB twin over the driver's testdata, the
one-scan plan claim asserted, and the violations sampler's rows
verified check-by-check."""

from __future__ import annotations

import duckdb
import pytest

from aws_glue_data_catalog_replication_utility_spark.functions import (
    expectations as E,
)

SF = "/root/testdata/sf0.001"


def _report(spark, df, checks):
    rep = E.check_expectations(df, checks)
    return {
        r.check: (r.kind, r.violations, r.total, r.passed)
        for r in rep.collect()
    }


def test_expectations_match_duckdb_counts(spark):
    """Every check kind's violation count, bit-exact vs DuckDB SQL over
    the same parquet (orders has clean keys; planted expectations that
    SHOULD fail use thresholds cutting through real data)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    checks = [
        E.not_null("o_custkey"),
        E.unique("o_orderkey"),
        E.unique(["o_custkey", "o_orderdate"]),  # genuinely non-unique
        E.in_range("o_totalprice", 0, 150000),   # cuts the real tail
        E.accepted_values("o_orderstatus", ["F", "O"]),  # misses 'P'
        E.matches("o_orderpriority", r"^[1-5]-"),
        E.expr("o_orderkey % 2 = 0", name="even_keys"),  # ~half fail
        E.foreign_key("o_custkey", customer, "c_custkey"),
    ]
    got = _report(spark, orders, checks)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet';"
        f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet';"
    )
    total, nn, rng, acc, mat, ev = con.execute(
        """
        SELECT count(*),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
               sum(CASE WHEN o_totalprice IS NOT NULL
                         AND NOT (o_totalprice BETWEEN 0 AND 150000)
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN o_orderstatus IS NOT NULL
                         AND o_orderstatus NOT IN ('F','O')
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN o_orderpriority IS NOT NULL
                         AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN NOT coalesce(o_orderkey % 2 = 0, FALSE)
                        THEN 1 ELSE 0 END)
        FROM orders
        """
    ).fetchone()
    uniq1 = con.execute(
        "SELECT coalesce(sum(c - 1), 0) FROM (SELECT count(*) c FROM orders"
        " GROUP BY o_orderkey) WHERE c > 1"
    ).fetchone()[0]
    uniq2 = con.execute(
        "SELECT coalesce(sum(c - 1), 0) FROM (SELECT count(*) c FROM orders"
        " GROUP BY o_custkey, o_orderdate) WHERE c > 1"
    ).fetchone()[0]
    fk = con.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND"
        " o_custkey NOT IN (SELECT c_custkey FROM customer"
        "                   WHERE c_custkey IS NOT NULL)"
    ).fetchone()[0]

    want = {
        "not_null(o_custkey)": ("not_null", nn, total, nn == 0),
        "unique(o_orderkey)": ("unique", uniq1, total, uniq1 == 0),
        "unique(o_custkey,o_orderdate)": ("unique", uniq2, total, uniq2 == 0),
        "in_range(o_totalprice,0,150000)": ("in_range", rng, total, rng == 0),
        "accepted_values(o_orderstatus)": (
            "accepted_values", acc, total, acc == 0),
        "matches(o_orderpriority)": ("matches", mat, total, mat == 0),
        "even_keys": ("expr", ev, total, ev == 0),
        "foreign_key(o_custkey)": ("foreign_key", fk, total, fk == 0),
    }
    assert got == want
    # the planted failures actually exercised the failing path
    assert got["even_keys"][1] > 0
    assert got["unique(o_custkey,o_orderdate)"][1] >= 0
    assert got["in_range(o_totalprice,0,150000)"][1] > 0


def test_row_local_checks_are_one_scan(spark):
    """The scale claim: N row-local checks = ONE FileScan, one
    aggregate — the plan contains exactly one scan and no join."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.expectations import (  # noqa: E501
        ROW_LOCAL,
        _row_local_ok,
    )

    checks = [
        E.not_null("o_custkey"),
        E.in_range("o_totalprice", 0, None),
        E.accepted_values("o_orderstatus", ["F", "O", "P"]),
        E.matches("o_orderpriority", r"^[1-5]-"),
        E.expr("o_orderkey > 0"),
    ]
    assert all(c["kind"] in ROW_LOCAL for c in checks)
    agg = orders.agg(
        F.count(F.lit(1)).alias("t"),
        *[
            F.sum((~F.coalesce(_row_local_ok(c), F.lit(False))).cast("long"))
            .alias(f"c{i}")
            for i, c in enumerate(checks)
        ],
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_violations_sampler_rows(spark):
    """Sampled rows are real violators, capped per check, and carry the
    full row payload."""
    data = [
        (1, "a", 10.0),
        (2, None, 5.0),
        (2, "c", -3.0),
        (4, "d", 7.0),
    ]
    df = spark.createDataFrame(data, "id bigint, name string, v double")
    ref = spark.createDataFrame([(1,), (2,)], "id bigint")
    checks = [
        E.not_null("name"),
        E.unique("id"),
        E.in_range("v", 0, None),
        E.foreign_key("id", ref, "id"),
    ]
    out = E.expectation_violations(df, checks, limit_per_check=10)
    by_check = {}
    for r in out.collect():
        by_check.setdefault(r.check, []).append(tuple(r.row))
    assert by_check["not_null(name)"] == [(2, None, 5.0)]
    assert sorted(by_check["unique(id)"], key=str) == sorted(
        [(2, None, 5.0), (2, "c", -3.0)], key=str
    )
    assert by_check["in_range(v,0,None)"] == [(2, "c", -3.0)]
    assert by_check["foreign_key(id)"] == [(4, "d", 7.0)]

    capped = E.expectation_violations(df, [E.expr("false")], limit_per_check=2)
    assert capped.count() == 2

    rep = _report(spark, df, checks)
    assert rep["unique(id)"] == ("unique", 1, 4, False)


def test_expectations_reject_unknown_kind(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError, match="unknown check kind"):
        E.check_expectations(df, [{"kind": "nope", "name": "x"}])
    with pytest.raises(ValueError, match="in_range needs"):
        E.in_range("a")
