"""Temperature-scaled corpus mixing (functions/sampling.py).

Pins: alpha=1 identity, alpha=0 == the equal-budget mix_corpora
formula, fractional alpha rates == a Python reference of the same
math (binding source at exactly 100), and the kept set == a DuckDB
twin of the salted-md5 membership given the same literal rates.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
    mix_corpora,
    temperature_mix,
)

PATH = "/root/testdata/sf0.01/documents.parquet"


def TOKENS():
    return F.size(F.split(F.trim(F.col("text")), r"\s+"))


def test_alpha_one_keeps_everything(spark):
    docs = spark.read.parquet(PATH)
    out = temperature_mix(docs, "source", "doc_id", TOKENS(), alpha=1.0)
    assert out.count() == docs.count()
    assert out.where("rate_pct <> 100").count() == 0


def test_alpha_zero_equals_equal_budget_mix(spark):
    docs = spark.read.parquet(PATH)
    a = {
        r.doc_id
        for r in temperature_mix(
            docs, "source", "doc_id", TOKENS(), alpha=0.0
        ).collect()
    }
    b = {
        r.doc_id
        for r in mix_corpora(docs, "source", "doc_id", TOKENS()).collect()
    }
    assert a == b


def test_fractional_alpha_matches_reference_and_duckdb(spark):
    import duckdb

    docs = spark.read.parquet(PATH)
    alpha = 0.5
    out = temperature_mix(docs, "source", "doc_id", TOKENS(), alpha=alpha)
    got_rates = {
        r.source: r.rate_pct
        for r in out.select("source", "rate_pct").distinct().collect()
    }

    # Python reference of the rate math from exact totals
    totals = {
        r.source: r.t
        for r in docs.select(
            "source", TOKENS().alias("n")
        ).groupBy("source").agg(F.sum("n").alias("t")).collect()
    }
    shares = {s: float(t) ** alpha for s, t in totals.items()}
    z = sum(shares.values())
    budget = min(t * z / shares[s] for s, t in totals.items())
    want_rates = {
        s: max(1, min(100, int((100.0 * shares[s] * budget / z) // t)))
        for s, t in totals.items()
    }
    assert got_rates == want_rates
    assert max(want_rates.values()) == 100  # binding source keeps all

    # damping: the biggest source is rate-limited hardest
    big = max(totals, key=totals.get)
    small = min(totals, key=totals.get)
    assert want_rates[big] <= want_rates[small]

    # membership twin: identical salted-md5 bucket given the rates
    con = duckdb.connect()
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in want_rates.items()
    )
    want_ids = {
        r[0]
        for r in con.execute(f"""
            SELECT doc_id FROM '{PATH}'
            WHERE ('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                  < (CASE {cases} ELSE 0 END)
        """).fetchall()
    }
    assert {r.doc_id for r in out.collect()} == want_ids


def test_temperature_mix_validation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(docs, "source", "doc_id", TOKENS(), alpha=1.5)
    empty = docs.withColumn("text", F.lit(""))
    with pytest.raises(ValueError, match="positive token count"):
        temperature_mix(
            empty, "source", "doc_id", F.lit(0), alpha=0.5
        )
