"""Corpus report / dataset card (functions/report.py).

Integer facts pinned exactly against DuckDB; percentiles are declared
approximate and tolerance-checked against exact quantiles; the card
adapts to the schema (absent axes skipped) and the HLL lane stays
within its error envelope.
"""
from __future__ import annotations

import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.report import (
    corpus_report,
)

PATH = "/root/testdata/sf0.01/documents.parquet"


def test_corpus_report_matches_duckdb(spark):
    import duckdb

    docs = spark.read.parquet(PATH)
    card = corpus_report(docs)

    con = duckdb.connect()
    n, nulls, toks, chars, dfp, tmin, tmax = con.execute(f"""
        WITH b AS (
          SELECT text,
                 CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS t,
                 length(coalesce(text, '')) AS c,
                 md5(regexp_replace(lower(trim(coalesce(text, ''))),
                                    '\\s+', ' ', 'g')) AS fp
          FROM '{PATH}')
        SELECT count(*), sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
               sum(t), sum(c), count(DISTINCT fp), min(t), max(t)
        FROM b
    """).fetchone()

    assert card["n_docs"] == n
    assert card["n_null_text"] == nulls
    assert card["total_tokens"] == toks
    assert card["total_chars"] == chars
    assert card["distinct_fingerprints"] == dfp
    assert card["exact_dup_docs"] == n - dfp
    assert card["dup_count_method"] == "exact"
    assert card["tokens"]["min"] == tmin and card["tokens"]["max"] == tmax

    # percentiles: declared approximate, must sit within the exact
    # quantile neighborhood
    for key, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)):
        lo, hi = con.execute(f"""
            WITH b AS (
              SELECT CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS t
              FROM '{PATH}')
            SELECT quantile_disc(t, {max(q - 0.02, 0.0)}),
                   quantile_disc(t, {min(q + 0.02, 1.0)})
            FROM b
        """).fetchone()
        assert lo <= card["tokens"][key] <= hi, key

    # composition axes exact (top-N by docs, ties by value)
    want_src = con.execute(f"""
        WITH b AS (
          SELECT source,
                 CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS t
          FROM '{PATH}')
        SELECT source, count(*), sum(t) FROM b
        GROUP BY source ORDER BY count(*) DESC, source ASC LIMIT 20
    """).fetchall()
    got_src = [
        (e["value"], e["docs"], e["tokens"]) for e in card["axes"]["source"]
    ]
    assert got_src == [tuple(r) for r in want_src]
    assert set(card["axes"]) == {"source", "lang"}

    # token shares sum to <= 1 and each matches tokens/total
    for e in card["axes"]["source"]:
        assert e["token_share"] == e["tokens"] / card["total_tokens"]


def test_corpus_report_adapts_and_hll_lane(spark):
    docs = spark.read.parquet(PATH).drop("lang")
    card = corpus_report(docs, approx=True)
    assert set(card["axes"]) == {"source"}  # absent axis skipped
    assert card["dup_count_method"] == "hll"
    exact = corpus_report(spark.read.parquet(PATH))["distinct_fingerprints"]
    assert card["distinct_fingerprints"] == pytest.approx(exact, rel=0.05)

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    zero = corpus_report(empty)
    assert zero["n_docs"] == 0 and zero["exact_dup_rate"] == 0.0
