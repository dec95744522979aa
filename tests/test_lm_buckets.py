"""CCNet-style perplexity bucketing (functions/text.py lm_buckets).

Contract: tiers are monotone in the LM score by construction,
proportions track the declared percents, and cutoffs + assignments
agree with a DuckDB quantile_cont twin (boundary docs excluded — the
cutoff itself is an interpolated double).
"""
from __future__ import annotations

import math

import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.text import (
    lm_buckets,
)

PATH = "/root/testdata/sf0.01/documents.parquet"


def test_lm_buckets_monotone_proportions_and_duckdb_twin(spark):
    import duckdb

    docs = spark.read.parquet(PATH)
    out = lm_buckets(docs).cache()
    try:
        rows = {r.doc_id: (r.avg_logprob, r.lm_bucket) for r in out.collect()}
        n = len(rows)
        assert n == docs.count()

        # proportions track the declared thirds
        from collections import Counter

        c = Counter(v[1] for v in rows.values())
        for name, pct in (("tail", 34), ("middle", 33), ("head", 33)):
            assert abs(c[name] / n - pct / 100) < 0.05, (name, c)

        # monotone tiers: max(tail) <= min(middle) etc. (boundary docs
        # go to the worse tier, so the inequality is non-strict)
        by = {
            b: [s for s, bb in rows.values() if bb == b]
            for b in ("tail", "middle", "head")
        }
        assert max(by["tail"]) <= min(by["middle"])
        assert max(by["middle"]) <= min(by["head"])

        # DuckDB twin: same scorer, quantile_cont cutoffs; assignments
        # must agree for every doc not sitting ON a cutoff
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{PATH}')"
        )
        want = {r[0]: r[1:] for r in con.execute("""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            tc AS (SELECT doc_id, term, count(*)::BIGINT c FROM toks GROUP BY 1, 2),
            vocab AS (SELECT term, count(*)::BIGINT term_total FROM toks GROUP BY 1),
            total AS (SELECT count(*)::BIGINT corpus_total FROM toks),
            scored AS (
              SELECT doc_id,
                     sum(c::DOUBLE * (ln(term_total::DOUBLE)
                         - ln(corpus_total::DOUBLE))) / sum(c) AS alp
              FROM tc JOIN vocab USING (term) CROSS JOIN total
              GROUP BY doc_id),
            cuts AS (
              SELECT quantile_cont(alp, 0.34) c1,
                     quantile_cont(alp, 0.67) c2
              FROM scored)
            SELECT doc_id,
                   CASE WHEN alp <= c1 THEN 'tail'
                        WHEN alp <= c2 THEN 'middle'
                        ELSE 'head' END,
                   alp, c1, c2
            FROM scored CROSS JOIN cuts
        """).fetchall()}
        mismatches = 0
        for d, (alp_s, bucket_s) in rows.items():
            bucket_d, alp_d, c1, c2 = want[d]
            assert math.isclose(alp_s, alp_d, rel_tol=1e-9)
            near_cut = any(
                math.isclose(alp_d, c, rel_tol=1e-9) for c in (c1, c2)
            )
            if not near_cut:
                assert bucket_s == bucket_d, d
            elif bucket_s != bucket_d:
                mismatches += 1
        assert mismatches <= 2  # only interpolated-boundary docs may flip
    finally:
        out.unpersist()


def test_lm_buckets_custom_tiers_and_validation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lm_buckets(docs, {"reject": 10, "keep": 90})
    from collections import Counter

    c = Counter(r.lm_bucket for r in out.collect())
    n = sum(c.values())
    assert abs(c["reject"] / n - 0.10) < 0.06
    assert c["reject"] + c["keep"] == n

    single = lm_buckets(docs, {"all": 100})
    assert single.where("lm_bucket <> 'all'").count() == 0

    with pytest.raises(ValueError, match="sum to 100"):
        lm_buckets(docs, {"a": 50, "b": 30})
    with pytest.raises(ValueError, match="positive"):
        lm_buckets(docs, {"a": 0, "b": 100})
