"""Spark-SQL front-end parity: the engine's tables register as temp
views (session.load_tables), so the same analyses run as `spark.sql`
text. These tests pin that the SQL surface produces IDENTICAL results
to the DataFrame-API plans for representative operators — both compile
to the same Catalyst logical plan space (SURVEY.md §1.3: views let both
APIs express each operator over the same scan)."""

from __future__ import annotations

import pytest

from aws_glue_data_catalog_replication_utility_spark import queries as Q
from aws_glue_data_catalog_replication_utility_spark.session import load_tables

SF = "/root/testdata/sf0.01"

# (registry query, equivalent Spark SQL over the registered views)
CASES = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q04_exists_semi_join": """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    "q07_latest_event_per_user": """
        SELECT user_id, event_id, ts, event_type FROM (
          SELECT user_id, event_id, ts, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    "q25_audit_latest_status": """
        SELECT event_type, COUNT(*) AS n_entities FROM (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
        GROUP BY event_type
    """,
    "q47_stratified_sample": """
        SELECT event_type,
               COUNT(*) AS n_total,
               SUM(CAST(bucket < rate AS INT)) AS n_sampled,
               CAST(SUM(CASE WHEN bucket < rate
                             THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
                 AS sampled_value
        FROM (
          SELECT event_type, value,
                 CAST(conv(substring(md5(concat('smp:',
                      CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)
                   % 100 AS bucket,
                 CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 2
                                 WHEN 'purchase' THEN 50 ELSE 5 END AS rate
          FROM events)
        GROUP BY event_type
    """,
    "q48_sequence_packing": """
        WITH d AS (
          SELECT source, doc_id,
                 size(split(trim(text), '\\\\s+')) AS n_tokens
          FROM documents),
        p AS (
          SELECT source, n_tokens,
                 FLOOR(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 2048) AS bin
          FROM d)
        SELECT source, bin, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
        FROM p GROUP BY source, bin
    """,
    "q49_redaction": """
        SELECT source, COUNT(*) AS n_docs,
               SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS docs_with_hits,
               SUM(n_hits) AS total_hits,
               SUM(len_after) AS total_len_after
        FROM (
          SELECT source,
                 regexp_count(text, '\\\\bcustomer\\\\b') AS n_hits,
                 length(regexp_replace(text, '\\\\bcustomer\\\\b', '[MASKED]'))
                   AS len_after
          FROM documents)
        GROUP BY source
    """,
    "q50_distinctive_terms": """
        WITH toks AS (
          SELECT doc_id,
                 explode(array_distinct(split(trim(text), '\\\\s+'))) AS term
          FROM documents),
        dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
        ranked AS (
          SELECT t.doc_id, t.term, d.df,
                 ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                    ORDER BY d.df, t.term) AS rank
          FROM toks t JOIN dfreq d ON t.term = d.term)
        SELECT doc_id, term, df, rank FROM ranked WHERE rank <= 3
    """,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sql_text_matches_dataframe_plan(spark, name):
    df_result = Q.registry()[name](spark, SF)  # also registers the views
    load_tables(spark, SF)
    sql_result = spark.sql(CASES[name])
    assert sorted(df_result.columns) == sorted(sql_result.columns)
    a = sorted(map(str, df_result.collect()))
    b = sorted(map(str, sql_result.collect()))
    assert a == b
