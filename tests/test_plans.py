"""Physical-plan anti-pattern gate over the query registry (the
`.explain` discipline as an executable test): no CartesianProduct
anywhere, and BroadcastNestedLoopJoin only where a tiny broadcast side
is the declared design."""

from __future__ import annotations

import pytest

from aws_glue_data_catalog_replication_utility_spark import queries as Q

# BNLJ is acceptable ONLY with a config-sized broadcast side:
#   q21 exact cosine top-k  — broadcast 5-query set, != join (baseline)
#   q29 exact cosine pairs  — id_a < id_b theta join (quadratic oracle
#                             baseline; the production lane is sign-LSH)
#   q33 IVF quantizer       — broadcast 8-centroid crossJoin + the q21
#                             baseline it is scored against
#   q60 IVF+ADC recall      — embeds the q21 exact baseline as its
#                             ground truth (the ADC/IVF lanes themselves
#                             are map-side + windows, no BNLJ)
ALLOWED_BNLJ = {
    "q21_cosine_topk",
    "q29_embedding_near_dup",
    "q33_ivf_topk_recall",
    "q60_ivf_adc_recall",
}

# pipeline fixtures build their own side channels and run minutes of
# setup; their import plan is audited separately (SURVEY §7: hash/SMJ/
# window only) and exercised by the e2e + property suites
SKIP = {"q34_replication_roundtrip", "q46_failure_audit"}


@pytest.mark.parametrize("name", sorted(n for n in Q.registry() if n not in SKIP))
def test_no_plan_antipatterns(spark, name):
    df = Q.registry()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
    if name not in ALLOWED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} has an undeclared BroadcastNestedLoopJoin"
        )


def test_ivf_cluster_layout_prunes_partitions(spark, tmp_path):
    """The IVF story's storage half: clusters written as partition
    directories make nprobe=1 search a DIRECTORY prune, not a scan —
    the plan must show a PartitionFilters entry on `cluster` and read
    only that cluster's files."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_assignments,
    )
    from aws_glue_data_catalog_replication_utility_spark.session import load_tables
    from pyspark.sql import functions as F

    emb = load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])["embeddings"]
    assign = ivf_assignments(emb, n_seeds=4)
    root = str(tmp_path / "ivf")
    emb.join(assign, on="vec_id").write.partitionBy("cluster").parquet(root)

    full = spark.read.parquet(root)
    probe = full.where(F.col("cluster") == 1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the cluster predicate is a partition filter (directory prune), not
    # a data filter evaluated per row
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # pruned read returns exactly the pre-write source's cluster-1 rows
    expected = emb.join(assign, on="vec_id").where(F.col("cluster") == 1).count()
    assert probe.count() == expected > 0


def test_contamination_plan_is_equijoin_with_broadcast_sizes(spark):
    """The contamination screen must meet in a shingle EQUI-join (never
    a doc x eval cross product) and broadcast the benchmark-sized eval
    aggregate."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        contamination_pairs,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    plan = (
        contamination_pairs(docs, eval_docs, n=5, min_containment=0.3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # eval sizes broadcast


def test_dedup_paragraphs_plan_broadcasts_hot_set(spark):
    """Paragraph dedup's anti join must broadcast the small hot-hash
    side — a shuffled anti join of the full corpus against boilerplate
    would be the 100 TB mistake."""
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        dedup_paragraphs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        dedup_paragraphs(docs, max_df=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    )


def test_r07_operators_plan_shapes(spark):
    """Shuffle-count gates for the round-7 operators: the shuffle
    assignment is NARROW (no Exchange — the one shuffle lives in the
    writer), classifier scoring adds NO exchange beyond the embedding
    pipeline's own two, and lm_buckets' cutoff join is a broadcast,
    never a shuffle of the corpus."""
    from aws_glue_data_catalog_replication_utility_spark.functions.classifier import (
        score_quality,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        shuffle_assignment,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        lm_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def n_exchanges(df):
        p = plan(df)
        return sum(
            line.lstrip("+-: *(1234567890)").startswith("Exchange")
            for line in p.splitlines()
        )

    assert n_exchanges(shuffle_assignment(docs, "doc_id", 64)) == 0

    base = n_exchanges(hashed_tf_embedding(docs, dim=32))
    model = {
        "dim": 32, "normalize": False,
        "weights": [0.1] * 32, "bias": 0.0,
    }
    assert n_exchanges(score_quality(docs, model)) == base

    p = plan(lm_buckets(docs))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_q37_size_adaptive_shingle_persist(spark, monkeypatch):
    """r13 (VERDICT r12 #3): q37 leaves the shingle relation unpersisted
    while the towers broadcast-pipeline (measured faster at sf0.1) but
    materializes it once the document input clears
    SPARK_GRAFT_SHINGLE_PERSIST_BYTES — the persisted plan must collapse
    the ~6 recomputed scan->shingle MapInArrow towers to <=2, and the
    result must be byte-identical either way."""
    sf = "/root/testdata/sf0.01"
    fn = Q.registry()["q37_jaccard_df_pruned"]

    import re

    def towers(df):
        """DISTINCT MapInArrow operator ids = towers that actually
        execute. The persisted form still PRINTS the cached tower once
        per InMemoryRelation reference, but every occurrence carries
        the same operator id — one execution."""
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return len(set(re.findall(r"MapInArrow \((\d+)\)", plan)))

    df_lazy = fn(spark, sf)
    n_lazy = towers(df_lazy)
    lazy_rows = {tuple(r) for r in df_lazy.collect()}

    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_PERSIST_BYTES", "0")
    df_pers = fn(spark, sf)
    n_pers = towers(df_pers)
    assert df_pers.sparkSession is spark
    pers_rows = {tuple(r) for r in df_pers.collect()}

    assert n_lazy > 2, n_lazy  # the pipelined form really inlines towers
    assert n_pers <= 2, n_pers
    assert lazy_rows == pers_rows
