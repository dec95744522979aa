"""CLI job chain test: plan -> export -> import via the argparse entry
points (cli.py), with parquet-directory interchange — the deploy shape
of the three reference Lambda handlers (SURVEY.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.cli import main
from aws_glue_data_catalog_replication_utility_spark.model import (
    empty_catalog,
    sample_catalog,
)


def test_cli_plan_export_import_chain(spark, tmp_path):
    root = tmp_path
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    src_dbs.write.parquet(str(root / "databases"))
    src_tables.write.parquet(str(root / "tables"))
    src_parts.write.parquet(str(root / "partitions"))
    for name, df in zip(
        ("tgt_databases", "tgt_tables", "tgt_partitions"), empty_catalog(spark)
    ):
        df.write.parquet(str(root / name))

    assert main([
        "plan",
        "--databases", str(root / "databases"),
        "--prefixes", "raw_data_,processed_data_",
        "--batch-id", "b1",
        "--messages-out", str(root / "db_msgs"),
        "--audit-out", str(root / "plan_audit"),
    ]) == 0

    assert main([
        "export",
        "--db-messages", str(root / "db_msgs"),
        "--tables", str(root / "tables"),
        "--partitions", str(root / "partitions"),
        "--batch-id", "b1",
        "--side-channel", str(root / "side"),
        "--messages-out", str(root / "tbl_msgs"),
        "--audit-out", str(root / "export_audit"),
    ]) == 0

    # events = db messages + table messages, as the import job input
    ev = spark.read.parquet(str(root / "db_msgs")).unionByName(
        spark.read.parquet(str(root / "tbl_msgs"))
    )
    ev.write.parquet(str(root / "events"))

    assert main([
        "import",
        "--events", str(root / "events"),
        "--target-databases", str(root / "tgt_databases"),
        "--target-tables", str(root / "tgt_tables"),
        "--target-partitions", str(root / "tgt_partitions"),
        "--side-channel", str(root / "side"),
        "--out-root", str(root / "imported"),
    ]) == 0

    tables = spark.read.parquet(str(root / "imported/tables"))
    parts = spark.read.parquet(str(root / "imported/partitions"))
    audit = spark.read.parquet(str(root / "imported/table_import_audit"))
    assert tables.count() == 10
    assert parts.count() == 2 * (0 + 3 + 10 + 11 + 31)
    assert audit.where(F.col("table_created")).count() == 10


def test_cli_stream_drains_events_dir(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.plans.export import (
        export_catalog,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.planner import (
        plan_replication,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import read_state

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="s1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="s1",
        side_channel_path=side,
    )
    events_dir = str(tmp_path / "events")
    msgs.unionByName(tbl_msgs).write.mode("overwrite").json(events_dir)

    assert main([
        "stream",
        "--events-dir", events_dir,
        "--state-root", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--side-channel", side,
        "--available-now",
    ]) == 0

    dbs, tables, parts = read_state(spark, str(tmp_path / "state"))
    assert {r.name for r in dbs.collect()} == {"raw_data_db0"}
    assert tables.count() == 5
    assert parts.count() == 0 + 3 + 10 + 11 + 31


def test_cli_clean_pipeline(spark, tmp_path):
    """The `clean` job: boilerplate paragraphs removed corpus-wide,
    low-quality docs dropped with named reasons, exact duplicates
    collapsed to the min doc_id — cleaned corpus + audit written."""
    boiler = "subscribe to our newsletter today"
    good = (
        "the cat sat on the mat and it is a fine day for all of us to go"
    )
    docs = spark.createDataFrame(
        [
            (0, f"{good}\n{boiler}", "en"),
            (1, f"{boiler}\n{good}", "en"),   # exact dup of 0 post-clean
            (2, "x y", "en"),                  # too short -> dropped
            (3, f"different words entirely but still the and of it story goes on\n{boiler}", "en"),
            (4, boiler, "en"),                 # only boilerplate -> empty -> dropped
        ],
        "doc_id long, text string, lang string",
    )
    in_path = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(in_path)
    out = str(tmp_path / "cleaned")
    audit_out = str(tmp_path / "audit")

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    # max-df 2: the boilerplate line (in 4 docs) is removed everywhere,
    # while the legitimate paragraph shared by the exact-dup pair (0,1)
    # survives the paragraph stage and collapses at the FINGERPRINT
    # stage instead — the two dedup stages are doing different jobs
    assert cli_main([
        "clean",
        "--documents", in_path,
        "--out", out,
        "--audit-out", audit_out,
        "--paragraph-max-df", "2",
    ]) == 0

    cleaned = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # dup pair (0,1) -> keeper 0; doc 3 survives; 2 and 4 dropped
    assert set(cleaned) == {0, 3}
    assert boiler not in cleaned[0].text and cleaned[0].text == good
    assert cleaned[0].lang == "en"  # extra columns joined back

    audit = {r.doc_id: r for r in spark.read.parquet(audit_out).collect()}
    assert set(audit) == {0, 1, 2, 3, 4}  # one row per INPUT doc
    assert audit[2].passed_quality is False and "too_few_tokens" in audit[2].reasons
    assert audit[4].passed_quality is False
    assert audit[0].passed_quality is True and list(audit[0].reasons) == []
    assert audit[0].n_boilerplate_paragraphs == 1


def test_cli_clean_with_unigram_cut(spark, tmp_path):
    """--min-avg-logprob adds the corpus-statistics (perplexity-style)
    cut: a gibberish doc whose every token is corpus-unique scores far
    below common-vocabulary docs and is dropped with the named reason;
    a permissive threshold changes nothing."""
    common = "the cat sat on the mat and it is a fine day for all of us here"
    # every paragraph distinct (number{i}) so the paragraph-dedup stage
    # keeps all docs and the unigram model trains on real text
    docs = spark.createDataFrame(
        [(i, common + f" number{i}", "en") for i in range(8)]
        + [(8, "zqx wvu tpo nml kji hgf edc baz yxw vut srq pon", "en")],
        "doc_id long, text string, lang string",
    )
    in_path = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(in_path)

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    out, audit_out = str(tmp_path / "c1"), str(tmp_path / "a1")
    assert cli_main([
        "clean", "--documents", in_path, "--out", out,
        "--audit-out", audit_out, "--min-avg-logprob", "-3.2",
    ]) == 0
    audit = {r.doc_id: r for r in spark.read.parquet(audit_out).collect()}
    assert audit[8].passed_quality is False
    assert "low_unigram_logprob" in list(audit[8].reasons)
    kept_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 8 not in kept_ids and len(kept_ids) >= 1

    out2, audit2 = str(tmp_path / "c2"), str(tmp_path / "a2")
    assert cli_main([
        "clean", "--documents", in_path, "--out", out2,
        "--audit-out", audit2, "--min-avg-logprob", "-1000",
    ]) == 0
    base_out, base_audit = str(tmp_path / "c3"), str(tmp_path / "a3")
    assert cli_main([
        "clean", "--documents", in_path, "--out", base_out,
        "--audit-out", base_audit,
    ]) == 0
    assert {tuple(r) for r in spark.read.parquet(out2).collect()} == {
        tuple(r) for r in spark.read.parquet(base_out).collect()
    }


def test_cli_index_and_search(spark, tmp_path):
    """The ANN jobs end to end: build an index from embeddings parquet,
    search it with a query parquet, read ranked neighbors back."""
    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main
    from pyspark.sql import functions as F

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    root = str(tmp_path / "idx")
    assert cli_main([
        "index",
        "--embeddings", emb_path,
        "--index-root", root,
        "--n-clusters", "4",
        "--codebook", "kmeans",
    ]) == 0
    import os
    assert os.path.exists(f"{root}/meta.json")
    assert any(d.startswith("cluster=") for d in os.listdir(f"{root}/vectors"))

    q_path = str(tmp_path / "queries")
    (spark.read.parquet(emb_path).where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .write.mode("overwrite").parquet(q_path))
    out = str(tmp_path / "hits")
    assert cli_main([
        "search",
        "--index-root", root,
        "--queries", q_path,
        "--k", "4",
        "--nprobe", "2",
        "--out", out,
    ]) == 0
    hits = spark.read.parquet(out).collect()
    assert {r.query_id for r in hits} == {0, 1, 2}
    for qid in (0, 1, 2):
        ranks = sorted(r.rank for r in hits if r.query_id == qid)
        assert ranks == [1, 2, 3, 4]


def test_cli_index_append(spark, tmp_path):
    """index-append end to end: build on half the corpus, append the
    rest through the CLI, and search results equal a one-shot build
    (stored-codebook assignment makes the split invisible)."""
    import os

    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        load_ann_meta,
        search_ann_index,
    )

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(emb_path)
    half = str(tmp_path / "half")
    rest = str(tmp_path / "rest")
    emb.where(F.col("vec_id") < 30).write.parquet(half)
    emb.where(F.col("vec_id") >= 30).write.parquet(rest)

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    assert cli_main(["index", "--embeddings", half, "--index-root", inc,
                     "--n-clusters", "4"]) == 0
    assert cli_main(["index-append", "--embeddings", rest,
                     "--index-root", inc]) == 0
    assert cli_main(["index", "--embeddings", emb_path, "--index-root", full,
                     "--n-clusters", "4"]) == 0
    assert load_ann_meta(inc)["version"] == 2
    assert os.path.exists(f"{inc}/vectors")

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, search_ann_index(spark, inc, queries, k=4, nprobe=2).collect()))
    b = sorted(map(tuple, search_ann_index(spark, full, queries, k=4, nprobe=2).collect()))
    assert a == b


def test_cli_index_delete_and_compact(spark, tmp_path):
    """index-delete + index-compact end to end: delete by --ids, verify
    the rows are gone and the version bumped, then compact and check
    full-probe search still returns the surviving neighbors."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        load_ann_meta,
        search_ann_index,
    )

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(emb_path)
    root = str(tmp_path / "idx")
    assert cli_main(["index", "--embeddings", emb_path, "--index-root", root,
                     "--n-clusters", "4"]) == 0
    assert cli_main(["index-delete", "--index-root", root,
                     "--ids", "40,41,42"]) == 0
    assert load_ann_meta(root)["version"] == 2
    left = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    assert left.where(F.col("vec_id").isin(40, 41, 42)).count() == 0

    assert cli_main(["index-compact", "--index-root", root]) == 0
    assert load_ann_meta(root)["version"] == 3
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = search_ann_index(spark, root, queries, k=4, nprobe=4).collect()
    assert {r.query_id for r in hits} == {0, 1, 2}
    assert not {r.vec_id for r in hits} & {40, 41, 42}


def test_bench_compare_sentinel_normalization(tmp_path, capsys):
    """tools/bench_compare: with sentinels on both sides the box drift
    divides out (a uniform 2x slowdown with a 2x sentinel reads as norm
    1.0); without one side's sentinel it falls back to raw ratios."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import bench_compare

    a = {"queries": {"q1": 1.0, "q2": 2.0}, "sentinel": 0.25}
    b = {"queries": {"q1": 2.0, "q2": 4.0}, "sentinel": 0.5}
    pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    with open(pa, "w") as fh:
        json.dump(a, fh)
    with open(pb, "w") as fh:
        json.dump(b, fh)
    sys.argv = ["bench_compare.py", pa, pb]
    assert bench_compare.main() == 0
    out = capsys.readouterr().out
    assert "box drift x2.00" in out
    # every normalized column reads 1.00 (the drift fully explains it)
    for line in out.splitlines():
        if line.startswith(("q1", "q2", "COMMON")):
            assert line.rstrip().endswith("1.00"), line

    with open(pb, "w") as fh:
        json.dump({"queries": b["queries"]}, fh)
    sys.argv = ["bench_compare.py", pa, pb]
    assert bench_compare.main() == 0
    assert "raw ratios only" in capsys.readouterr().out


def test_cli_near_dedup(spark, tmp_path):
    """The fuzzy-dedup job end to end: near-identical docs (one-token
    difference, same under normalize) cluster together and keep the min
    doc_id; unrelated docs survive as their own keepers; the audit maps
    every doc to its cluster."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                      # exact dup of 0
            (2, base.replace("w12", "z")),   # near dup of 0 (most shingles shared)
            (3, "totally different words q r s t u v x y zz aa bb cc"),
        ],
        "doc_id long, text string",
    )
    in_path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(in_path)
    out, audit_out = str(tmp_path / "survivors"), str(tmp_path / "clusters")

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    assert cli_main([
        "near-dedup",
        "--documents", in_path,
        "--out", out,
        "--audit-out", audit_out,
        "--threshold", "0.5",
    ]) == 0
    audit = {r.doc_id: r for r in spark.read.parquet(audit_out).collect()}
    assert audit[0].cluster_id == audit[1].cluster_id == audit[2].cluster_id == 0
    assert audit[3].cluster_id == 3 and audit[3].is_keeper
    assert audit[0].is_keeper and not audit[1].is_keeper
    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {0, 3}


def test_cli_stream_dedup_and_compact(spark, tmp_path):
    """The incremental near-dedup jobs end to end: `stream-dedup
    --available-now` drains the docs dir writing per-batch verdicts
    and the keeper signature store; `dedup-compact` then merges the
    cold store tail without changing a verdict."""
    import json

    t1 = "the quick brown fox jumps over the lazy dog near the river bank"
    t2 = "completely different subject matter about catalog replication pipelines"
    for i, rows in enumerate(([(1, t1)], [(2, t2)], [(10, t1)])):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(str(tmp_path / "docs" / f"f={i}"))

    state = str(tmp_path / "state")
    assert main([
        "stream-dedup",
        "--docs-dir", str(tmp_path / "docs"),
        "--state-root", state,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1",
        "--available-now",
    ]) == 0
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        read_dedup_decisions,
    )

    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert dec[1].keep and dec[2].keep
    assert not dec[10].keep and dec[10].dup_of == 1
    before = sorted(map(tuple, read_dedup_decisions(spark, state).collect()))

    assert main(["dedup-compact", "--state-root", state]) == 0
    import os

    sig_dirs = [
        n for n in os.listdir(f"{state}/signatures") if n.startswith("batch_id=")
    ]
    assert len(sig_dirs) == 2  # batches 0+1 merged, keep_last untouched
    assert sorted(map(tuple, read_dedup_decisions(spark, state).collect())) == before
    assert json.loads(
        open(f"{state}/signatures/batch_id=1/_SUCCESS").read() or "{}"
    ) == {}  # swap completed (consolidated dir committed)


def test_cli_embed_feeds_index_and_search(spark, tmp_path):
    """The no-model text->similarity pipeline end to end: `embed` hashes
    documents into (vec_id, embedding) parquet, `index` builds the
    IVF-PQ index over it, and a full-probe exact-rerank `search` with
    one doc's embedding as the query returns its near-duplicate as the
    top foreign neighbor. The embed output is bit-identical to calling
    hashed_tf_embedding directly."""
    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from pyspark.sql import functions as F

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " phi"),  # near-dup of 0
            (2, "unrelated words entirely different content here now"),
            (3, "another separate document about other things entirely"),
        ],
        "doc_id long, text string",
    )
    docs_path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(docs_path)

    emb_path = str(tmp_path / "emb")
    assert cli_main([
        "embed", "--documents", docs_path, "--out", emb_path, "--dim", "32",
    ]) == 0
    got = {r.vec_id: list(r.embedding)
           for r in spark.read.parquet(emb_path).collect()}
    want = {r.doc_id: list(r.embedding)
            for r in hashed_tf_embedding(docs, dim=32).collect()}
    assert got == want

    root = str(tmp_path / "idx")
    assert cli_main([
        "index", "--embeddings", emb_path, "--index-root", root,
        "--n-clusters", "2", "--pq-m", "4", "--pq-k", "4",
    ]) == 0

    q_path = str(tmp_path / "q")
    (spark.read.parquet(emb_path).where(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .write.mode("overwrite").parquet(q_path))
    out = str(tmp_path / "hits")
    assert cli_main([
        "search", "--index-root", root, "--queries", q_path,
        "--k", "1", "--nprobe", "2", "--rerank-factor", "4",
        "--out", out,
    ]) == 0
    (top,) = spark.read.parquet(out).collect()
    assert top.vec_id == 1  # the near-duplicate, not the unrelated docs


def test_cli_sem_dedup(spark, tmp_path):
    """The batch SemDeDup job end to end: identical embeddings dedup to
    the min id, survivors parquet holds keepers only, the audit maps
    every vector to its verdict."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # append an exact duplicate of vector 10 under a larger id
    dup = emb.where(F.col("vec_id") == 10).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    in_path = str(tmp_path / "emb")
    emb.unionByName(dup).write.mode("overwrite").parquet(in_path)
    out, audit_out = str(tmp_path / "kept"), str(tmp_path / "verdicts")

    assert main([
        "sem-dedup",
        "--embeddings", in_path,
        "--out", out,
        "--audit-out", audit_out,
        "--threshold", "0.99",
        "--n-seeds", "4",
    ]) == 0
    verdicts = {r.vec_id: r for r in spark.read.parquet(audit_out).collect()}
    assert len(verdicts) == emb.count() + 1
    assert not verdicts[10_010].keep and verdicts[10_010].dup_of == 10
    assert verdicts[10].keep
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert 10_010 not in kept and 10 in kept
    assert kept == {v for v, r in verdicts.items() if r.keep}


def test_cli_stream_sem_dedup(spark, tmp_path):
    """The incremental semantic-dedup job end to end via the CLI:
    seed index built with the `index` job from embedded seeds, then
    `stream-sem-dedup --available-now` drains two micro-batches —
    a paraphrase-free dup of a seed doc is flagged, keepers accrete."""
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        verify_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        read_semantic_decisions,
    )

    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    emb_path = str(tmp_path / "seed_emb")
    hashed_tf_embedding(seed_docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).write.parquet(emb_path)
    root = str(tmp_path / "idx")
    assert main([
        "index",
        "--embeddings", emb_path,
        "--index-root", root,
        "--n-clusters", "4", "--pq-m", "4", "--pq-k", "8",
    ]) == 0

    seed3 = "seed document number 3 about topic_3 " * 3
    uniq = "completely different subject matter about replication pipelines"
    for i, rows in enumerate(([(100, seed3)], [(200, uniq), (201, uniq)])):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(str(tmp_path / "docs" / f"f={i}"))

    state = str(tmp_path / "state")
    assert main([
        "stream-sem-dedup",
        "--docs-dir", str(tmp_path / "docs"),
        "--index-root", root,
        "--state-root", state,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--threshold", "0.99",
        "--nprobe", "4",
        "--max-files-per-trigger", "1",
        "--available-now",
    ]) == 0

    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    assert not dec[100].keep and dec[100].dup_of == 3
    assert dec[200].keep
    assert not dec[201].keep and dec[201].dup_of == 200
    verify_ann_index(spark, root)


def test_cli_clean_with_span_dedup(spark, tmp_path):
    """--span-dedup-n adds the cross-document substring cut: a shared
    8-token run embedded mid-paragraph in two otherwise-distinct docs
    (so the paragraph stage cannot see it) is cut from the non-keeper
    occurrence only, and the audit records the removed token count."""
    shared = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (0, f"the cat sat on the mat and it is a fine day {shared} "
                "for all of us here today", "en"),
            (1, f"a dog ran over the hill and it was a good time {shared} "
                "to be out in the sun now", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    in_path = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(in_path)
    out, audit_out = str(tmp_path / "cleaned"), str(tmp_path / "audit")

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    assert cli_main([
        "clean",
        "--documents", in_path,
        "--out", out,
        "--audit-out", audit_out,
        "--span-dedup-n", "6",
    ]) == 0

    cleaned = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(cleaned) == {0, 1}
    assert shared in cleaned[0].text  # keeper occurrence untouched
    assert shared not in cleaned[1].text
    assert "a dog ran over the hill" in cleaned[1].text
    assert "to be out in the sun now" in cleaned[1].text

    audit = {r.doc_id: r for r in spark.read.parquet(audit_out).collect()}
    assert audit[0].n_span_tokens_removed == 0
    assert audit[1].n_span_tokens_removed == 8


def test_cli_bucket_job(spark, tmp_path):
    """The `bucket` job records the bucket spec in the catalog (that
    entry is what makes later joins shuffle-free) and loses no rows."""
    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    src = "/root/testdata/sf0.001/orders.parquet"
    assert cli_main([
        "bucket",
        "--in", src,
        "--table", "cli_orders_bkt",
        "--path", str(tmp_path / "bkt"),
        "--cols", "o_orderkey",
        "--n-buckets", "4",
    ]) == 0
    try:
        t = spark.table("cli_orders_bkt")
        assert t.count() == spark.read.parquet(src).count()
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED cli_orders_bkt").collect()
        }
        assert desc.get("Num Buckets") == "4"
        assert "o_orderkey" in desc.get("Bucket Columns", "")
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_orders_bkt")


def test_cli_compact_job(spark, tmp_path, capsys):
    """The `compact` job bin-packs in place and prints its report."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    store = str(tmp_path / "li")
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartition(16).write.parquet(store)

    assert cli_main([
        "compact", "--path", store, "--target-mb", "1024",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted"]["."][0] == 16
    assert spark.read.parquet(store).count() == src.count()


def test_cli_convert_job(spark, tmp_path, capsys):
    """csv -> parquet with the DLQ lane through the CLI."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,foo\nbad,bar\n2,baz\n")
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")
    assert cli_main([
        "convert",
        "--in", str(src),
        "--out", out,
        "--in-format", "csv",
        "--schema-ddl", "a int, b string",
        "--bad-out", dlq,
        "--header",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"good": 2, "bad": 1}
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == [
        (1, "foo"), (2, "baz"),
    ]


def test_cli_expect_job(spark, tmp_path, capsys):
    """The `expect` job runs a JSON check spec, prints the verdicts,
    writes report + violations, and exits nonzero on failure."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    spec = [
        {"kind": "not_null", "col": "o_custkey"},
        {"kind": "unique", "cols": ["o_orderkey"]},
        {"kind": "in_range", "col": "o_totalprice", "lo": 0, "hi": 1,
         "name": "price_tiny"},  # planted failure
        {"kind": "foreign_key", "col": "o_custkey",
         "ref": "/root/testdata/sf0.001/customer.parquet",
         "ref_col": "c_custkey"},
    ]
    cf = tmp_path / "checks.json"
    cf.write_text(json.dumps(spec))
    rep_out = str(tmp_path / "report")
    vio_out = str(tmp_path / "violations")

    rc = cli_main([
        "expect",
        "--in", "/root/testdata/sf0.001/orders.parquet",
        "--checks", str(cf),
        "--report-out", rep_out,
        "--violations-out", vio_out,
        "--limit-per-check", "5",
    ])
    assert rc == 1  # the planted range check fails
    verdicts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdicts["not_null(o_custkey)"]["passed"] is True
    assert verdicts["unique(o_orderkey)"]["passed"] is True
    assert verdicts["price_tiny"]["passed"] is False
    assert verdicts["foreign_key(o_custkey)"]["passed"] is True

    rep = {r.check: r.passed for r in spark.read.parquet(rep_out).collect()}
    assert rep["price_tiny"] is False
    vio = spark.read.parquet(vio_out)
    assert vio.where("check = 'price_tiny'").count() == 5  # capped
    assert all(r.row.o_totalprice > 1 for r in vio.collect())

    # all-green spec exits 0
    cf.write_text(json.dumps(spec[:2]))
    assert cli_main([
        "expect",
        "--in", "/root/testdata/sf0.001/orders.parquet",
        "--checks", str(cf),
    ]) == 0


def test_cli_delete_job(spark, tmp_path, capsys):
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.repartition(4).write.parquet(store)
    n_del = src.where("o_orderkey % 7 = 0").count()

    assert cli_main([
        "delete", "--path", store, "--where", "o_orderkey % 7 = 0",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_deleted"] == n_del
    assert spark.read.parquet(store).count() == src.count() - n_del


def test_cli_union_job(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    a = tmp_path / "a"
    b = tmp_path / "b"
    spark.createDataFrame([(1, "x")], "id int, name string").write.parquet(str(a))
    spark.createDataFrame([(2**40, 1.5)], "id bigint, score double").write.parquet(str(b))
    out = str(tmp_path / "out")
    assert cli_main(["union", "--in", f"{a},{b}", "--out", out]) == 0
    got = spark.read.parquet(out)
    assert got.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double>"
    )
    assert got.count() == 2


def test_cli_stream_gate_job(spark, tmp_path):
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a"), (2, None)], "id bigint, name string"
    ).coalesce(1).write.parquet(in_dir)
    cf = tmp_path / "checks.json"
    cf.write_text(json.dumps([{"kind": "not_null", "col": "name"}]))
    out_root = str(tmp_path / "gate")

    assert cli_main([
        "stream-gate",
        "--in", in_dir,
        "--schema-ddl", "id bigint, name string",
        "--checks", str(cf),
        "--out-root", out_root,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--available-now",
    ]) == 0
    clean = spark.read.option("basePath", f"{out_root}/clean").parquet(
        f"{out_root}/clean"
    )
    quar = spark.read.option("basePath", f"{out_root}/quarantine").parquet(
        f"{out_root}/quarantine"
    )
    assert [r.id for r in clean.collect()] == [1]
    assert [r.id for r in quar.collect()] == [2]


def test_cli_split_job(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    labels_dir = str(tmp_path / "labels")
    spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "doc_id bigint, label bigint"
    ).write.parquet(labels_dir)
    out = str(tmp_path / "splits")
    assert cli_main([
        "split",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--splits", "train=90,eval=5,test=5",
        "--labels", labels_dir,
    ]) == 0
    got = spark.read.parquet(out)
    docs_n = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert got.count() == docs_n
    by_doc = {r.doc_id: r.split for r in got.collect()}
    assert len({by_doc[i] for i in (0, 1, 2)}) == 1  # one cluster, one split
    assert set(got.select("split").distinct().toPandas()["split"]) <= {
        "train", "eval", "test",
    }


def test_cli_corpus_build_with_dsir(spark, tmp_path, capsys):
    """corpus-build --dsir-target: importance resampling runs after
    near-dedup and before the split — the final corpus holds exactly
    k docs, all of them dedup keepers, spread across the splits."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    docs = "/root/testdata/sf0.001/documents.parquet"
    target = str(tmp_path / "target")
    spark.read.parquet(docs).where("doc_id % 10 = 0").select(
        "doc_id", "text"
    ).write.parquet(target)
    out = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    assert cli_main([
        "corpus-build",
        "--documents", docs,
        "--out", out,
        "--work-dir", work,
        "--splits", "train=90,eval=10",
        "--threshold", "0.7",
        "--dsir-target", target,
        "--dsir-k", "40",
        "--dsir-seed", "cb",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["after_dsir"] == 40
    assert rep["after_near_dedup"] >= 40
    assert sum(rep["splits"].values()) == 40
    final = spark.read.parquet(out)
    assert final.count() == 40
    keepers = {
        r.doc_id
        for r in spark.read.parquet(f"{work}/dedup_audit")
        .where("is_keeper")
        .collect()
    }
    assert {r.doc_id for r in final.collect()} <= keepers


def test_cli_stats_job(spark, tmp_path, capsys):
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.repartition(8).write.parquet(store)
    pf = str(tmp_path / "per_file")
    assert cli_main([
        "stats", "--path", store, "--target-mb", "64",
        "--per-file-out", pf,
    ]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_files"] == 8 and s["total_rows"] == src.count()
    assert "compact" in s["advice"]
    per = spark.read.parquet(pf)
    assert per.select("file").distinct().count() == 8


def test_cli_corpus_build_e2e(spark, tmp_path, capsys):
    """The one-command pipeline: clean -> near-dedup -> leakage-safe
    split; stage counts monotone, audits present, final corpus
    hive-partitioned by split with every doc surviving exactly once."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    out = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    assert cli_main([
        "corpus-build",
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--work-dir", work,
        "--splits", "train=90,eval=10",
        "--threshold", "0.7",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input_docs"] >= rep["after_clean"] >= rep["after_near_dedup"]
    assert rep["after_near_dedup"] > 0
    assert set(rep["splits"]) <= {"train", "eval"}
    assert sum(rep["splits"].values()) == rep["after_near_dedup"]

    final = spark.read.parquet(out)
    assert final.select("doc_id").distinct().count() == final.count()
    # audits exist per stage
    assert spark.read.parquet(f"{work}/clean_audit").count() == rep["input_docs"]
    dedup_audit = spark.read.parquet(f"{work}/dedup_audit")
    assert dedup_audit.count() == rep["after_clean"]
    assert dedup_audit.where("is_keeper").count() == rep["after_near_dedup"]


def test_cli_reduce_job(spark, tmp_path, capsys):
    import json

    from aws_glue_data_catalog_replication_utility_spark.cli import main as cli_main

    out = str(tmp_path / "reduced")
    assert cli_main([
        "reduce",
        "--in", "/root/testdata/sf0.001/embeddings.parquet",
        "--out", out,
        "--k", "8",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rep["explained_variance"]) == 8
    assert 0 < rep["coverage"] <= 1
    red = spark.read.parquet(out)
    src_n = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert red.count() == src_n
    assert len(red.first().embedding) == 8


def test_cli_shuffle_job(spark, tmp_path):
    """`shuffle` materializes the seeded permutation: hive-partitioned
    by shard, assignment identical to the library lane."""
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        shuffle_assignment,
    )

    out = str(tmp_path / "shards")
    assert main([
        "shuffle",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--n-shards", "4",
    ]) == 0

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expect = {
        r.doc_id: r.shard
        for r in shuffle_assignment(docs, "doc_id", 4).collect()
    }
    got = {
        r.doc_id: r.shard
        for r in spark.read.parquet(out).select("doc_id", "shard").collect()
    }
    assert got == expect


def test_cli_skip_index_job(spark, tmp_path, capsys):
    """`skip-index` builds the pruning relation and answers a
    predicate with the kept-file count and pruned-scan rows."""
    import json

    store = str(tmp_path / "orders")
    (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .repartitionByRange(4, "o_orderkey")
        .write.parquet(store)
    )
    assert main([
        "skip-index",
        "--path", store,
        "--out", str(tmp_path / "idx"),
        "--pred", "o_orderkey <= 50",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["files"] == 4 and rep["files_total"] == 4
    assert rep["files_kept"] < 4
    want = (
        spark.read.parquet(store)
        .where("o_orderkey <= 50")
        .count()
    )
    assert rep["rows"] == want


def test_cli_skip_index_bloom(spark, tmp_path, capsys):
    """`skip-index --bloom-cols`: the bloom layer prunes an equality
    probe on a SCATTERED column (min/max alone keeps every file) and
    the pruned-scan row count matches the full filter."""
    import json

    store = str(tmp_path / "orders")
    (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .repartitionByRange(4, "o_orderkey")
        .write.parquet(store)
    )
    # the probe key must not span every file or there is nothing to
    # prune: take the custkey with the smallest file spread (sf0.001's
    # customers each have ~10 orders, so most keys hit all 4 files)
    spread = (
        spark.read.parquet(store)
        .select("o_custkey", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nf"))
        .orderBy("nf", "o_custkey")
        .first()
    )
    probe, n_files_with_key = spread.o_custkey, spread.nf
    assert n_files_with_key < 4, "fixture regression: every key everywhere"
    assert main([
        "skip-index",
        "--path", store,
        "--out", str(tmp_path / "idx"),
        "--bloom-cols", "o_custkey",
        "--bloom-out", str(tmp_path / "bloom"),
        "--pred", f"o_custkey = {probe}",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["bloom_entries"] == 4
    # bloom keeps exactly the files holding the key (FP ~0 at 2^16
    # bits over ~140 values); min/max alone would keep all 4
    assert rep["files_kept"] == n_files_with_key < 4
    want = (
        spark.read.parquet(store)
        .where(f"o_custkey = {probe}")
        .count()
    )
    assert rep["rows"] == want
    # second invocation READS the persisted bloom (no --bloom-cols)
    assert main([
        "skip-index",
        "--path", store,
        "--out", str(tmp_path / "idx2"),
        "--bloom-out", str(tmp_path / "bloom"),
        "--pred", "o_custkey = -1",
    ]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["files_kept"] == 0 and rep2["rows"] == 0


def test_cli_quality_train_and_score(spark, tmp_path, capsys):
    """train -> JSON model -> score: the fastText-filter loop through
    the job surface; keep flags follow the threshold."""
    import json
    import random

    rng = random.Random(7)
    good = "the quick brown fox jumps over the lazy dog".split()
    bad = "zxqv qqwz vvxk jjqp zzrw xkcd qpzm wvxx".split()
    rows = [
        (i, " ".join(rng.choices(good, k=20)), 1) for i in range(60)
    ] + [
        (1000 + i, " ".join(rng.choices(bad, k=20)), 0) for i in range(60)
    ]
    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, label int"
    ).write.parquet(labeled)

    model_path = str(tmp_path / "model.json")
    assert main([
        "quality-train",
        "--in", labeled,
        "--model-out", model_path,
        "--dim", "64",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["auc"] > 0.9

    out = str(tmp_path / "scored")
    assert main([
        "quality-score",
        "--in", labeled,
        "--model", model_path,
        "--out", out,
        "--keep-threshold", "0.5",
    ]) == 0
    scored = spark.read.parquet(out)
    keep = {r.doc_id: r.quality_keep for r in scored.collect()}
    good_kept = sum(1 for i in range(60) if keep[i])
    bad_kept = sum(1 for i in range(60) if keep[1000 + i])
    assert good_kept > 54 and bad_kept < 6


def test_cli_lm_buckets_job(spark, tmp_path):
    """`lm-buckets` writes the corpus hive-partitioned by tier with
    the declared proportions."""
    out = str(tmp_path / "tiers")
    assert main([
        "lm-buckets",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--buckets", "reject=20,keep=80",
    ]) == 0
    got = spark.read.parquet(out)
    n = got.count()
    n_reject = got.where("lm_bucket = 'reject'").count()
    assert n == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert abs(n_reject / n - 0.20) < 0.08


def test_cli_bpe_train_and_encode(spark, tmp_path, capsys):
    """bpe-train -> JSON merge table -> bpe-encode parquet with token
    arrays; encode agrees with the library lane."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.functions.bpe import (
        bpe_encode,
    )

    model_path = str(tmp_path / "bpe.json")
    assert main([
        "bpe-train",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--model-out", model_path,
        "--n-merges", "15",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_merges"] == 15

    out = str(tmp_path / "encoded")
    assert main([
        "bpe-encode",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--model", model_path,
        "--out", out,
    ]) == 0
    with open(model_path) as fh:
        model = json.load(fh)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(docs, model).collect()
    }
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in spark.read.parquet(out).collect()
    }
    assert got == want


def test_cli_report_and_mix_jobs(spark, tmp_path, capsys):
    """`report` prints the dataset card; `mix` writes the
    temperature-scaled corpus."""
    import json

    assert main([
        "report",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "card.json"),
    ]) == 0
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert card["n_docs"] == n
    assert card["axes"]["source"]
    with open(tmp_path / "card.json") as fh:
        assert json.load(fh) == card

    out = str(tmp_path / "mixed")
    assert main([
        "mix",
        "--in", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--alpha", "0.5",
    ]) == 0
    mixed = spark.read.parquet(out)
    assert 0 < mixed.count() <= n
    assert "rate_pct" in mixed.columns


def test_cli_skip_index_update(spark, tmp_path, capsys):
    """`skip-index --update` refreshes in place: footer pass over new
    files only, JSON reports the diff."""
    import json

    store = str(tmp_path / "orders")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.where("o_orderkey % 2 = 0").repartitionByRange(
        2, "o_orderkey"
    ).write.parquet(store)
    idx = str(tmp_path / "idx")
    assert main(["skip-index", "--path", store, "--out", idx]) == 0
    capsys.readouterr()

    orders.where("o_orderkey % 2 = 1").repartitionByRange(
        2, "o_orderkey"
    ).write.mode("append").parquet(store)
    assert main([
        "skip-index", "--path", store, "--out", idx, "--update",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["files"] == 4
    assert rep["update"] == {"added": 2, "removed": 0, "kept": 2}


def test_cli_vstore_lifecycle(spark, tmp_path, capsys):
    """append -> delete -> time-travel read -> rollback -> vacuum
    through the job surface."""
    import json

    root = str(tmp_path / "vt")
    src = "/root/testdata/sf0.001/orders.parquet"
    n = spark.read.parquet(src).count()

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert run(["vstore", "--root", root, "--op", "append",
                "--in", src]) == {"version": 1, "action": "append"}
    rep = run(["vstore", "--root", root, "--op", "delete",
               "--where", "o_custkey % 5 = 0"])
    assert rep == {"version": 2, "action": "delete", "mode": "rewrite"}
    n2 = run(["vstore", "--root", root, "--op", "read"])["rows"]
    assert n2 < n
    assert run(["vstore", "--root", root, "--op", "read",
                "--version", "1"])["rows"] == n
    assert run(["vstore", "--root", root, "--op", "rollback",
                "--version", "1"]) == {"version": 3, "action": "rollback"}
    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == n
    hist = run(["vstore", "--root", root, "--op", "history"])
    assert [h["action"] for h in hist] == ["append", "delete", "rollback"]
    run(["vstore", "--root", root, "--op", "vacuum", "--keep-last", "1",
         "--retention-seconds", "0"])
    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == n
    # metadata-only COUNT: exact, zero files opened
    cnt = run(["vstore", "--root", root, "--op", "count"])
    assert cnt["rows"] == n and cnt["files_scanned"] == 0
    # TIMESTAMP AS OF through the job surface: "now" resolves to head
    import time as _time

    assert run(["vstore", "--root", root, "--op", "read",
                "--timestamp", str(_time.time())])["rows"] == n
    # predicate COUNT (r10): served through the LOG-sourced snapshot
    # skip index — exact vs a full-scan twin
    want = spark.read.parquet(src).where("o_orderkey <= 1000").count()
    cp = run(["vstore", "--root", root, "--op", "count",
              "--pred", "o_orderkey <= 1000"])
    assert cp["rows"] == want


def test_cli_vstore_replace_where(spark, tmp_path, capsys):
    """Delta's replaceWhere through the job surface: the predicate
    region swapped for --in as one atomic version."""
    import json

    root = str(tmp_path / "vt")
    src = "/root/testdata/sf0.001/orders.parquet"
    repl = str(tmp_path / "repl")
    spark.read.parquet(src).where("o_custkey < 50").withColumn(
        "o_totalprice", F.lit(0.0)
    ).write.parquet(repl)

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    assert run(["vstore", "--root", root, "--op", "replace-where",
                "--in", repl, "--where", "o_custkey < 50"]) == {
        "version": 2, "action": "replace_where"}
    got = run(["vstore", "--root", root, "--op", "read"])["rows"]
    assert got == spark.read.parquet(src).count()
    # the region really was swapped: re-running is idempotent content
    hist = run(["vstore", "--root", root, "--op", "history"])
    assert [h["action"] for h in hist] == ["append", "replace_where"]


def test_cli_vstore_merge(spark, tmp_path, capsys):
    import json

    root = str(tmp_path / "vt")
    src = "/root/testdata/sf0.001/orders.parquet"
    upd = str(tmp_path / "upd")
    spark.read.parquet(src).limit(10).withColumn(
        "o_totalprice", F.lit(1.0)
    ).write.parquet(upd)

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    assert run(["vstore", "--root", root, "--op", "merge",
                "--in", upd, "--keys", "o_orderkey"]) == {
        "version": 2, "action": "merge"}
    n = spark.read.parquet(src).count()
    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == n


def test_cli_vstore_optimize_and_checkpoint(spark, tmp_path, capsys):
    import json

    root = str(tmp_path / "vt")
    src = "/root/testdata/sf0.001/orders.parquet"

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    n = run(["vstore", "--root", root, "--op", "read"])["rows"]
    assert run(["vstore", "--root", root, "--op", "optimize",
                "--target-mb", "1024"]) == {"version": 2, "action": "optimize"}
    rep = run(["vstore", "--root", root, "--op", "checkpoint"])
    assert rep["version"] == 2 and rep["created"]
    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == n


def test_cli_corpus_build_with_mix_and_shards(spark, tmp_path, capsys):
    """The full training-corpus construction: clean -> near-dedup ->
    split -> temperature-mix (train only) -> seeded shuffle shards;
    eval split untouched by mix/shard stages."""
    import glob as g
    import json

    out = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    assert main([
        "corpus-build",
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--work-dir", work,
        "--splits", "train=90,eval=10",
        "--threshold", "0.7",
        "--mix-alpha", "0.5",
        "--shuffle-shards", "4",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < rep["after_mix"] <= rep["splits"]["train"]
    assert rep["shards"] == {"shards": 4, "rows": rep["after_mix"]}

    shards = spark.read.parquet(out + "_shards")
    assert shards.count() == rep["after_mix"]
    assert len(g.glob(out + "_shards/shard=*")) == 4
    # eval split stays in the un-mixed corpus output
    final = spark.read.parquet(out)
    assert final.where("split = 'eval'").count() == rep["splits"]["eval"]


def test_cli_prepare_examples(spark, tmp_path, capsys):
    """bpe-train -> prepare-examples: fixed-length token examples,
    lossless token count, hive-partitioned by shard."""
    import json

    src = "/root/testdata/sf0.001/documents.parquet"
    model_path = str(tmp_path / "bpe.json")
    assert main([
        "bpe-train", "--in", src, "--model-out", model_path,
        "--n-merges", "8",
    ]) == 0
    capsys.readouterr()

    out = str(tmp_path / "examples")
    assert main([
        "prepare-examples",
        "--in", src,
        "--model", model_path,
        "--out", out,
        "--window", "128",
        "--n-shards", "4",
    ]) == 0
    ex = spark.read.parquet(out)
    assert ex.where("n_tokens > 128").count() == 0
    assert ex.where("n_tokens = 128").count() > 0

    # lossless: total packed tokens == total encoded tokens
    from aws_glue_data_catalog_replication_utility_spark.functions.bpe import (
        bpe_encode,
    )

    with open(model_path) as fh:
        model = json.load(fh)
    total = (
        bpe_encode(spark.read.parquet(src), model)
        .agg(F.sum("bpe_token_count"))
        .collect()[0][0]
    )
    assert ex.agg(F.sum("n_tokens")).collect()[0][0] == total


def test_cli_vstore_read_with_pred_prunes(spark, tmp_path, capsys):
    """`vstore --op read --pred`: the snapshot skip index prunes live
    files before the scan; rows equal the plain filtered read."""
    import json

    root = str(tmp_path / "vt")
    src = str(tmp_path / "src")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.repartitionByRange(4, "o_orderkey").write.parquet(src)

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    keys = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    cut = keys[len(keys) // 4]
    rep = run(["vstore", "--root", root, "--op", "read",
               "--pred", f"o_orderkey <= {cut}"])
    assert rep["rows"] == orders.where(f"o_orderkey <= {cut}").count()
    assert 0 < rep["files_kept"] < rep["files_total"] == 4


def test_cli_vstore_stream(spark, tmp_path, capsys):
    """`vstore-stream`: two source files -> two atomic versions;
    re-running with the same checkpoint appends nothing new."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(
        [(i, f"a{i}") for i in range(5)], "k long, v string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(5 + i, f"b{i}") for i in range(3)], "k long, v string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    argv = [
        "vstore-stream",
        "--in", str(src) + "/*/",
        "--root", root,
        "--checkpoint", ckpt,
        "--schema", "k long, v string",
        "--max-files-per-trigger", "1",
    ]
    assert main(argv) == 0
    capsys.readouterr()

    def run(a):
        assert main(a) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == 8
    hist = run(["vstore", "--root", root, "--op", "history"])
    assert [h["action"] for h in hist] == ["append", "append"]

    # replay: same checkpoint, no new input -> no new versions
    assert main(argv) == 0
    capsys.readouterr()
    assert len(run(["vstore", "--root", root, "--op", "history"])) == 2


def test_cli_skip_index_bloom_update_and_missing(spark, tmp_path, capsys):
    """ADVICE r08 (low): --bloom-out always loads the persisted bloom
    when the directory exists — refreshed first under --update — and
    naming a missing index errors instead of silently scanning without
    bloom pruning."""
    import json

    import pytest as _pytest

    store = str(tmp_path / "orders")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.where("o_orderkey % 2 = 0").repartitionByRange(
        2, "o_orderkey"
    ).write.parquet(store)
    idx = str(tmp_path / "idx")
    bloom = str(tmp_path / "bloom")
    assert main([
        "skip-index", "--path", store, "--out", idx,
        "--bloom-cols", "o_custkey", "--bloom-out", bloom,
    ]) == 0
    capsys.readouterr()

    orders.where("o_orderkey % 2 = 1").repartitionByRange(
        2, "o_orderkey"
    ).write.mode("append").parquet(store)
    # --update with --bloom-out: BOTH indexes refresh in place and the
    # probe answers through the refreshed bloom
    probe = orders.select("o_custkey").first().o_custkey
    assert main([
        "skip-index", "--path", store, "--out", idx, "--update",
        "--bloom-out", bloom, "--pred", f"o_custkey = {probe}",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["update"] == {"added": 2, "removed": 0, "kept": 2}
    assert rep["bloom_update"] == {"added": 2, "removed": 0, "kept": 2}
    want = spark.read.parquet(store).where(f"o_custkey = {probe}").count()
    assert rep["rows"] == want

    # a missing persisted bloom is an ERROR, never a silent no-bloom
    # scan — under --update and without
    for argv in (
        ["skip-index", "--path", store, "--out", idx, "--update",
         "--bloom-out", str(tmp_path / "nope")],
        ["skip-index", "--path", store, "--out", str(tmp_path / "idx3"),
         "--bloom-out", str(tmp_path / "nope")],
    ):
        with _pytest.raises(SystemExit, match="does not exist"):
            main(argv)


def test_cli_skip_index_join_keys(spark, tmp_path, capsys):
    """`skip-index --join-keys`: runtime-filter file skipping through
    the job surface — the join over the pruned file set matches the
    full join, the file info reports real pruning, and asking for it
    without a bloom index errors."""
    import json

    import pytest as _pytest

    store = str(tmp_path / "orders")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.repartitionByRange(4, "o_orderkey").write.parquet(store)
    spread = (
        spark.read.parquet(store)
        .select("o_custkey", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nf"))
        .orderBy("nf", "o_custkey")
        .first()
    )
    keys_path = str(tmp_path / "keys")
    spark.createDataFrame(
        [(int(spread.o_custkey),), (-4,)], "o_custkey long"
    ).write.parquet(keys_path)

    assert main([
        "skip-index", "--path", store,
        "--out", str(tmp_path / "idx"),
        "--bloom-cols", "o_custkey",
        "--bloom-out", str(tmp_path / "bloom"),
        "--join-keys", keys_path,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = (
        spark.read.parquet(store)
        .where(F.col("o_custkey") == int(spread.o_custkey))
        .count()
    )
    assert rep["join"]["rows"] == want
    assert spread.nf <= rep["join"]["files_kept"] < 4

    with _pytest.raises(SystemExit, match="bloom"):
        main([
            "skip-index", "--path", store,
            "--out", str(tmp_path / "idx2"),
            "--join-keys", keys_path,
        ])

    # composite key through the same surface (--join-col "a,b"): the
    # tuple prover joins on BOTH columns and matches the full join
    pair = (
        spark.read.parquet(store)
        .select("o_custkey", "o_orderpriority")
        .first()
    )
    keys2 = str(tmp_path / "keys2")
    spark.createDataFrame(
        [(int(pair.o_custkey), pair.o_orderpriority), (-4, "NOPE")],
        "o_custkey long, o_orderpriority string",
    ).write.parquet(keys2)
    assert main([
        "skip-index", "--path", store,
        "--out", str(tmp_path / "idxc"),
        "--bloom-cols", "o_custkey,o_orderpriority",
        "--bloom-out", str(tmp_path / "bloomc"),
        "--join-keys", keys2,
        "--join-col", "o_custkey,o_orderpriority",
    ]) == 0
    repc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    wantc = (
        spark.read.parquet(store)
        .where(
            (F.col("o_custkey") == int(pair.o_custkey))
            & (F.col("o_orderpriority") == pair.o_orderpriority)
        )
        .count()
    )
    assert repc["join"]["rows"] == wantc
    assert repc["join"]["files_kept"] <= 4


def test_cli_pred_int_literal_on_double_column_bloom(spark, tmp_path, capsys):
    """The ADVICE r08 high scenario verbatim: `--pred price = 100`
    parses the literal as int while the double column's values read
    back as floats — the canonical value hashing must keep the files
    holding 100.0 (the old str(value) hashing pruned them, silently
    returning zero rows)."""
    import json

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(i, 100.0 if i % 3 == 0 else float(i)) for i in range(60)],
        "id int, price double",
    ).repartition(4, "id").write.parquet(store)
    want = spark.read.parquet(store).where("price = 100").count()
    assert want > 0
    assert main([
        "skip-index", "--path", store,
        "--out", str(tmp_path / "idx"),
        "--bloom-cols", "price",
        "--pred", "price = 100",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == want
    assert rep["files_kept"] >= 1


def test_cli_pred_in_list(spark, tmp_path, capsys):
    """--pred 'col in v1,v2' through read and count: exact rows, and
    the skip index prunes to the value-bearing files."""
    import json

    root = str(tmp_path / "vt")
    src = "/root/testdata/sf0.001/orders.parquet"

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    keys = [
        r.o_orderkey
        for r in spark.read.parquet(src).select("o_orderkey").limit(2).collect()
    ]
    want = (
        spark.read.parquet(src)
        .where(F.col("o_orderkey").isin(keys))
        .count()
    )
    pred = f"o_orderkey in {keys[0]},{keys[1]}"
    assert run(["vstore", "--root", root, "--op", "read",
                "--pred", pred])["rows"] == want
    cnt = run(["vstore", "--root", root, "--op", "count", "--pred", pred])
    assert cnt["rows"] == want


def test_cli_join_keys_tuple_prover_drops_cross_matched_file(
    spark, tmp_path, capsys
):
    """The composite-key pruning-POWER pin through the CLI (VERDICT
    r10 #6): a file holding a=1-with-b=10 under probes (1,20),(2,10)
    survives PER-COLUMN pruning (its a-values and b-values each
    overlap the probe sets) but every probe TUPLE is refuted there —
    the tuple prover must drop BOTH such cross-matched files, so the
    CLI reports zero files kept and a zero-row join."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        bloom_dropped_files_for_join,
    )

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, 10)] * 50, "a long, b long"
    ).coalesce(1).write.mode("append").parquet(store)
    spark.createDataFrame(
        [(2, 20)] * 50, "a long, b long"
    ).coalesce(1).write.mode("append").parquet(store)
    keys = str(tmp_path / "keys")
    spark.createDataFrame(
        [(1, 20), (2, 10)], "a long, b long"
    ).write.parquet(keys)

    assert main([
        "skip-index", "--path", store,
        "--out", str(tmp_path / "idx"),
        "--bloom-cols", "a,b",
        "--bloom-out", str(tmp_path / "bloom"),
        "--join-keys", keys,
        "--join-col", "a,b",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["join"]["files_total"] == 2
    assert rep["join"]["files_kept"] == 0  # tuple prover: both refuted
    assert rep["join"]["rows"] == 0
    # the contrast that makes this a POWER pin, not a safety pin:
    # per-column pruning keeps both files (each column's values
    # overlap the probe sets), so AND-across-columns is what pruned
    bloom = spark.read.parquet(str(tmp_path / "bloom"))
    probes = spark.read.parquet(keys)
    for col in ("a", "b"):
        assert bloom_dropped_files_for_join(
            bloom, col, probes, value_col=col
        ).count() == 0


def test_cli_vstore_delete_mode_dv(spark, tmp_path, capsys):
    """`vstore --op delete --delete-mode dv`: the merge-on-read delete
    through the job surface — no data file rewritten, reads masked."""
    import json

    root = str(tmp_path / "t")
    spark.range(0, 100).selectExpr("id as k").write.parquet(
        str(tmp_path / "in")
    )
    assert main([
        "vstore", "--root", root, "--op", "append",
        "--in", str(tmp_path / "in"),
    ]) == 0
    capsys.readouterr()
    from aws_glue_data_catalog_replication_utility_spark import versioned as V

    live_before, _ = V._replay(root, None)
    assert main([
        "vstore", "--root", root, "--op", "delete",
        "--where", "k % 10 = 0", "--delete-mode", "dv",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"version": 2, "action": "delete", "mode": "dv"}
    assert V._replay(root, None)[0] == live_before  # nothing rewritten
    assert V.read_versioned(spark, root).count() == 90
    assert main(["vstore", "--root", root, "--op", "detail"]) == 0
    detail = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert detail["num_deletion_vectors"] == 1
    assert detail["dv_deleted_rows"] == 10
    assert detail["num_rows"] == 90


def test_cli_vstore_partitioned(spark, tmp_path, capsys):
    """--partition-by through the job surface: partitioned append,
    metadata-only partition delete, detail reports the layout."""
    import json

    root = str(tmp_path / "pt")
    spark.range(0, 120).selectExpr(
        "id", "cast(id % 3 as int) as b"
    ).write.parquet(str(tmp_path / "in"))

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert run(["vstore", "--root", root, "--op", "append",
                "--in", str(tmp_path / "in"),
                "--partition-by", "b"])["version"] == 1
    from aws_glue_data_catalog_replication_utility_spark import versioned as V

    assert V.table_partitioning(root) == ["b"]
    rep = run(["vstore", "--root", root, "--op", "delete",
               "--where", "b = 1"])
    assert rep["version"] == 2
    m = V.history(root)[-1]
    assert m["action"] == "delete"
    assert run(["vstore", "--root", root, "--op", "read"])["rows"] == 80
    detail = run(["vstore", "--root", root, "--op", "detail"])
    assert detail["partitioning"] == ["b"]
    assert detail["num_partitions"] == 2


def test_cli_token_shards(spark, tmp_path, capsys):
    """BPE-encode then binary-shard through the job surface: the
    trainer-facing tail of the pipeline."""
    import json

    from aws_glue_data_catalog_replication_utility_spark.functions.tokenshards import (
        read_token_shard,
    )

    src = str(tmp_path / "in")
    spark.range(0, 50).selectExpr(
        "id as doc_id",
        "transform(sequence(0, cast(id % 5 as int)), "
        "i -> cast(pmod(id * 31 + i, 500) as int)) as tokens",
    ).write.parquet(src)
    out = str(tmp_path / "shards")
    assert main([
        "token-shards", "--in", src, "--out", out, "--n-shards", "2",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs"] == 50 and rep["dtype"] == "uint16"
    total = 0
    import os as _os

    for s in rep["shards"]:
        seqs, dtype, _ = read_token_shard(
            _os.path.join(out, f"shard-{s['shard']:05d}")
        )
        total += sum(len(q) for q in seqs)
    assert total == rep["tokens"]
