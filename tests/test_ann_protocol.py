"""ANN index maintenance commit protocol (VERDICT r09 #2/#7).

The failure modes these pin, in reference terms: the same
create/delete maintenance surface the catalog store protects with
conditional writes (GlueUtil.java:397-451,489-543; DDBUtil.java:227-244)
— a crash inside compact's directory swap must leave a RECOVERABLE
index (not a missing `vectors/`), and an append racing a compact must
either land or raise, never vanish with the pre-compact layout.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions import (
    ann_index as A,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _build(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "idx")
    A.build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, root, queries


def _full_probe(spark, root, queries):
    return sorted(
        map(
            tuple,
            A.search_ann_index(spark, root, queries, k=5, nprobe=4).collect(),
        )
    )


def _crash_compact(spark, root, monkeypatch, rename_calls_before_crash: int):
    """Run compact with os.rename killed after N successful calls."""
    real_rename = os.rename
    state = {"n": 0}

    def dying_rename(src, dst):
        if state["n"] >= rename_calls_before_crash:
            raise OSError("injected crash (kill -9 stand-in)")
        state["n"] += 1
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", dying_rename)
    with pytest.raises(OSError, match="injected"):
        A.compact_ann_index(spark, root, n_iters=1)
    monkeypatch.setattr(os, "rename", real_rename)


def _assert_blocked(spark, emb, root):
    """Every mutation + verify refuses over the pending manifest and
    names the resume path."""
    with pytest.raises(RuntimeError, match="recover_ann_index"):
        A.append_to_ann_index(
            spark, emb.withColumn("vec_id", F.col("vec_id") + 100000), root
        )
    with pytest.raises(RuntimeError, match="recover_ann_index"):
        A.delete_from_ann_index(spark, root, [0])
    with pytest.raises(RuntimeError, match="recover_ann_index"):
        A.compact_ann_index(spark, root)
    with pytest.raises(ValueError, match="recover_ann_index"):
        A.verify_ann_index(spark, root)


def test_crash_between_renames_rolls_forward(spark, tmp_path, monkeypatch):
    """The r09 gap: a kill between rename(vectors->old) and
    rename(tmp->vectors) left NO vectors/ dir at all. Now the pending
    manifest makes the state decidable, every mutation refuses to touch
    it, and recovery rolls FORWARD (tmp is complete by construction) to
    the exact post-compact state — full-probe search is bit-identical
    to the pre-compact index, the compaction invariant."""
    emb, root, queries = _build(spark, tmp_path)
    before = _full_probe(spark, root, queries)

    _crash_compact(spark, root, monkeypatch, rename_calls_before_crash=1)
    assert not os.path.isdir(f"{root}/vectors")  # the torn window is real
    assert os.path.exists(f"{root}/{A._PENDING}")
    _assert_blocked(spark, emb, root)

    rec = A.recover_ann_index(root)
    assert rec["recovered"] is True and rec["meta_version"] == 2
    meta = A.load_ann_meta(root)
    assert meta["codebook_source"] == "compacted"
    A.verify_ann_index(spark, root)
    assert _full_probe(spark, root, queries) == before
    # no debris left behind
    for name in (A._PENDING, A._OLD_DIR, A._TMP_DIR):
        assert not os.path.exists(f"{root}/{name}")
    # idempotent re-run is a no-op sweep
    assert A.recover_ann_index(root)["recovered"] is False


def test_crash_before_first_rename_rolls_back(spark, tmp_path, monkeypatch):
    """A kill after the pending manifest but before any rename: the
    live layout and meta were never touched — recovery rolls BACK
    (drops tmp) and the original version-1 index keeps serving."""
    emb, root, queries = _build(spark, tmp_path)
    before = _full_probe(spark, root, queries)

    _crash_compact(spark, root, monkeypatch, rename_calls_before_crash=0)
    assert os.path.isdir(f"{root}/vectors")
    assert os.path.isdir(f"{root}/{A._TMP_DIR}")
    _assert_blocked(spark, emb, root)

    rec = A.recover_ann_index(root)
    assert rec["recovered"] is True and rec["meta_version"] == 1
    assert A.load_ann_meta(root)["codebook_source"] != "compacted"
    A.verify_ann_index(spark, root)
    assert _full_probe(spark, root, queries) == before
    # the rolled-back index still compacts cleanly afterwards
    assert A.compact_ann_index(spark, root)["meta_version"] == 2


def test_crash_after_swap_before_meta_commit(spark, tmp_path, monkeypatch):
    """A kill after both renames but before the meta write: the new
    layout is live but meta still carries the old centroids — recovery
    finishes the commit from the pending manifest (meta write is the
    recorded intent) and sweeps vectors__old."""
    emb, root, queries = _build(spark, tmp_path)
    before = _full_probe(spark, root, queries)

    real_write = A._write_meta

    def dying_write(r, m):
        raise OSError("injected crash before meta commit")

    monkeypatch.setattr(A, "_write_meta", dying_write)
    with pytest.raises(OSError, match="injected"):
        A.compact_ann_index(spark, root, n_iters=1)
    monkeypatch.setattr(A, "_write_meta", real_write)

    assert os.path.isdir(f"{root}/vectors")
    assert os.path.isdir(f"{root}/{A._OLD_DIR}")  # VERDICT r09 #7 debris
    assert A.load_ann_meta(root)["version"] == 1  # meta not yet committed
    _assert_blocked(spark, emb, root)

    rec = A.recover_ann_index(root)
    assert rec["recovered"] is True and rec["meta_version"] == 2
    assert A.load_ann_meta(root)["codebook_source"] == "compacted"
    assert not os.path.isdir(f"{root}/{A._OLD_DIR}")
    A.verify_ann_index(spark, root)
    assert _full_probe(spark, root, queries) == before


def test_append_racing_compact_aborts_compact_never_loses_append(
    spark, tmp_path, monkeypatch
):
    """The shipped-jobs race (cron'd `index-compact` + live embed
    stream): an append landing between compact's layout snapshot and
    its swap used to be silently replaced by the pre-append layout.
    Now the swap re-checks the meta version under the lock — the
    append WINS, the compact aborts with a clean retry error, and the
    re-run compact carries the appended rows."""
    emb, root, queries = _build(spark, tmp_path)
    new_rows = emb.limit(7).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    new_ids = {r.vec_id for r in new_rows.select("vec_id").collect()}

    def racing_append():
        A.append_to_ann_index(spark, new_rows, root)

    monkeypatch.setattr(A, "_before_compact_commit_hook", racing_append)
    with pytest.raises(RuntimeError, match="mutated during compaction"):
        A.compact_ann_index(spark, root, n_iters=1)
    monkeypatch.setattr(A, "_before_compact_commit_hook", None)

    # the append landed and the index is clean (no pending/tmp debris)
    A.verify_ann_index(spark, root)
    stored = {
        r.vec_id
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .select("vec_id")
        .collect()
    }
    assert new_ids <= stored
    for name in (A._PENDING, A._TMP_DIR):
        assert not os.path.exists(f"{root}/{name}")

    # the documented retry: a re-run compact succeeds and keeps them
    res = A.compact_ann_index(spark, root, n_iters=1)
    assert res["compacted"] is True
    A.verify_ann_index(spark, root)
    stored_after = {
        r.vec_id
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .select("vec_id")
        .collect()
    }
    assert new_ids <= stored_after


def test_pre_protocol_debris_swept_and_flagged(spark, tmp_path):
    """vectors__old/__compacting WITHOUT a pending manifest (a crash
    from the pre-protocol code, or an interrupted final sweep):
    verify flags it, recover sweeps it, and a fresh compact's entry
    sweep also clears it instead of tripping over it."""
    _, root, queries = _build(spark, tmp_path)
    os.makedirs(f"{root}/{A._OLD_DIR}/cluster=0")
    with pytest.raises(ValueError, match="recover_ann_index"):
        A.verify_ann_index(spark, root)
    rec = A.recover_ann_index(root)
    assert rec["recovered"] is False and rec["swept"] == [A._OLD_DIR]
    A.verify_ann_index(spark, root)

    os.makedirs(f"{root}/{A._TMP_DIR}/cluster=0")
    res = A.compact_ann_index(spark, root, n_iters=1)  # entry sweep
    assert res["compacted"] is True
    A.verify_ann_index(spark, root)


def test_embed_stream_recovers_crashed_compact_on_start(
    spark, tmp_path, monkeypatch
):
    """The shipped-jobs composition the protocol exists for: a cron'd
    compact died mid-swap (pending manifest present, vectors/ gone);
    the live embed stream, restarted, must not park on the refusal —
    recover_on_start finishes the swap and the batch appends land."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        start_embed_stream,
    )

    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    emb0 = hashed_tf_embedding(seed_docs).select("doc_id", "embedding")
    A.build_ann_index(spark, emb0, root, n_clusters=4, m=4, k=8, id_col="doc_id")

    _crash_compact(spark, root, monkeypatch, rename_calls_before_crash=1)
    assert os.path.exists(f"{root}/{A._PENDING}")

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(100, "fresh streamed document about topic_x")],
        "doc_id long, text string",
    ).coalesce(1).write.json(f"{docs_dir}/f=0")
    q = start_embed_stream(
        spark,
        docs_path=docs_dir,
        index_root=root,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    A.verify_ann_index(spark, root)
    meta = A.load_ann_meta(root)
    # v2 = the recovered compact's commit, v3 = the batch append
    assert meta["version"] == 3
    assert meta["codebook_source"] == "compacted"
    stored = {
        r.doc_id
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .select("doc_id")
        .collect()
    }
    assert 100 in stored
