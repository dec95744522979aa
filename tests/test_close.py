"""Transitive-closure maintenance for the streaming dedup loops
(streaming/close.py).

The attack surface is the greedy-vs-closure gap: a chain A~B~C whose
members never co-batch (and whose ends don't match each other) leaves
the stream with TWO keepers; the close pass must fold it to one,
rewrite only what changed, keep the stream serviceable afterwards, and
converge under repeated passes (the documented contract for arrivals
that matched a demoted member).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.streaming.close import (
    close_near_dedup_state,
    close_semantic_dedup_state,
)

TX = "the quick brown fox jumps over the lazy dog near the river bank today"
TZ = (
    "streaming state stores maintain watermark progress across micro "
    "batch executions during failures"
)


def _write_batch(spark, docs_dir: str, name: str, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").json(f"{docs_dir}/f={name}")


def _store_ids(spark, root: str) -> set:
    if not os.path.isdir(root):
        return set()
    return {
        r.doc_id
        for r in spark.read.option("basePath", root)
        .parquet(root)
        .select("doc_id")
        .dropDuplicates()
        .collect()
    }


def test_near_dedup_close_folds_chain_and_keeps_stream_consistent(
    spark, tmp_path
):
    """A~B~C across three single-doc batches (A,C never co-batched,
    est(A,C)=0): the stream greedily keeps A and C; dedup-close folds
    the component to ONE keeper, moves signatures so the store holds
    exactly the closed keepers, is idempotent, keeps leakage_safe_split
    chain-homogeneous, and a later smaller-id exact dup PROMOTES into
    keeperhood on the next pass (demoting the old keeper)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        leakage_safe_split,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    _write_batch(spark, docs_dir, "0", [(5, TX)])
    _write_batch(spark, docs_dir, "1", [(6, TX + " " + TZ)])
    _write_batch(spark, docs_dir, "2", [(7, TZ)])

    def run(ckpt="ckpt"):
        q = start_near_dedup_stream(
            spark,
            docs_path=docs_dir,
            state_root=state,
            checkpoint_path=str(tmp_path / ckpt),
            num_hashes=12,
            bands=12,  # rows=1: any equal component is a candidate
            threshold=0.4,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run()
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    # greedy stream: 6 dups 5 (est 0.5 >= 0.4); 7 never compared to the
    # dropped 6, est(5,7)=0 -> TWO keepers, the chain is split
    assert dec[5].keep and not dec[6].keep and dec[6].dup_of == 5
    assert dec[7].keep
    assert _store_ids(spark, f"{state}/signatures") == {5, 7}
    assert _store_ids(spark, f"{state}/dup_signatures") == {6}

    rep = close_near_dedup_state(spark, state, threshold=0.4)
    assert rep["changed_verdicts"] == 1 and rep["docs"] == 3
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert dec[5].keep
    assert not dec[6].keep and dec[6].dup_of == 5 and dec[6].est == pytest.approx(0.5)
    # the transitive member: linked through 6, no direct pair -> NULL est
    assert not dec[7].keep and dec[7].dup_of == 5 and dec[7].est is None
    # keeper state moved: store = closed keepers only
    assert _store_ids(spark, f"{state}/signatures") == {5}
    assert _store_ids(spark, f"{state}/dup_signatures") == {6, 7}

    # idempotent: a second pass changes nothing
    rep2 = close_near_dedup_state(spark, state, threshold=0.4)
    assert rep2["changed_verdicts"] == 0
    assert rep2["decision_dirs_rewritten"] == 0

    # split-homogeneity over the closed clusters
    labels = read_dedup_decisions(spark, state).select(
        "doc_id", F.coalesce("dup_of", "doc_id").alias("label")
    )
    docs = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    out = leakage_safe_split(docs, {"train": 50, "eval": 50}, labels=labels)
    assert out.select("split").distinct().count() == 1

    # the stream keeps serving over the closed state: a smaller-id
    # exact dup of the keeper arrives, is flagged against the store...
    _write_batch(spark, docs_dir, "3", [(1, TX)])
    run()
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert not dec[1].keep and dec[1].dup_of == 5 and dec[1].est == pytest.approx(1.0)

    # ... and the next close PROMOTES it (min id of the component),
    # demoting the old keeper; every member repoints at 1
    rep3 = close_near_dedup_state(spark, state, threshold=0.4)
    assert rep3["changed_verdicts"] == 4
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert dec[1].keep and dec[1].dup_of is None
    assert not dec[5].keep and dec[5].dup_of == 1 and dec[5].est == pytest.approx(1.0)
    assert not dec[6].keep and dec[6].dup_of == 1 and dec[6].est == pytest.approx(0.5)
    assert not dec[7].keep and dec[7].dup_of == 1 and dec[7].est is None
    assert _store_ids(spark, f"{state}/signatures") == {1}
    assert _store_ids(spark, f"{state}/dup_signatures") == {5, 6, 7}


def test_semantic_dedup_close_folds_chain_through_ann_index(spark, tmp_path):
    """The semantic twin: a paraphrase chain across three single-doc
    batches folds to one keeper; demoted keepers LEAVE the ANN index
    (their vectors move to the cold log), the index stays verifiable,
    and an arrival matching a demoted member converges on the NEXT
    pass — the documented repeated-pass contract."""
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        verify_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.semdedup import (
        read_semantic_decisions,
        start_semantic_dedup_stream,
    )

    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "idx")
    # n_clusters=1: the close pass's intra-cluster pair plan sees every
    # accumulated vector in one cluster (deterministic rediscovery)
    build_ann_index(
        spark,
        hashed_tf_embedding(seed_docs).select("doc_id", "embedding"),
        index_root, n_clusters=1, m=4, k=8, id_col="doc_id",
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    _write_batch(spark, docs_dir, "0", [(105, TX)])
    _write_batch(spark, docs_dir, "1", [(106, TX + " " + TZ)])
    _write_batch(spark, docs_dir, "2", [(107, TZ)])

    def run(ckpt="ckpt"):
        q = start_semantic_dedup_stream(
            spark,
            docs_path=docs_dir,
            index_root=index_root,
            state_root=state,
            checkpoint_path=str(tmp_path / ckpt),
            threshold=0.5,
            k=3,
            nprobe=1,
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)

    run()
    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    # greedy: 6 dups 5 (cos ~0.85), 107 kept (cos(105,107)=0; 106 not indexed)
    assert dec[105].keep
    assert not dec[106].keep and dec[106].dup_of == 105 and dec[106].cosine > 0.5
    assert dec[107].keep
    indexed = _store_ids(spark, f"{index_root}/vectors")
    assert {105, 107} <= indexed and 106 not in indexed
    assert _store_ids(spark, f"{state}/dup_vectors") == {106}

    rep = close_semantic_dedup_state(
        spark, state, index_root, threshold=0.5, pair_blocks=2
    )
    assert rep["changed_verdicts"] == 1
    assert rep["index_deleted"] == 1 and rep["index_appended"] == 0
    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    assert dec[105].keep
    assert not dec[106].keep and dec[106].dup_of == 105
    assert not dec[107].keep and dec[107].dup_of == 105 and dec[107].cosine is None
    indexed = _store_ids(spark, f"{index_root}/vectors")
    assert 105 in indexed and not {106, 107} & indexed
    assert _store_ids(spark, f"{state}/dup_vectors") == {106, 107}
    assert verify_ann_index(spark, index_root)["violations"] == 0

    # idempotent — and the second pass engages INCREMENTAL mode (the
    # first wrote the watermark)
    assert rep["mode"] == "full"
    rep2 = close_semantic_dedup_state(
        spark, state, index_root, threshold=0.5, pair_blocks=2
    )
    assert rep2["changed_verdicts"] == 0
    assert rep2["mode"] == "incremental"

    # an exact dup of the DEMOTED 7 arrives: the stream misses it (7 is
    # not in the index — the documented hot-path recall gap)...
    _write_batch(spark, docs_dir, "3", [(108, TZ)])
    run()
    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    assert dec[108].keep

    # ... and the next close folds it in through the cold log
    rep3 = close_semantic_dedup_state(
        spark, state, index_root, threshold=0.5, pair_blocks=2
    )
    assert rep3["changed_verdicts"] == 1
    assert rep3["mode"] == "incremental"
    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    assert not dec[108].keep and dec[108].dup_of == 105
    indexed = _store_ids(spark, f"{index_root}/vectors")
    assert 105 in indexed and not {106, 107, 108} & indexed
    assert verify_ann_index(spark, index_root)["violations"] == 0

    # equivalence pin: after the incremental passes converged, a FULL
    # re-fold must find NOTHING left to change — the incremental lane
    # reached the same fixpoint the exhaustive pass defines
    rep4 = close_semantic_dedup_state(
        spark, state, index_root, threshold=0.5, pair_blocks=2,
        mode="full",
    )
    assert rep4["mode"] == "full" and rep4["changed_verdicts"] == 0

    # a changed threshold voids the watermark: auto falls back to full
    assert close_semantic_dedup_state(
        spark, state, index_root, threshold=0.55, pair_blocks=2
    )["mode"] == "full"


def test_close_every_hook_converges_stream_only(spark, tmp_path):
    """close_every=N: the closure pass runs INLINE after every Nth
    micro-batch (foreachBatch is serial, so the stream is effectively
    stopped while it runs) — a stream-only user converges to the batch
    clusters with no maintenance scheduler. The A~B~C chain drains in
    one availableNow run of 3 single-file batches and comes out
    CLOSED."""
    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    _write_batch(spark, docs_dir, "0", [(5, TX)])
    _write_batch(spark, docs_dir, "1", [(6, TX + " " + TZ)])
    _write_batch(spark, docs_dir, "2", [(7, TZ)])

    q = start_near_dedup_stream(
        spark,
        docs_path=docs_dir,
        state_root=state,
        checkpoint_path=str(tmp_path / "ckpt"),
        num_hashes=12,
        bands=12,
        threshold=0.4,
        max_files_per_trigger=1,
        close_every=3,
    )
    q.awaitTermination(180)

    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert dec[5].keep
    assert not dec[6].keep and dec[6].dup_of == 5
    assert not dec[7].keep and dec[7].dup_of == 5  # closed inline
    assert _store_ids(spark, f"{state}/signatures") == {5}
    assert _store_ids(spark, f"{state}/dup_signatures") == {6, 7}


def test_closure_labels_match_duckdb_recursive_cc(spark, tmp_path):
    """Oracle-grade twin for the closure semantics: DuckDB computes the
    connected components of the SAME pair graph with a recursive CTE
    (label = MIN reachable vertex over undirected edges) and the closed
    verdicts' keeper mapping must equal it exactly — the cross-engine
    check the extras convention uses when a component can't hold a
    registry slot."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    # two independent chains + a singleton, spread over 3 batches
    _write_batch(spark, docs_dir, "0", [(5, TX), (20, "alpha beta gamma delta epsilon zeta eta theta")])
    _write_batch(spark, docs_dir, "1", [(6, TX + " " + TZ), (21, "alpha beta gamma delta epsilon zeta eta theta iota")])
    _write_batch(spark, docs_dir, "2", [(7, TZ), (30, "wholly unrelated singleton document content here words enough")])

    q = start_near_dedup_stream(
        spark,
        docs_path=docs_dir,
        state_root=state,
        checkpoint_path=str(tmp_path / "ckpt"),
        num_hashes=12,
        bands=12,
        threshold=0.4,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    rep = close_near_dedup_state(spark, state, threshold=0.4)
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    got = {d: (r.dup_of if r.dup_of is not None else d) for d, r in dec.items()}

    # rebuild the SAME pair graph the close pass used: every >=threshold
    # signature pair across store + cold log
    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        _est_col,
    )
    from pyspark.sql import functions as F2

    store = spark.read.option("basePath", f"{state}/signatures").parquet(
        f"{state}/signatures"
    )
    cold = spark.read.option("basePath", f"{state}/dup_signatures").parquet(
        f"{state}/dup_signatures"
    )
    sigs = store.unionByName(cold).select("doc_id", "band", "band_key", "sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = (
        a.join(b, on=["band", "band_key"])
        .where(F2.col("a.doc_id") > F2.col("b.doc_id"))
        .select(
            F2.col("a.doc_id").alias("ida"),
            F2.col("b.doc_id").alias("idb"),
            _est_col("a.sig", "b.sig", 12),
        )
        .dropDuplicates(["ida", "idb"])
        .where(F2.col("est") >= 0.4)
        .select("ida", "idb")
        .collect()
    )
    edge_rows = [(r.ida, r.idb) for r in pairs] or [(-1, -1)]
    vertex_rows = [(d,) for d in dec]

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edge_rows)
    con.execute("CREATE TABLE vertices(id BIGINT)")
    con.executemany("INSERT INTO vertices VALUES (?)", vertex_rows)
    want = dict(
        con.execute(
            """
            WITH RECURSIVE und AS (
              SELECT a, b FROM edges UNION SELECT b, a FROM edges
            ),
            walk(id, label) AS (
              SELECT id, id FROM vertices
              UNION
              SELECT u.a, w.label FROM und u JOIN walk w ON w.id = u.b
            )
            SELECT id, MIN(label) FROM walk
            WHERE id IN (SELECT id FROM vertices)
            GROUP BY id
            """
        ).fetchall()
    )
    assert got == want
    assert rep["docs"] == 6


TY = (
    "vector quantization codebooks compress embedding tables for "
    "approximate nearest neighbour search engines"
)
TW = (
    "partition pruning reads only the files whose statistics can "
    "possibly satisfy the query predicates"
)


def test_incremental_close_matches_full_and_bounds_pair_input(
    spark, tmp_path
):
    """VERDICT r08 #2: the incremental pass (default 'auto' after a
    first pass writes the close watermark) must be VERDICT-IDENTICAL
    to mode='full' across >=3 closes of an evolving two-component
    stream, while its band-join input stays bounded by the touched
    components (component-1's signatures never enter close #2's pair
    join, which only component-2 docs touched)."""
    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    def env(tag):
        return {
            "docs": str(tmp_path / f"docs_{tag}"),
            "state": str(tmp_path / f"state_{tag}"),
            "ckpt": str(tmp_path / f"ckpt_{tag}"),
        }

    envs = {"full": env("full"), "incr": env("incr")}

    def run_both():
        for e in envs.values():
            q = start_near_dedup_stream(
                spark,
                docs_path=e["docs"],
                state_root=e["state"],
                checkpoint_path=e["ckpt"],
                num_hashes=12,
                bands=12,
                threshold=0.25,
                max_files_per_trigger=1,
            )
            q.awaitTermination(180)

    def close_both():
        rf = close_near_dedup_state(
            spark, envs["full"]["state"], threshold=0.25, mode="full"
        )
        ri = close_near_dedup_state(
            spark, envs["incr"]["state"], threshold=0.25, mode="auto"
        )
        return rf, ri

    def decisions(e):
        return {
            r.doc_id: (r.keep, r.dup_of, r.est)
            for r in read_dedup_decisions(spark, e["state"]).collect()
        }

    def write_both(name, rows):
        for e in envs.values():
            _write_batch(spark, e["docs"], name, rows)

    # close #1: component 1 chain (A~B~C over batches 0-2)
    write_both("0", [(5, TX)])
    write_both("1", [(6, TX + " " + TZ)])
    write_both("2", [(7, TZ)])
    run_both()
    rf, ri = close_both()
    assert ri["mode"] == "full"  # no watermark yet: auto falls back
    assert decisions(envs["full"]) == decisions(envs["incr"])

    # close #2: component 2 chain arrives (batches 3-5); the
    # incremental pass must scope pair regeneration to ITS bands
    write_both("3", [(20, TW)])
    write_both("4", [(22, TW + " " + TY)])
    write_both("5", [(24, TY)])
    run_both()
    rf, ri = close_both()
    assert ri["mode"] == "incremental"
    assert decisions(envs["full"]) == decisions(envs["incr"])
    assert rf["changed_verdicts"] == ri["changed_verdicts"] > 0
    # the bound: full re-folds every signature row; incremental's pair
    # input excludes component 1 entirely (disjoint shingles)
    assert ri["pair_input_rows"] < rf["pair_input_rows"]
    comp1_docs = {5, 6, 7}
    sig_docs_in_cand = ri["pair_input_rows"]
    total = rf["pair_input_rows"]
    assert sig_docs_in_cand <= total - 1  # strictly bounded

    # close #3: a smaller-id exact dup of component 1's keeper arrives
    # -> promotion cascades through component 1 only
    write_both("6", [(2, TX)])
    run_both()
    rf, ri = close_both()
    assert ri["mode"] == "incremental"
    assert decisions(envs["full"]) == decisions(envs["incr"])
    assert rf["changed_verdicts"] == ri["changed_verdicts"] == 4
    d = decisions(envs["incr"])
    assert d[2] == (True, None, None)
    assert d[5][1] == 2 and d[6][1] == 2 and d[7][1] == 2
    assert ri["pair_input_rows"] < rf["pair_input_rows"]

    # close #4 (idempotence under incremental): nothing new changed
    rf, ri = close_both()
    assert ri["changed_verdicts"] == rf["changed_verdicts"] == 0
    assert decisions(envs["full"]) == decisions(envs["incr"])
    # stores agree too
    for plane in ("signatures", "dup_signatures"):
        assert _store_ids(spark, f"{envs['full']['state']}/{plane}") == (
            _store_ids(spark, f"{envs['incr']['state']}/{plane}")
        )

    # equivalence pin: a FULL re-fold over the incrementally-closed
    # state finds nothing left to change — the incremental lane
    # reached the fixpoint the exhaustive pass defines
    rep_full = close_near_dedup_state(
        spark, envs["incr"]["state"], threshold=0.25, mode="full"
    )
    assert rep_full["changed_verdicts"] == 0

    # parameter change voids the watermark: auto falls back to full
    rep = close_near_dedup_state(
        spark, envs["incr"]["state"], threshold=0.3, mode="auto"
    )
    assert rep["mode"] == "full"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="watermark"):
        close_near_dedup_state(
            spark, envs["incr"]["state"], threshold=0.35,
            mode="incremental",
        )


def test_replay_after_inline_close_converges(spark, tmp_path):
    """VERDICT r08 #6 / ADVICE r08: close_every runs the inline close
    BEFORE the micro-batch's offsets commit; a crash in that window
    replays the batch over post-closure state, overwriting its own
    directories with greedy verdicts. Pin the traced self-heal: the
    replay regresses ONLY the last batch, and the next closure pass
    (watermark inclusive of its own batch) re-folds it back to the
    same clusters."""
    import shutil

    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, docs_dir, "0", [(5, TX)])
    _write_batch(spark, docs_dir, "1", [(6, TX + " " + TZ)])
    _write_batch(spark, docs_dir, "2", [(7, TZ)])

    def run():
        q = start_near_dedup_stream(
            spark,
            docs_path=docs_dir,
            state_root=state,
            checkpoint_path=ckpt,
            num_hashes=12,
            bands=12,
            threshold=0.4,
            max_files_per_trigger=1,
            close_every=1,
        )
        q.awaitTermination(180)

    run()
    closed = {
        r.doc_id: (r.keep, r.dup_of)
        for r in read_dedup_decisions(spark, state).collect()
    }
    assert closed == {5: (True, None), 6: (False, 5), 7: (False, 5)}
    assert _store_ids(spark, f"{state}/signatures") == {5}

    # simulate the crash: batch 2 ran (offsets written, inline close
    # done) but its commit never landed -> Spark replays batch 2
    commit2 = os.path.join(ckpt, "commits", "2")
    assert os.path.exists(commit2)
    os.remove(commit2)
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)

    run()  # replays batch 2 over post-closure state, then closes again
    final = {
        r.doc_id: (r.keep, r.dup_of)
        for r in read_dedup_decisions(spark, state).collect()
    }
    assert final == closed  # converged back to the closed clusters
    assert _store_ids(spark, f"{state}/signatures") == {5}
    assert _store_ids(spark, f"{state}/dup_signatures") == {6, 7}


def test_incremental_close_random_waves_property(spark, tmp_path):
    """Property-shaped generalization of the chain e2e: four seeded
    waves of documents (fresh texts, mutations of earlier docs, exact
    duplicates — including cross-wave chains no greedy pass would
    fold) land as fabricated state batches in two identical state
    roots; after every wave, one root closes incrementally (auto) and
    the other with the full re-fold. Decisions must be IDENTICAL after
    every pass — the recorded-edges soundness argument, exercised over
    a messy random graph instead of one crafted chain."""
    import random

    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        _banded_signatures,
        read_dedup_decisions,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(400)]
    texts: dict[int, str] = {}

    def fresh_text() -> str:
        return " ".join(rng.sample(vocab, 30))

    def mutate(t: str) -> str:
        toks = t.split()
        keep = rng.randint(18, 27)
        return " ".join(
            toks[:keep] + [f"m{rng.randrange(10**6)}" for _ in range(30 - keep)]
        )

    states = {m: str(tmp_path / m) for m in ("auto", "full")}
    next_id = 0
    for wave in range(4):
        docs = []
        for _ in range(25):
            doc_id, next_id = next_id, next_id + 1
            kind = rng.random()
            if kind < 0.4 or not texts:
                t = fresh_text()
            elif kind < 0.75:
                t = mutate(texts[rng.choice(sorted(texts))])
            else:
                t = texts[rng.choice(sorted(texts))]  # exact dup
            texts[doc_id] = t
            docs.append((doc_id, t))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        banded = _banded_signatures(df, n=5, num_hashes=12, bands=12,
                                    normalize=False)
        for root in states.values():
            banded.write.mode("overwrite").parquet(
                f"{root}/signatures/batch_id={wave}"
            )
            df.select(
                "doc_id",
                F.lit(True).alias("keep"),
                F.lit(None).cast("long").alias("dup_of"),
                F.lit(None).cast("double").alias("est"),
                F.lit(wave).cast("long").alias("batch_id"),
            ).write.mode("overwrite").parquet(
                f"{root}/decisions/batch_id={wave}"
            )
        ra = close_near_dedup_state(
            spark, states["auto"], threshold=0.4, mode="auto"
        )
        rb = close_near_dedup_state(
            spark, states["full"], threshold=0.4, mode="full"
        )
        assert ra["mode"] == ("full" if wave == 0 else "incremental")
        assert ra["changed_verdicts"] == rb["changed_verdicts"]

        def dec(root):
            return {
                r.doc_id: (r.keep, r.dup_of, r.est)
                for r in read_dedup_decisions(spark, root).collect()
            }

        da, db = dec(states["auto"]), dec(states["full"])
        assert da == db, {k: (da.get(k), db.get(k))
                          for k in set(da) | set(db)
                          if da.get(k) != db.get(k)}
        # stores agree plane-for-plane too
        for plane in ("signatures", "dup_signatures"):
            assert _store_ids(spark, f"{states['auto']}/{plane}") == (
                _store_ids(spark, f"{states['full']}/{plane}")
            )
    # the random graph must have produced real multi-doc components or
    # the property proved nothing
    n_dups = sum(1 for v in dec(states["auto"]).values() if not v[0])
    assert n_dups >= 10, n_dups
