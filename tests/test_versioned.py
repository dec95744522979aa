"""Transactional versioned parquet store (versioned.py).

Attack the transaction properties, not just the happy path: snapshot
isolation across versions (bit-exact time travel), atomic overwrite
(no delete-all-then-add window), targeted delete rewrites only
affected files, rollback preserves history, version conflicts are
detected not overwritten, crash debris never corrupts reads, vacuum
reclaims exactly the unreferenced files.
"""
from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V

SF = "/root/testdata/sf0.001"


def _ids(df):
    return sorted(r[0] for r in df.collect())


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@pytest.fixture(params=["posix-link", "conditional-put"])
def log_store(request):
    """Run commit-protocol tests against BOTH publish backends: the
    POSIX hard-link default and the object-store-shaped conditional
    put — the protocol above the seam must not care which."""
    store = (
        V.PosixLinkLogStore()
        if request.param == "posix-link"
        else V.ConditionalPutLogStore()
    )
    prev = V.set_log_store(store)
    yield request.param
    V.set_log_store(prev)


def test_append_overwrite_time_travel_and_history(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    a = orders.where("o_orderkey % 3 = 0")
    b = orders.where("o_orderkey % 3 = 1")
    c = orders.where("o_orderkey % 3 = 2")

    assert V.append(a, root) == 1
    assert V.append(b, root) == 2
    v3 = V.overwrite(c, root)
    assert v3 == 3

    # snapshots are bit-exact per version
    assert _ids(V.read_versioned(spark, root, 1)) == _ids(a)
    assert _ids(V.read_versioned(spark, root, 2)) == sorted(
        _ids(a) + _ids(b)
    )
    assert _ids(V.read_versioned(spark, root)) == _ids(c)

    hist = V.history(root)
    assert [(h["version"], h["action"]) for h in hist] == [
        (1, "append"), (2, "append"), (3, "overwrite"),
    ]
    with pytest.raises(ValueError, match="does not exist"):
        V.read_versioned(spark, root, 99)


def test_delete_where_rewrites_only_affected_files(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders.repartition(4), root)
    files_v1 = sorted(glob.glob(os.path.join(root, "data", "*.parquet")))
    assert len(files_v1) == 4
    stat_v1 = {f: os.path.getsize(f) for f in files_v1}

    victims = _ids(orders.where("o_custkey % 7 = 0").select("o_orderkey"))
    assert victims
    v2 = V.delete_where(spark, root, "o_custkey % 7 = 0")
    assert v2 == 2

    now = V.read_versioned(spark, root)
    assert _ids(now) == sorted(set(_ids(orders)) - set(victims))
    # time travel to v1 still has everything
    assert _ids(V.read_versioned(spark, root, 1)) == _ids(orders)
    # old data files untouched on disk (immutability)
    for f, sz in stat_v1.items():
        assert os.path.getsize(f) == sz

    # delete with no matches: NO new version
    assert V.delete_where(spark, root, "o_custkey < 0") == 2


def test_version_conflict_and_crash_debris(spark, orders, tmp_path, log_store):
    root = str(tmp_path / "t")
    V.append(orders, root)

    # RACE: our writer reads the log (sees v1, plans v2), then a
    # competing writer lands v2 first — the commit must fail loudly,
    # never silently overwrite (POSIX rename would; os.link refuses)
    log = os.path.join(root, "_txlog")
    v1 = os.path.join(log, "v000000000001.json")
    competing = {
        "version": 2, "action": "append", "added": [], "removed": [],
        "schema": json.load(open(v1))["schema"],
    }
    with open(os.path.join(log, "v000000000002.json"), "w") as fh:
        json.dump(competing, fh)
    stale = [(1, v1)]  # the view our writer captured before the race
    real = V._manifests
    V._manifests = lambda r: stale if os.path.abspath(r) == os.path.abspath(root) else real(r)
    try:
        with pytest.raises(V.VersionConflict):
            V.append(orders.limit(5), root)
    finally:
        V._manifests = real

    # crash debris: orphan data + staging files are invisible to reads
    open(os.path.join(root, "data", "orphan-000.parquet"), "wb").close()
    os.makedirs(os.path.join(root, ".staging", "dead"), exist_ok=True)
    assert _ids(V.read_versioned(spark, root)) == _ids(orders)

    rep = V.vacuum(root, keep_last=2, retention_seconds=0.0)
    assert rep["data_files_removed"] >= 1  # the orphan (+ any leaked adds)
    assert rep["staging_removed"] == 1
    assert not os.path.isdir(os.path.join(root, ".staging"))
    assert _ids(V.read_versioned(spark, root)) == _ids(orders)


def test_rollback_and_vacuum_expiry(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    a = orders.where("o_orderkey % 2 = 0")
    b = orders.where("o_orderkey % 2 = 1")
    V.append(a, root)          # v1
    V.overwrite(b, root)       # v2
    v3 = V.rollback(spark, root, 1)
    assert v3 == 3
    assert _ids(V.read_versioned(spark, root)) == _ids(a)
    # rollback added a VERSION, not erased one
    assert [h["version"] for h in V.history(root)] == [1, 2, 3]
    assert _ids(V.read_versioned(spark, root, 2)) == _ids(b)

    # vacuum keeping only the latest: v2's exclusive files go away,
    # latest snapshot still bit-exact
    rep = V.vacuum(root, keep_last=1, retention_seconds=0.0)
    assert rep["data_files_removed"] >= 1
    assert _ids(V.read_versioned(spark, root)) == _ids(a)
    # the expired snapshot's data is gone (reads of v2 now fail)
    with pytest.raises(Exception):
        V.read_versioned(spark, root, 2).collect()

    # empty overwrite keeps schema
    empty = orders.where("o_orderkey < 0")
    V.overwrite(empty, root)
    got = V.read_versioned(spark, root)
    assert got.count() == 0
    assert got.columns == ["o_orderkey", "o_custkey", "o_totalprice"]


def test_merge_into_upsert_semantics_and_file_surgery(spark, orders, tmp_path):
    """MERGE: matched keys replaced, new keys inserted, untouched
    files stay live; result == a DataFrame-computed upsert oracle."""
    root = str(tmp_path / "t")
    V.append(orders.repartition(4), root)

    updates = (
        orders.where("o_orderkey % 10 = 0")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            spark.createDataFrame(
                [(999901, 1, 42.0), (999902, 2, 43.0)],
                "o_orderkey bigint, o_custkey bigint, o_totalprice double",
            )
        )
    )
    v2 = V.merge_into(spark, root, updates, ["o_orderkey"])
    assert v2 == 2

    got = V.read_versioned(spark, root)
    want = orders.join(
        updates.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(updates)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # time travel: v1 is the pre-merge table
    assert _ids(V.read_versioned(spark, root, 1)) == _ids(orders)

    hist = V.history(root)
    assert hist[-1]["action"] == "merge"
    # file surgery: some of v1's 4 files survived untouched iff not
    # every file contained a matching key; with %10 keys spread by
    # repartition all 4 likely hit — assert the log is consistent
    # instead: removed <= 4 and every removed file held a match
    assert hist[-1]["n_removed"] <= 4

    # a merge whose keys miss entirely == pure insert, no rewrites
    ins = spark.createDataFrame(
        [(999903, 3, 44.0)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    )
    V.merge_into(spark, root, ins, ["o_orderkey"])
    assert V.history(root)[-1]["n_removed"] == 0
    assert 999903 in _ids(V.read_versioned(spark, root))


def test_append_stream_batch_exactly_once(spark, orders, tmp_path):
    """The foreachBatch sink body: distinct batch ids append once,
    a REPLAYED id is recognized in the log and skipped, empty batches
    commit nothing."""
    root = str(tmp_path / "t")
    b0 = orders.where("o_orderkey % 2 = 0")
    b1 = orders.where("o_orderkey % 2 = 1")

    assert V.append_stream_batch(b0, 0, root) == 1
    assert V.append_stream_batch(b1, 1, root) == 2
    n = V.read_versioned(spark, root).count()

    # crash-replay of batch 1: same id -> skip, table unchanged
    assert V.append_stream_batch(b1, 1, root) is None
    assert V.read_versioned(spark, root).count() == n
    assert len(V.history(root)) == 2

    # empty batch: no version
    assert V.append_stream_batch(orders.where("o_orderkey < 0"), 2, root) is None
    assert len(V.history(root)) == 2


def test_append_stream_batch_through_real_stream(spark, tmp_path):
    """End-to-end: a file stream drains into the versioned store via
    foreachBatch; every landed row is present exactly once and the
    version chain carries one version per non-empty batch."""
    import json as js

    src = tmp_path / "in"
    src.mkdir()
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")

    (src / "a.json").write_text(
        "\n".join(js.dumps({"k": i, "v": f"a{i}"}) for i in range(5))
    )
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.option("checkpointLocation", ckpt).foreachBatch(
        lambda b, i: V.append_stream_batch(b, i, root)
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    (src / "b.json").write_text(
        "\n".join(js.dumps({"k": i, "v": f"b{i}"}) for i in range(5, 8))
    )
    q2 = stream.writeStream.option("checkpointLocation", ckpt).foreachBatch(
        lambda b, i: V.append_stream_batch(b, i, root)
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)

    got = V.read_versioned(spark, root)
    assert sorted(r.k for r in got.collect()) == list(range(8))
    assert [h["action"] for h in V.history(root)] == ["append", "append"]


def test_checkpoint_compacts_replay_and_preserves_time_travel(
    spark, orders, tmp_path
):
    """After a checkpoint, the LATEST read no longer needs the
    pre-checkpoint manifests (proven by deleting them); time travel
    before the checkpoint still works while they exist; checkpointing
    twice is a no-op."""
    root = str(tmp_path / "t")
    parts = [orders.where(f"o_orderkey % 5 = {i}") for i in range(5)]
    for p in parts:
        V.append(p, root)                      # v1..v5
    all_ids = _ids(orders)

    rep = V.checkpoint(root)
    assert rep["version"] == 5 and rep["created"]
    assert V.checkpoint(root) == {"version": 5, "created": False}

    V.append(
        spark.createDataFrame(
            [(999901, 1, 1.0)],
            "o_orderkey bigint, o_custkey bigint, o_totalprice double",
        ),
        root,
    )                                           # v6

    # snapshots identical with the checkpoint in play
    assert _ids(V.read_versioned(spark, root)) == sorted(
        all_ids + [999901]
    )
    assert _ids(V.read_versioned(spark, root, 3)) == sorted(
        _ids(parts[0]) + _ids(parts[1]) + _ids(parts[2])
    )

    # the PROOF the read path starts at the checkpoint: remove v1..v5
    # manifests entirely — latest still reads (checkpoint + v6), while
    # pre-checkpoint time travel is gone as expected
    log = os.path.join(root, "_txlog")
    for v in range(1, 6):
        os.remove(os.path.join(log, f"v{v:012d}.json"))
    assert _ids(V.read_versioned(spark, root)) == sorted(
        all_ids + [999901]
    )


def test_optimize_compacts_and_zorders_content_identical(
    spark, orders, tmp_path
):
    """OPTIMIZE: many small files -> few target-size files as a new
    version; rows identical; with zorder_by the skip index over the
    optimized snapshot prunes a 2-col predicate."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        scan_with_skip_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        optimize,
        snapshot_skip_index,
    )

    root = str(tmp_path / "t")
    V.append(orders.repartition(16), root)     # 16 small files
    before = sorted(map(tuple, V.read_versioned(spark, root).collect()))

    v2 = optimize(spark, root, target_file_bytes=1 << 30)
    assert v2 == 2
    live2, _ = V._replay(root, None)
    assert len(live2) == 1                      # tiny table -> one file
    assert sorted(map(tuple, V.read_versioned(spark, root).collect())) == before
    # pre-optimize version still reads from the 16 old files
    assert sorted(
        map(tuple, V.read_versioned(spark, root, 1).collect())
    ) == before

    v3 = optimize(
        spark, root, target_file_bytes=8 << 10,
        zorder_by=["o_orderkey", "o_custkey"],
    )
    assert v3 == 3
    live3, _ = V._replay(root, None)
    assert len(live3) > 1
    assert sorted(map(tuple, V.read_versioned(spark, root).collect())) == before

    # the composed metadata read: txlog picks live files, skip index
    # prunes them, residual filter keeps it exact
    idx = snapshot_skip_index(spark, root)
    keys = sorted(t[0] for t in before)
    cut = keys[len(keys) // 8]
    got, info = scan_with_skip_index(spark, idx, [("o_orderkey", "<=", cut)])
    assert info["files_total"] == len(live3)
    assert info["files_kept"] < info["files_total"]
    want = [t for t in before if t[0] <= cut]
    assert sorted(map(tuple, got.collect())) == sorted(want)


def test_schema_evolution_read_across_versions(spark, tmp_path):
    """Evolved appends: v1 narrow schema (int, no extra col), v2 wider
    (long + new column) — the snapshot read widens v1's files to the
    lattice LUB without rewriting them; NULL-padded where the column
    did not exist; still exact after a checkpoint (per-file schemas
    survive compaction) and per-version time travel keeps each era's
    own schema."""
    root = str(tmp_path / "t")
    v1df = spark.createDataFrame(
        [(1, 10), (2, 20)], "k int, v int"
    )
    V.append(v1df, root)
    v2df = spark.createDataFrame(
        [(3, 2**40, "x"), (4, 2**41, "y")], "k int, v long, note string"
    )
    V.append(v2df, root)

    got = V.read_versioned(spark, root)
    assert [f.name for f in got.schema.fields] == ["k", "v", "note"]
    assert dict(got.dtypes)["v"] == "bigint"
    rows = {r.k: (r.v, r.note) for r in got.collect()}
    assert rows == {
        1: (10, None), 2: (20, None),
        3: (2**40, "x"), 4: (2**41, "y"),
    }

    # v1 time travel: the old era reads with its own narrow schema
    old = V.read_versioned(spark, root, 1)
    assert dict(old.dtypes)["v"] == "int"
    assert old.columns == ["k", "v"]

    # checkpoint then read again: per-file schemas persisted
    V.checkpoint(root)
    got2 = V.read_versioned(spark, root)
    assert {r.k: (r.v, r.note) for r in got2.collect()} == rows

    # and a post-checkpoint delete keeps the evolved read exact
    V.delete_where(spark, root, "k = 1")
    got3 = V.read_versioned(spark, root)
    assert {r.k: (r.v, r.note) for r in got3.collect()} == {
        2: (20, None), 3: (2**40, "x"), 4: (2**41, "y"),
    }


def test_merge_into_with_schema_evolution(spark, tmp_path):
    """An evolved MERGE: updates carry a new column and a wider type —
    survivors and untouched files widen on read, updates land under
    the LUB, matched keys replaced."""
    root = str(tmp_path / "t")
    V.append(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int"),
        root,
    )
    upd = spark.createDataFrame(
        [(2, 2**40, "upd"), (9, 99, "new")], "k int, v long, tag string"
    )
    V.merge_into(spark, root, upd, ["k"])
    got = {r.k: (r.v, r.tag) for r in V.read_versioned(spark, root).collect()}
    assert got == {
        1: (10, None), 3: (30, None),
        2: (2**40, "upd"), 9: (99, "new"),
    }
    assert dict(V.read_versioned(spark, root).dtypes)["v"] == "bigint"


def test_changes_between_versions(spark, orders, tmp_path):
    """CDF: the version-addressed minimal diff replays a consumer from
    v1 to head; apply(old, diff) == head snapshot."""
    from aws_glue_data_catalog_replication_utility_spark.operators.sync import (
        apply_changeset,
    )
    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        changes_between,
    )

    root = str(tmp_path / "t")
    V.append(orders, root)                                    # v1
    upd = orders.limit(20).withColumn("o_totalprice", F.lit(7.0))
    V.merge_into(spark, root, upd, ["o_orderkey"])            # v2
    V.delete_where(spark, root, "o_custkey % 11 = 0")         # v3

    diff = changes_between(spark, root, 1, keys=["o_orderkey"])
    kinds = {r.change for r in diff.select("change").distinct().collect()}
    assert kinds <= {"insert", "update", "delete"} and "delete" in kinds

    old = V.read_versioned(spark, root, 1)
    head = V.read_versioned(spark, root)
    replayed = apply_changeset(old, diff, ["o_orderkey"])
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, head.collect())
    )


def test_append_checked_gates_bad_batches(spark, tmp_path):
    """Table constraints: a violating batch raises with per-check
    counts and commits NOTHING; a clean batch commits normally."""
    from aws_glue_data_catalog_replication_utility_spark.functions import (
        expectations as E,
    )
    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        ConstraintViolation,
        append_checked,
    )

    root = str(tmp_path / "t")
    checks = [E.not_null("k"), E.in_range("v", 0, 100)]
    good = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    assert append_checked(good, root, checks) == 1

    bad = spark.createDataFrame(
        [(None, 10), (3, 999), (4, 50)], "k int, v int"
    )
    with pytest.raises(ConstraintViolation) as ei:
        append_checked(bad, root, checks)
    got = {r["check"]: r["violations"] for r in ei.value.report}
    assert got == {"not_null(k)": 1, "in_range(v,0,100)": 1}
    # nothing committed, nothing staged left behind as live data
    assert len(V.history(root)) == 1
    assert V.read_versioned(spark, root).count() == 2


def test_append_with_retry_survives_writer_race(
    spark, orders, tmp_path, log_store
):
    """A conflicted append re-commits its staged files under the next
    version — both writers' rows land, no duplicates, no restage."""
    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        append_with_retry,
    )

    root = str(tmp_path / "t")
    V.append(orders.limit(10), root)

    # simulate the race exactly as the conflict test does: our writer
    # plans v2 from a stale log view while v2 already exists
    log = os.path.join(root, "_txlog")
    v1 = os.path.join(log, "v000000000001.json")
    competing = {
        "version": 2, "action": "append",
        "added": [], "removed": [],
        "schema": json.load(open(v1))["schema"],
    }
    with open(os.path.join(log, "v000000000002.json"), "w") as fh:
        json.dump(competing, fh)

    calls = {"n": 0}
    real = V._manifests

    def flaky(r):
        calls["n"] += 1
        # first _commit consult sees the stale view; later ones real
        if calls["n"] <= 1:
            return [(1, v1)]
        return real(r)

    V._manifests = flaky
    try:
        v = append_with_retry(
            orders.where("o_orderkey % 2 = 1").limit(5), root
        )
    finally:
        V._manifests = real
    assert v == 3
    assert V.read_versioned(spark, root).count() == 15
    assert [h["version"] for h in V.history(root)] == [1, 2, 3]


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """DELETE only removes rows where the predicate is TRUE: rows
    where it evaluates NULL (NULL column values sharing a file with
    real matches) must SURVIVE the rewrite — `NOT (pred)` would
    silently drop them."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None), (5, 50)],
        "k int, v int",
    )
    V.append(df.coalesce(1), root)  # one file: NULLs share it
    v2 = V.delete_where(spark, root, "v > 20")
    assert v2 == 2
    got = {(r.k, r.v) for r in V.read_versioned(spark, root).collect()}
    # 3 and 5 deleted (TRUE); 1 (FALSE), 2 and 4 (NULL) kept
    assert got == {(1, 10), (2, None), (4, None)}


def test_rollback_preserves_per_file_origin_schemas(spark, tmp_path):
    """Rollback across schema generations: the re-added old-era files
    must be read under THEIR schemas, not the target version's table
    schema — otherwise mixed-schema reads silently drop/misread the
    evolved columns."""
    root = str(tmp_path / "t")
    V.append(spark.createDataFrame([(1, 10)], "k int, v int"), root)   # v1
    V.append(
        spark.createDataFrame([(2, 2**40, "x")], "k int, v long, note string"),
        root,
    )                                                                  # v2
    V.overwrite(spark.createDataFrame([(9, 9)], "k int, v int"), root)  # v3
    V.rollback(spark, root, 2)                                         # v4

    got = V.read_versioned(spark, root)
    assert [f.name for f in got.schema.fields] == ["k", "v", "note"]
    assert dict(got.dtypes)["v"] == "bigint"
    assert {r.k: (r.v, r.note) for r in got.collect()} == {
        1: (10, None), 2: (2**40, "x"),
    }
    # the manifest records per-file origins, not one blanket schema
    m = json.load(open(os.path.join(root, "_txlog", "v000000000004.json")))
    assert m["action"] == "rollback" and m.get("file_schema")
    # a checkpoint after the rollback keeps the same read
    V.checkpoint(root)
    got2 = V.read_versioned(spark, root)
    assert {r.k: (r.v, r.note) for r in got2.collect()} == {
        1: (10, None), 2: (2**40, "x"),
    }


def test_optimize_commits_snapshot_lub_not_latest_schema(spark, tmp_path):
    """OPTIMIZE writes the LUB-widened snapshot; when the WIDEST append
    is not the LATEST, committing the latest manifest's schema would
    tag the rewritten bytes too narrow and later reads would misread
    them. The commit must carry the snapshot LUB."""
    root = str(tmp_path / "t")
    V.append(
        spark.createDataFrame([(1, 2**40, "x")], "k int, v long, note string"),
        root,
    )                                                                  # wide v1
    V.append(spark.createDataFrame([(2, 20)], "k int, v int"), root)   # narrow v2
    before = {r.k: (r.v, r["note"]) for r in V.read_versioned(spark, root).collect()}
    v3 = V.optimize(spark, root, target_file_bytes=1 << 30)
    assert v3 == 3
    m = json.load(open(os.path.join(root, "_txlog", "v000000000003.json")))
    fields = {f["name"]: f["type"] for f in json.loads(m["schema"])["fields"]}
    assert fields == {"k": "integer", "v": "long", "note": "string"}
    got = V.read_versioned(spark, root)
    assert dict(got.dtypes)["v"] == "bigint"
    assert {r.k: (r.v, r.note) for r in got.collect()} == before
    # ... and an evolved append AFTER the optimize still mixes cleanly
    V.append(spark.createDataFrame([(3, 30)], "k int, v int"), root)
    got2 = V.read_versioned(spark, root)
    assert {r.k for r in got2.collect()} == {1, 2, 3}


def test_vacuum_retention_protects_inflight_writer_files(spark, tmp_path):
    """The concurrent-writer guard: an unreferenced data file YOUNGER
    than the retention window is a possible commit-in-flight and must
    survive vacuum; once aged past the window it is debris and goes."""
    root = str(tmp_path / "t")
    V.append(spark.createDataFrame([(1,)], "k int"), root)
    # a writer mid-commit: file moved into data/, manifest not yet up
    inflight = os.path.join(root, "data", "zz-inflight-0.parquet")
    open(inflight, "wb").close()
    stage = os.path.join(root, ".staging", "live-writer")
    os.makedirs(stage)

    rep = V.vacuum(root, keep_last=1)  # default retention window
    assert rep == {
        "data_files_removed": 0, "dv_removed": 0, "staging_removed": 0
    }
    assert os.path.exists(inflight) and os.path.isdir(stage)

    # age both past the window -> genuinely dead, reclaimed
    old = 1.0
    os.utime(inflight, (old, old))
    os.utime(stage, (old, old))
    rep2 = V.vacuum(root, keep_last=1)
    assert rep2 == {
        "data_files_removed": 1, "dv_removed": 0, "staging_removed": 1
    }
    assert not os.path.exists(inflight) and not os.path.isdir(stage)
    assert V.read_versioned(spark, root).count() == 1


def test_append_stream_batch_two_queries_one_store(spark, orders, tmp_path):
    """Two streaming queries (independent checkpoints, interleaved
    batch-id ranges) appending to ONE store: each query's replay guard
    scopes to its own commits — another query's higher/lower batch ids
    neither mask a replay nor falsely skip a first-time batch."""
    root = str(tmp_path / "t")
    b = [orders.where(f"o_orderkey % 4 = {i}").limit(3) for i in range(4)]

    assert V.append_stream_batch(b[0], 0, root, query_id="qA") == 1
    assert V.append_stream_batch(b[1], 5, root, query_id="qB") == 2
    # qA batch 0 replay: qB's bid=5 > 0 must not break the walk early
    assert V.append_stream_batch(b[0], 0, root, query_id="qA") is None
    # qA batch 1 first time: qB's bid=5 must not mask it... and a
    # LOWER other-query bid must not stop the scan either
    assert V.append_stream_batch(b[2], 1, root, query_id="qA") == 3
    assert V.append_stream_batch(b[3], 6, root, query_id="qB") == 4
    # replays of both queries' latest batches are recognized
    assert V.append_stream_batch(b[2], 1, root, query_id="qA") is None
    assert V.append_stream_batch(b[3], 6, root, query_id="qB") is None
    assert len(V.history(root)) == 4
    n = sum(x.count() for x in b)
    assert V.read_versioned(spark, root).count() == n


def test_concurrent_appends_race_all_land_once(spark, orders, tmp_path, log_store):
    """REAL contention, not an injected stale view: four threads append
    through append_with_retry simultaneously — every batch must land in
    exactly one version, no version skipped or double-assigned, and the
    final snapshot is the union. Runs against both publish backends via
    the log_store fixture (the conditional-put emulation must provide
    the same mutual exclusion os.link gives for free)."""
    from concurrent.futures import ThreadPoolExecutor

    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        append_with_retry,
    )

    root = str(tmp_path / "t")
    V.append(orders.limit(5), root)  # v1
    batches = [
        orders.where(f"o_orderkey % 4 = {i}").limit(10) for i in range(4)
    ]
    counts = [b.count() for b in batches]
    with ThreadPoolExecutor(4) as ex:
        versions = list(ex.map(lambda df: append_with_retry(df, root), batches))
    assert sorted(versions) == [2, 3, 4, 5]
    hist = V.history(root)
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5]
    assert V.read_versioned(spark, root).count() == 5 + sum(counts)


def test_count_versioned_metadata_only(spark, orders, tmp_path):
    """Every commit records its added files' row counts, so COUNT(*)
    of ANY version sums manifest metadata — zero files opened — and
    stays exact through append/MERGE/DELETE/optimize/rollback; a
    checkpoint carries the counts forward (pre-checkpoint manifests
    deleted, count still metadata-only); a legacy manifest with no
    counts falls back to scanning exactly its files."""
    import json as js

    from aws_glue_data_catalog_replication_utility_spark.versioned import (
        count_versioned,
    )

    root = str(tmp_path / "t")
    V.append(orders.repartition(3), root)                          # v1
    upd = orders.limit(10).withColumn("o_totalprice", F.lit(1.0))
    V.merge_into(spark, root, upd, ["o_orderkey"])                 # v2
    V.delete_where(spark, root, "o_custkey % 5 = 0")               # v3
    V.optimize(spark, root, target_file_bytes=1 << 30)             # v4
    V.rollback(spark, root, 2)                                     # v5

    for v in (1, 2, 3, 4, 5, None):
        n, info = count_versioned(spark, root, v)
        assert n == V.read_versioned(spark, root, v).count()
        assert info["files_scanned"] == 0
        assert info["files_from_log"] == info["files_total"]

    # checkpoint compaction preserves the counts: delete every
    # pre-checkpoint manifest, the latest count still never scans
    V.checkpoint(root)
    log = os.path.join(root, "_txlog")
    for v in range(1, 6):
        os.remove(os.path.join(log, f"v{v:012d}.json"))
    n, info = count_versioned(spark, root)
    assert n == V.read_versioned(spark, root).count()
    assert info["files_scanned"] == 0

    # legacy manifest (pre-stats engine): strip file_rows from a new
    # commit -> count falls back to scanning exactly those files
    V.append(orders.limit(7), root)
    mans = sorted(
        p for p in os.listdir(log) if p.startswith("v") and p.endswith(".json")
    )
    mp = os.path.join(log, mans[-1])
    m = js.load(open(mp))
    stripped = {k: v for k, v in m.items() if k != "file_rows"}
    os.remove(mp)
    with open(mp, "w") as fh:
        js.dump(stripped, fh)
    n2, info2 = count_versioned(spark, root)
    assert n2 == V.read_versioned(spark, root).count()
    assert info2["files_scanned"] == len(m["added"]) > 0
    assert info2["files_from_log"] + info2["files_scanned"] == info2["files_total"]


def test_append_stream_batch_legacy_query_id_upgrade(spark, orders, tmp_path):
    """ADVICE r08 (medium): a store whose stream manifests predate
    query scoping (batch_id present, query_id absent) is upgraded in
    place — the CLI now always passes query_id — and the first batch
    replayed across the upgrade boundary must be recognized in the
    LEGACY manifests, not appended twice. Legacy manifests match ANY
    query id; post-upgrade commits are fully scoped."""
    root = str(tmp_path / "t")
    b = [orders.where(f"o_orderkey % 3 = {i}").limit(4) for i in range(3)]

    # legacy era: one-stream-per-store discipline, no query scoping
    assert V.append_stream_batch(b[0], 0, root) == 1
    assert V.append_stream_batch(b[1], 1, root) == 2

    # upgrade: same store + checkpoint, query_id now set; the
    # at-least-once window replays the last committed batch
    assert V.append_stream_batch(b[1], 1, root, query_id="ckpt") is None
    # fresh batches commit query-scoped and replay-guard as usual
    assert V.append_stream_batch(b[2], 2, root, query_id="ckpt") == 3
    assert V.append_stream_batch(b[2], 2, root, query_id="ckpt") is None
    assert V.read_versioned(spark, root).count() == sum(
        x.count() for x in b
    )
    # a DIFFERENT query's scoped commits still never mask each other
    assert V.append_stream_batch(b[0], 2, root, query_id="other") == 4

    # ADVICE r09 (medium): a NEW query (fresh checkpoint, ids restart
    # at 0) attached to this store must NOT have its batches masked by
    # EARLIER legacy ids — only the NEWEST legacy manifest (bid=1) can
    # represent a replay. bid=0 collides with an old legacy commit and
    # must land; bid=1 is the irreducible single-id ambiguity (skipped).
    assert V.append_stream_batch(b[0], 0, root, query_id="fresh") == 5
    assert V.append_stream_batch(b[0], 0, root, query_id="fresh") is None
    assert V.append_stream_batch(b[1], 1, root, query_id="fresh2") is None


def test_merge_into_bloom_pruned_probe(spark, orders, tmp_path):
    """VERDICT r09 #5 — the runtime filter composed into a shipped
    plan: MERGE over a bloom-indexed store opens only the live files
    the index cannot prove key-free, records the pruning in the commit
    manifest, and commits a state bit-identical to the unpruned MERGE.
    The probe subset spans two schema generations (one append carries
    an extra column), so the pruned read exercises the evolution-aware
    subset reader too."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
    )

    upd = (
        orders.where("o_orderkey % 4 = 2")
        .orderBy("o_orderkey")
        .limit(3)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )

    roots = []
    for tag in ("pruned", "plain"):
        root = str(tmp_path / tag)
        for i in range(3):
            part = orders.where(f"o_orderkey % 4 = {i}").repartition(2)
            if i == 2:
                part = part.withColumn("note", F.lit("gen2"))
            V.append(part, root)
        roots.append(root)

    bloom = build_bloom_index(
        spark, f"{roots[0]}/data", ["o_orderkey"], m_bits=1 << 14
    )
    v1 = V.merge_into(
        spark, roots[0], upd.withColumn("note", F.lit("upd")),
        ["o_orderkey"], bloom=bloom,
    )
    V.merge_into(
        spark, roots[1], upd.withColumn("note", F.lit("upd")),
        ["o_orderkey"],
    )

    got = sorted(
        tuple(r) for r in V.read_versioned(spark, roots[0]).collect()
    )
    want = sorted(
        tuple(r) for r in V.read_versioned(spark, roots[1]).collect()
    )
    assert got == want

    # the manifest carries the audit trail and the probe REALLY pruned:
    # appends 0/1 cannot contain %4=2 keys, so at most the third
    # append's files (2 of 6) plus bloom false positives are opened
    manifest = None
    for _, p in V._manifests(roots[0]):
        import json as _json

        with open(p) as fh:
            m = _json.load(fh)
        if m.get("version") == v1:
            manifest = m
    meta = manifest["meta"]
    assert meta["files_total"] == 6
    assert meta["probe_files_scanned"] < meta["files_total"]

    # composite keys route through the tuple prover (r10c): a bloom
    # covering only ONE of the key columns still prunes soundly —
    # equivalence against an unpruned twin, audit meta recorded
    upd2 = (
        orders.where("o_orderkey % 4 = 3")
        .orderBy("o_orderkey")
        .limit(3)
        .withColumn("o_totalprice", F.lit(-1.0))
        .withColumn("note", F.lit("upd2"))
    )
    bloom2 = build_bloom_index(
        spark, f"{roots[0]}/data", ["o_orderkey"], m_bits=1 << 14
    )
    v2 = V.merge_into(
        spark, roots[0], upd2, ["o_orderkey", "o_custkey"], bloom=bloom2
    )
    V.merge_into(spark, roots[1], upd2, ["o_orderkey", "o_custkey"])
    got2 = sorted(
        tuple(r) for r in V.read_versioned(spark, roots[0]).collect()
    )
    want2 = sorted(
        tuple(r) for r in V.read_versioned(spark, roots[1]).collect()
    )
    assert got2 == want2
    m2 = None
    for _, p in V._manifests(roots[0]):
        import json as _json

        with open(p) as fh:
            mm = _json.load(fh)
        if mm.get("version") == v2:
            m2 = mm
    assert m2["meta"]["probe_files_scanned"] < m2["meta"]["files_total"]


def test_merge_into_stats_pruned_probe(spark, orders, tmp_path, monkeypatch):
    """VERDICT r12 #7 — the MERGE probe reuses the commit log's
    per-file min/max before opening any file: a small key set against
    a range-laid store opens only the range-overlapping files (no
    bloom index involved), the probe's file list is asserted directly
    (the read sees ONLY the kept candidates), the manifest records the
    pruning, and the committed state is bit-identical to the unpruned
    twin (SPARK_GRAFT_MERGE_PROBE_KEYS=0 forces the full probe)."""
    lo_keys = sorted(r[0] for r in orders.select("o_orderkey").collect())[:3]
    upd = orders.where(F.col("o_orderkey").isin(lo_keys)).withColumn(
        "o_totalprice", F.lit(-7.0)
    )

    roots = []
    for tag in ("pruned", "full"):
        root = str(tmp_path / tag)
        # 8 range-disjoint files: the 3 lowest keys overlap exactly 1
        V.append(orders.repartitionByRange(8, "o_orderkey"), root)
        roots.append(root)

    probed: list[list[str]] = []
    real_read = V._read_file_subset

    def spy_read(spark_, root_, files, origin, **kw):
        probed.append(sorted(files))
        return real_read(spark_, root_, files, origin, **kw)

    monkeypatch.setattr(V, "_read_file_subset", spy_read)
    v1 = V.merge_into(spark, roots[0], upd, ["o_orderkey"])
    monkeypatch.setenv("SPARK_GRAFT_MERGE_PROBE_KEYS", "0")
    V.merge_into(spark, roots[1], upd, ["o_orderkey"])
    monkeypatch.delenv("SPARK_GRAFT_MERGE_PROBE_KEYS")

    # plan assertion: the pruned probe READ only the stat-overlapping
    # candidates — strictly fewer files than the disabled twin's full
    # probe, and exactly the files the manifest says were scanned.
    # (captured before read_versioned below — it shares the same
    # subset reader and would append to the spy)
    assert len(probed) == 2
    pruned_probe, full_probe = probed

    got = sorted(tuple(r) for r in V.read_versioned(spark, roots[0]).collect())
    want = sorted(tuple(r) for r in V.read_versioned(spark, roots[1]).collect())
    assert got == want
    assert len(full_probe) == 8
    assert len(pruned_probe) < len(full_probe)
    manifest = None
    for _, p in V._manifests(roots[0]):
        with open(p) as fh:
            m = json.load(fh)
        if m.get("version") == v1:
            manifest = m
    assert manifest["meta"]["files_total"] == 8
    assert manifest["meta"]["probe_files_scanned"] == len(pruned_probe)
    # the affected (rewritten) files are a subset of the probed ones
    assert set(manifest["removed"]) <= set(pruned_probe)

    # string keys prune on the str lane too; all-NULL-key updates
    # prove NO file can match (an equi-join never matches NULL)
    sroot = str(tmp_path / "s")
    sdf = spark.createDataFrame(
        [(f"k{i:03d}", i) for i in range(64)], "k string, v int"
    )
    V.append(sdf.repartitionByRange(4, "k"), sroot)
    supd = spark.createDataFrame([("k001", -1)], "k string, v int")
    probed.clear()
    V.merge_into(spark, sroot, supd, ["k"])
    assert len(probed) == 1 and len(probed[0]) == 1
    nupd = spark.createDataFrame(
        [(None, -2)], "k string, v int"
    )
    probed.clear()
    vz = V.merge_into(spark, sroot, nupd, ["k"])
    assert probed == []  # zero candidate files: the probe never ran
    got_n = V.read_versioned(spark, sroot, vz).where("v = -2").count()
    assert got_n == 1  # the NULL-key row still inserts


def test_store_bloom_lifecycle_and_auto_merge(spark, orders, tmp_path):
    """Store-owned bloom index (r10): build persists generations with
    an atomically replaced pointer, merge_into(bloom='auto') picks it
    up and prunes the probe (audited in the manifest), refresh folds
    file adds in incrementally, and 'auto' degrades to the unpruned
    probe for multi-column keys or a bloom-less store."""
    from pyspark.sql import functions as F

    roots = []
    for tag in ("auto", "plain"):
        root = str(tmp_path / tag)
        for i in range(3):
            V.append(
                orders.where(f"o_orderkey % 4 = {i}").repartition(2), root
            )
        roots.append(root)

    assert V.load_store_bloom(spark, roots[0]) is None
    with pytest.raises(ValueError, match="build_store_bloom"):
        V.refresh_store_bloom(spark, roots[0])

    rep = V.build_store_bloom(spark, roots[0], ["o_orderkey"], m_bits=1 << 14)
    assert rep["files"] == 6 and rep["columns"] == ["o_orderkey"]

    upd = (
        orders.where("o_orderkey % 4 = 2")
        .orderBy("o_orderkey")
        .limit(3)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    v1 = V.merge_into(spark, roots[0], upd, ["o_orderkey"], bloom="auto")
    V.merge_into(spark, roots[1], upd, ["o_orderkey"])
    assert sorted(
        tuple(r) for r in V.read_versioned(spark, roots[0]).collect()
    ) == sorted(tuple(r) for r in V.read_versioned(spark, roots[1]).collect())

    def _meta(root, version):
        for _, p in V._manifests(root):
            with open(p) as fh:
                m = json.load(fh)
            if m.get("version") == version:
                return m["meta"]

    meta = _meta(roots[0], v1)
    assert meta["probe_files_scanned"] < meta["files_total"] == 6

    # refresh folds the merge's file surgery in (added staging files,
    # removed rewritten ones); the next auto merge still prunes and
    # still matches the plain twin
    rep2 = V.refresh_store_bloom(spark, roots[0])
    assert rep2["added"] > 0 and rep2["generation"] == "g000002"
    upd2 = upd.withColumn("o_totalprice", F.col("o_totalprice") + 1)
    v2 = V.merge_into(spark, roots[0], upd2, ["o_orderkey"], bloom="auto")
    V.merge_into(spark, roots[1], upd2, ["o_orderkey"])
    assert sorted(
        tuple(r) for r in V.read_versioned(spark, roots[0]).collect()
    ) == sorted(tuple(r) for r in V.read_versioned(spark, roots[1]).collect())
    meta2 = _meta(roots[0], v2)
    assert meta2["probe_files_scanned"] < meta2["files_total"]

    # 'auto' with a composite key the index does NOT fully cover:
    # quietly unpruned, never an error (log-stats pruning — r13, its
    # own test — disabled here so this leg pins the BLOOM behavior)
    os.environ["SPARK_GRAFT_MERGE_PROBE_KEYS"] = "0"
    try:
        v3 = V.merge_into(
            spark, roots[0], upd2, ["o_orderkey", "o_custkey"], bloom="auto"
        )
    finally:
        del os.environ["SPARK_GRAFT_MERGE_PROBE_KEYS"]
    assert "probe_files_scanned" not in _meta(roots[0], v3)

    # rebuild covering BOTH key columns: 'auto' now engages the tuple
    # prover for the composite key and still matches the plain twin
    V.build_store_bloom(
        spark, roots[0], ["o_orderkey", "o_custkey"], m_bits=1 << 14
    )
    upd3 = upd2.withColumn("o_totalprice", F.lit(7.0))
    v4 = V.merge_into(
        spark, roots[0], upd3, ["o_orderkey", "o_custkey"], bloom="auto"
    )
    V.merge_into(spark, roots[1], upd3, ["o_orderkey", "o_custkey"])
    assert "probe_files_scanned" in _meta(roots[0], v4)
    # (v3 re-merged rows the twin already carried, so content realigns)
    assert sorted(
        tuple(r) for r in V.read_versioned(spark, roots[0]).collect()
    ) == sorted(tuple(r) for r in V.read_versioned(spark, roots[1]).collect())


def test_snapshot_skip_index_from_log_stats(spark, tmp_path, monkeypatch):
    """Delta-style stats in the log (r10): commits record per-column
    footer stats in the manifest, so snapshot_skip_index assembles the
    pruning relation from the LOG with zero footer I/O — pinned by
    monkeypatching the footer pass to raise. Log-sourced equals
    footer-sourced bit-for-bit (same extraction function), survives
    checkpoint compaction with pre-checkpoint manifests deleted, falls
    back to exactly the stat-less files on a hand-stripped legacy
    manifest, and the pruned read stays exact."""
    import glob as _glob

    from aws_glue_data_catalog_replication_utility_spark.functions import (
        skipindex as SKI,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        scan_with_skip_index,
    )

    real_index_files = SKI._index_files
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    root = str(tmp_path / "t")
    V.append(
        orders.where("o_orderkey % 2 = 0").repartitionByRange(2, "o_orderkey"),
        root,
    )
    V.append(
        orders.where("o_orderkey % 2 = 1").repartitionByRange(2, "o_orderkey"),
        root,
    )

    want = sorted(
        tuple(r)
        for r in V.snapshot_skip_index(spark, root, source="footers").collect()
    )

    def no_footers(*a, **k):
        raise AssertionError("footer pass ran on a fully-stats'd log")

    monkeypatch.setattr(SKI, "_index_files", no_footers)
    idx = V.snapshot_skip_index(spark, root)  # auto: log only
    got = sorted(tuple(r) for r in idx.collect())
    assert got == want

    # the log-sourced index drives an exact pruned read (numeric,
    # string, and timestamp predicates all carried by manifest stats)
    cut = orders.selectExpr("percentile_approx(o_orderkey, 0.25) v").first().v
    preds = [("o_orderkey", "<=", int(cut)), ("o_orderstatus", "=", "O")]
    full = V.read_versioned(spark, root)
    got_df, info = scan_with_skip_index(spark, idx, preds)
    assert info["files_kept"] < info["files_total"] == 4
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(
            tuple,
            full.where(
                (F.col("o_orderkey") <= int(cut))
                & (F.col("o_orderstatus") == "O")
            ).collect(),
        )
    )

    # time travel: the v1 index covers only v1's files — still log-only
    idx1 = V.snapshot_skip_index(spark, root, version=1)
    assert idx1.select("file").distinct().count() == 2

    # checkpoint compaction carries the stats forward
    V.checkpoint(root)
    for p in _glob.glob(os.path.join(root, "_txlog", "v*.json")):
        os.unlink(p)
    got_ck = sorted(
        tuple(r) for r in V.snapshot_skip_index(spark, root).collect()
    )
    assert got_ck == want
    monkeypatch.setattr(SKI, "_index_files", real_index_files)

    # legacy manifest (pre-stats): strip file_stats from a NEW commit,
    # auto falls back to footers for exactly those files, result
    # identical to the full footer build
    v3 = V.append(
        orders.where("o_orderkey % 7 = 3").repartition(1), root
    )
    mp = os.path.join(root, "_txlog", f"v{v3:012d}.json")
    with open(mp) as fh:
        m = json.load(fh)
    del m["file_stats"]
    with open(mp, "w") as fh:
        json.dump(m, fh)
    calls = []

    def spy(spark_, files):
        calls.append(list(files))
        return real_index_files(spark_, files)

    monkeypatch.setattr(SKI, "_index_files", spy)
    got_mixed = sorted(
        tuple(r) for r in V.snapshot_skip_index(spark, root).collect()
    )
    monkeypatch.setattr(SKI, "_index_files", real_index_files)
    assert len(calls) == 1 and len(calls[0]) == 1  # exactly the legacy file
    want_mixed = sorted(
        tuple(r)
        for r in V.snapshot_skip_index(spark, root, source="footers").collect()
    )
    assert got_mixed == want_mixed


def test_timestamp_time_travel(spark, orders, tmp_path):
    """TIMESTAMP AS OF: commits record wall timestamps; reads resolve
    to the newest version at-or-before the target, accept epoch /
    ISO-8601 / datetime, raise before the first commit, and stay
    causal under writer clock skew (running-max discipline)."""
    import datetime
    import time

    root = str(tmp_path / "t")
    a = orders.where("o_orderkey % 2 = 0")
    b = orders.where("o_orderkey % 2 = 1")
    V.append(a, root)
    t_between = time.time()
    time.sleep(0.05)
    V.append(b, root)

    hist = V.history(root)
    assert all(h["ts"] is not None for h in hist)
    assert hist[0]["ts"] <= hist[1]["ts"]

    assert V.version_at_timestamp(root, t_between) == 1
    assert V.version_at_timestamp(root, time.time()) == 2
    # read surface: epoch float, ISO string, aware datetime
    assert _ids(V.read_versioned(spark, root, timestamp=t_between)) == _ids(a)
    iso = datetime.datetime.fromtimestamp(
        t_between, tz=datetime.timezone.utc
    ).isoformat()
    assert V.version_at_timestamp(root, iso) == 1
    dt = datetime.datetime.fromtimestamp(time.time(), datetime.timezone.utc)
    assert V.version_at_timestamp(root, dt) == 2

    with pytest.raises(ValueError, match="precedes the earliest"):
        V.version_at_timestamp(root, hist[0]["ts"] - 10)
    with pytest.raises(ValueError, match="not both"):
        V.read_versioned(spark, root, version=1, timestamp=t_between)


def test_timestamp_travel_legacy_and_skew(spark, orders, tmp_path):
    """Manifests without a recorded ts (pre-timestamp log) resolve via
    file mtime — Delta's own commit-time source; a LATER version whose
    recorded ts runs BEHIND an earlier one (writer clock skew) never
    resolves before it."""
    import time

    root = str(tmp_path / "t")
    V.append(orders.limit(10), root)
    V.append(orders.limit(20), root)
    mp1 = os.path.join(root, "_txlog", "v000000000001.json")
    mp2 = os.path.join(root, "_txlog", "v000000000002.json")
    with open(mp1) as fh:
        m1 = json.load(fh)
    t1 = m1.pop("ts")
    with open(mp1, "w") as fh:
        json.dump(m1, fh)  # legacy: no ts key -> mtime fallback
    os.utime(mp1, (t1, t1))
    assert V.version_at_timestamp(root, t1 + 1e-3) == 1
    assert V.version_at_timestamp(root, time.time()) == 2

    # clock skew: v2 stamped BEFORE v1's time — running max keeps
    # resolution causal: v2 never resolves ahead of v1 (its effective
    # time is adjusted UP to v1's, Delta's discipline)
    with open(mp2) as fh:
        m2 = json.load(fh)
    m2["ts"] = t1 - 100.0
    with open(mp2, "w") as fh:
        json.dump(m2, fh)
    with pytest.raises(ValueError, match="precedes the earliest"):
        V.version_at_timestamp(root, t1 - 50.0)  # raw v2 stamp is ignored
    assert V.version_at_timestamp(root, t1) == 2  # adjusted to v1's moment


def test_idempotent_txn_append(spark, orders, tmp_path):
    """Delta's txnAppId/txnVersion: a retried job (same app+version)
    is a no-op, a newer version applies, app ids are independent, and
    the applied-state survives checkpoint compaction of the manifests
    that carried it."""
    root = str(tmp_path / "t")
    part = orders.limit(10)
    assert V.append(part, root, txn_app_id="etl", txn_version=1) == 1
    # retry: skipped before staging, no new version
    assert V.append(part, root, txn_app_id="etl", txn_version=1) is None
    assert V.append(part, root, txn_app_id="etl", txn_version=0) is None
    assert len(V.history(root)) == 1
    # progress applies; another app is independent
    assert V.append(part, root, txn_app_id="etl", txn_version=2) == 2
    assert V.append(part, root, txn_app_id="other", txn_version=1) == 3
    assert V.last_txn_version(root, "etl") == 2
    with pytest.raises(ValueError, match="or neither"):
        V.append(part, root, txn_app_id="etl")

    # checkpoint summarizes txn state; delete the carrying manifests
    V.checkpoint(root)
    log = os.path.join(root, "_txlog")
    for n in sorted(os.listdir(log)):
        if n.startswith("v"):
            os.unlink(os.path.join(log, n))
    assert V.last_txn_version(root, "etl") == 2
    assert V.append(part, root, txn_app_id="etl", txn_version=2) is None
    assert V.append(part, root, txn_app_id="etl", txn_version=3) is not None


def test_optimize_incremental_small_file_binpack(spark, orders, tmp_path):
    """Incremental OPTIMIZE (small_file_bytes): only the small-file
    debt is rewritten — healthy files stay live BYTE-IDENTICAL, content
    is unchanged, the manifest audits the threshold, and a mixed-schema
    small tail is widened to the full-table LUB on rewrite."""
    root = str(tmp_path / "t")
    # one healthy file (full orders) + many tiny appends, one evolved
    V.append(orders.coalesce(1), root)
    for i in range(6):
        part = orders.limit(3).withColumn("o_totalprice", F.lit(float(i)))
        if i == 5:
            part = part.withColumn("tag", F.lit("gen2"))
        V.append(part.coalesce(1), root)

    live_before, _ = V._replay(root, None)
    sizes = {
        f: os.path.getsize(os.path.join(root, f)) for f in live_before
    }
    big = max(sizes, key=sizes.get)
    threshold = sizes[big]  # strictly-below: the big file survives
    before = sorted(
        tuple(r) for r in V.read_versioned(spark, root).collect()
    )

    v = V.optimize(spark, root, small_file_bytes=threshold)
    live_after, _ = V._replay(root, None)
    assert big in live_after  # untouched and still live
    assert os.path.getsize(os.path.join(root, big)) == sizes[big]
    assert len(live_after) < len(live_before)
    after = sorted(
        tuple(r) for r in V.read_versioned(spark, root).collect()
    )
    assert after == before
    with open(
        os.path.join(root, "_txlog", f"v{v:012d}.json")
    ) as fh:
        m = json.load(fh)
    assert m["action"] == "optimize"
    assert m["meta"]["small_file_bytes"] == threshold
    assert big not in m["removed"]

    # idempotent-ish: a second pass has at most one small file left
    assert V.optimize(spark, root, small_file_bytes=threshold) in (
        v, v + 1
    )
    # exclusivity with zorder
    with pytest.raises(ValueError, match="exclusive"):
        V.optimize(
            spark, root, zorder_by=["o_orderkey"],
            small_file_bytes=threshold,
        )


def test_merge_stream_batch_exactly_once_upsert(spark, orders, tmp_path):
    """Streaming MERGE sink: a micro-batch upserts as one atomic
    version; re-delivering the SAME batch id (the crash-replay window)
    merges nothing — MERGE does not commute with itself, so this guard
    is what makes at-least-once delivery safe. Marker rides the merge
    commit itself."""
    root = str(tmp_path / "t")
    V.append(orders, root)
    upd = orders.limit(5).withColumn("o_totalprice", F.lit(1.0))

    v = V.merge_stream_batch(spark, upd, 0, root, ["o_orderkey"], "q1")
    assert v == 2
    after = sorted(
        tuple(r) for r in V.read_versioned(spark, root).collect()
    )
    # replay: same batch id -> None, content unchanged
    assert V.merge_stream_batch(spark, upd, 0, root, ["o_orderkey"], "q1") is None
    assert sorted(
        tuple(r) for r in V.read_versioned(spark, root).collect()
    ) == after
    assert len(V.history(root)) == 2
    # a DIFFERENT query's batch 0 is not masked
    upd2 = orders.limit(5).withColumn("o_totalprice", F.lit(2.0))
    assert V.merge_stream_batch(
        spark, upd2, 0, root, ["o_orderkey"], "q2"
    ) == 3
    # progress applies
    assert V.merge_stream_batch(
        spark, upd, 1, root, ["o_orderkey"], "q1"
    ) == 4
    # empty batch: no version
    assert V.merge_stream_batch(
        spark, upd.where("o_orderkey < 0"), 2, root, ["o_orderkey"], "q1"
    ) is None


def test_prune_log_retention(spark, orders, tmp_path):
    """prune_log deletes only checkpoint-summarized manifests; replay,
    row counts, constraints and txn state all survive; manifests newer
    than the checkpoint are never touched; keep_last_manifests keeps an
    audit tail."""
    root = str(tmp_path / "t")
    V.append(orders.limit(10), root, txn_app_id="etl", txn_version=3)
    V.add_table_constraint(spark, root, "pos", "o_orderkey >= 0")
    V.append(orders.limit(20), root)
    # checkpoint-less: no-op
    assert V.prune_log(root) == {
        "manifests_removed": 0, "checkpoint_version": None
    }
    V.checkpoint(root)
    V.append(orders.limit(5), root)  # post-checkpoint: must survive

    rep = V.prune_log(root, keep_last_manifests=1)
    assert rep["manifests_removed"] == 2  # v1, v2 gone; v3 kept as tail
    ms = [v for v, _ in V._manifests(root)]
    assert ms == [3, 4]
    n, info = V.count_versioned(spark, root)
    assert n == 35 and info["files_scanned"] == 0
    assert V.table_constraints(root) == {"pos": "o_orderkey >= 0"}
    assert V.last_txn_version(root, "etl") == 3
    # idempotent second pass removes the kept tail if not protected
    assert V.prune_log(root)["manifests_removed"] == 1
    assert V.read_versioned(spark, root).count() == 35


def test_stream_replay_guard_survives_prune_log(spark, orders, tmp_path):
    """The exactly-once window that checkpoint+prune_log used to
    reopen: after the documented retention cron deletes the manifests
    carrying the stream batch markers, a replayed micro-batch (crash
    between sink commit and Spark checkpoint write) must STILL be
    recognized — the checkpoint body summarizes the newest batch id
    per query and the replay walk falls back to it."""
    root = str(tmp_path / "t")
    b = orders.limit(5)
    assert V.append_stream_batch(b, 7, root, query_id="qA") == 1
    assert V.merge_stream_batch(spark, b, 3, root, ["o_orderkey"], "qB") == 2
    V.checkpoint(root)
    assert V.prune_log(root)["manifests_removed"] == 2
    assert V._manifests(root) == []  # the markers' manifests are gone
    # replays of the pruned-marker batches are still recognized
    assert V.append_stream_batch(b, 7, root, query_id="qA") is None
    assert (
        V.merge_stream_batch(spark, b, 3, root, ["o_orderkey"], "qB")
        is None
    )
    assert V.read_versioned(spark, root).count() == 5
    assert V._manifests(root) == []  # no duplicate version was added
    # older re-deliveries skip too (ids are monotonic per query)...
    assert V.append_stream_batch(b, 6, root, query_id="qA") is None
    # ...and progress still applies, then survives the NEXT prune
    assert V.append_stream_batch(orders.limit(3), 8, root, query_id="qA") == 3
    V.checkpoint(root)
    V.prune_log(root)
    assert V.append_stream_batch(orders.limit(3), 8, root, query_id="qA") is None
    assert V.append_stream_batch(orders.limit(3), 9, root, query_id="qA") == 4


def test_stream_replay_guard_prune_legacy_and_unscoped(
    spark, orders, tmp_path
):
    """Checkpoint-summarized stream state keeps the legacy rules: an
    UNSCOPED query (one-stream-per-store discipline) skips ids at or
    below the summarized newest; a SCOPED query over summarized legacy
    history skips only the exact newest legacy id (the upgrade replay)
    — a fresh query's restarting ids are not masked wholesale."""
    root = str(tmp_path / "t")
    b = orders.limit(4)
    assert V.append_stream_batch(b, 3, root) == 1  # legacy / unscoped
    assert V.append_stream_batch(b, 4, root) == 2
    V.checkpoint(root)
    V.prune_log(root)
    # unscoped replay of the pruned newest id: skipped
    assert V.append_stream_batch(b, 4, root) is None
    # scoped upgrade replay of the newest legacy id: skipped
    assert V.append_stream_batch(b, 4, root, query_id="ckpt") is None
    # a fresh scoped query restarting at 0 is NOT masked
    assert V.append_stream_batch(b, 0, root, query_id="fresh") == 3


def test_prune_log_keep_more_than_prunable_keeps_all(
    spark, orders, tmp_path
):
    """keep_last_manifests larger than the prunable count keeps them
    ALL (a negative slice stop used to delete the oldest instead)."""
    root = str(tmp_path / "t")
    V.append(orders.limit(5), root)
    V.append(orders.limit(5), root)
    V.checkpoint(root)
    rep = V.prune_log(root, keep_last_manifests=5)
    assert rep["manifests_removed"] == 0
    assert [v for v, _ in V._manifests(root)] == [1, 2]


def test_txn_idempotence_rechecked_inside_commit(spark, orders, tmp_path):
    """The check-then-act race: two retries of one (txnAppId,
    txnVersion) both pass the caller's pre-check; the loser must back
    out INSIDE _commit when it lists the winner's manifest — not take
    the next version cleanly and duplicate the 'idempotent' write."""
    root = str(tmp_path / "t")
    df = orders.limit(5)
    # both writers staged before either committed (the race window)
    added1 = V._stage_write(df, root)
    added2 = V._stage_write(df, root)
    meta = {"txn_app_id": "job", "txn_version": 1}
    assert V._commit(
        root, "append", added1, [], df.schema.json(), dict(meta)
    ) == 1
    # the loser re-reads txn state from the fresh listing and backs out
    assert V._commit(
        root, "append", added2, [], df.schema.json(), dict(meta)
    ) is None
    assert len(V.history(root)) == 1
    for f in added2:  # its staged files were unlinked, not orphaned
        assert not os.path.exists(os.path.join(root, f))
    assert V.read_versioned(spark, root).count() == 5


def test_retired_q12_vstore_lifecycle_duckdb_parity(spark):
    """q12_vstore_lifecycle left the 50-slot registry in r11 (the
    vstore FORMAT read path took the slot); the retired-slot
    discipline keeps its DuckDB oracle running HERE bit-exactly, so
    the library lifecycle (append -> MERGE -> DELETE -> per-version
    time travel) stays value-checked alongside the format slot."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.queries import (
        RETIRED_ORACLES,
        q12_vstore_lifecycle,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    got = sorted(tuple(r) for r in q12_vstore_lifecycle(spark, sf).collect())
    want = sorted(
        tuple(r)
        for r in con.sql(RETIRED_ORACLES["q12_vstore_lifecycle"]).fetchall()
    )
    assert got == want
