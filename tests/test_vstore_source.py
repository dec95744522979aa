"""vstore as a Spark format (Python Data Source API): batch read with
time travel + log-stats filter pushdown, batch write through the
commit protocol, streaming read over version offsets, SQL `USING`
surface. The pruning tests are PROOF-driven: the file the stats
exclude is physically corrupted, so a scan that failed to prune
cannot return — the same RAISES-if-not-pruned discipline as q13."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from aws_glue_data_catalog_replication_utility_spark import versioned as V
from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
    _prune_with_log_stats,
    _translate_filters,
    register_vstore_source,
)


@pytest.fixture(scope="module")
def vsrc_spark(spark):
    register_vstore_source(spark)
    return spark


def _mk_evolved_store(spark, root):
    """gen1: (k int, x float); gen2: (k bigint, x double, s string)."""
    g1 = spark.range(0, 100).selectExpr(
        "cast(id as int) as k", "cast(id * 1.5 as float) as x"
    )
    V.append(g1, root)
    g2 = spark.range(100, 200).selectExpr(
        "cast(id as bigint) as k",
        "cast(id * 1.5 as double) as x",
        "concat('s', id) as s",
    )
    V.append(g2, root)


def test_batch_read_matches_read_versioned(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_evolved_store(vsrc_spark, root)
    got = vsrc_spark.read.format("vstore").load(root)
    lib = V.read_versioned(vsrc_spark, root)
    assert got.schema == lib.schema  # LUB: bigint, double, string
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, lib.collect())
    )


def test_batch_read_time_travel(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_evolved_store(vsrc_spark, root)
    v1 = vsrc_spark.read.format("vstore").option("version", "1").load(root)
    assert v1.columns == ["k", "x"]
    assert v1.schema["k"].dataType.simpleString() == "int"
    assert v1.count() == 100
    lib = V.read_versioned(vsrc_spark, root, 1)
    assert sorted(map(tuple, v1.collect())) == sorted(
        map(tuple, lib.collect())
    )


def test_batch_read_timestamp_as_of(vsrc_spark, tmp_path):
    """TIMESTAMP AS OF through the format: schema AND rows resolve to
    the version committed at-or-before the option's time."""
    import time

    root = str(tmp_path / "store")
    g1 = vsrc_spark.range(0, 100).selectExpr(
        "cast(id as int) as k", "cast(id * 1.5 as float) as x"
    )
    V.append(g1, root)
    t_between = time.time()
    time.sleep(0.05)
    _mk_evolved_store(vsrc_spark, str(tmp_path / "other"))  # spacing work
    g2 = vsrc_spark.range(100, 200).selectExpr(
        "cast(id as int) as k", "cast(id * 1.5 as float) as x"
    )
    V.append(g2, root)

    asof = (
        vsrc_spark.read.format("vstore")
        .option("timestampAsOf", str(t_between))
        .load(root)
    )
    assert asof.count() == 100
    lib = V.read_versioned(vsrc_spark, root, timestamp=t_between)
    assert sorted(map(tuple, asof.collect())) == sorted(
        map(tuple, lib.collect())
    )
    with pytest.raises(Exception, match="exclusive"):
        vsrc_spark.read.format("vstore").option(
            "timestampAsOf", str(t_between)
        ).option("version", "1").load(root).count()


def test_sql_using_surface(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_evolved_store(vsrc_spark, root)
    vsrc_spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW vsrc_sql USING vstore "
        f"OPTIONS (path '{root}')"
    )
    n = vsrc_spark.sql(
        "SELECT count(*) AS n FROM vsrc_sql WHERE k >= 150"
    ).collect()[0].n
    assert n == 50


def _range_laid_store(spark, root):
    """Three single-file appends with disjoint k ranges; returns the
    live file whose k range is [200, 300)."""
    for lo in (0, 100, 200):
        V.append(
            spark.range(lo, lo + 100)
            .selectExpr("id as k", "concat('v', id) as s")
            .coalesce(1),
            root,
        )
    import pyarrow.parquet as pq

    live, _ = V._replay(root, None)
    for f in live:
        p = os.path.join(root, f)
        if pq.read_metadata(p).row_group(0).column(0).statistics.min == 200:
            return p
    raise AssertionError("no file with min k == 200")


def test_pushdown_prunes_files_e2e(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    hot = _range_laid_store(vsrc_spark, root)
    with open(hot, "wb") as fh:
        fh.write(b"garbage")  # a scan that opens this file dies
    got = (
        vsrc_spark.read.format("vstore")
        .option("pruneFiles", "true")  # opt-in (r11): see reader docs
        .load(root)
        .where("k < 150")
        .selectExpr("count(*) AS n", "sum(k) AS s")
        .collect()[0]
    )
    assert (got.n, got.s) == (150, sum(range(150)))
    # the control: without the predicate the corrupted file IS opened
    with pytest.raises(Exception):
        vsrc_spark.read.format("vstore").load(root).count()


def test_pushdown_string_and_notnull(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    hot = _range_laid_store(vsrc_spark, root)
    with open(hot, "wb") as fh:
        fh.write(b"garbage")
    # string equality: 'v100' lies outside every file but the middle one
    got = (
        vsrc_spark.read.format("vstore")
        .option("pruneFiles", "true")
        .load(root)
        .where("s = 'v100'")
        .collect()
    )
    assert [(r.k, r.s) for r in got] == [(100, "v100")]


def test_prune_mirror_matches_prune_files(vsrc_spark, tmp_path):
    """The data source's pure-Python pruning must agree with the
    DataFrame implementation (skipindex.prune_files over the
    log-sourced snapshot index) predicate for predicate."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        prune_files,
    )

    root = str(tmp_path / "store")
    _range_laid_store(vsrc_spark, root)
    live, rows, stats, _ = V._replay_stats(root, None)
    idx = V.snapshot_skip_index(vsrc_spark, root)
    cases = [
        [("k", "=", 150)],
        [("k", "<", 100)],
        [("k", ">=", 250)],
        [("k", ">", 99), ("k", "<", 200)],
        [("s", "=", "v0")],
        [("missing_col", "=", 1)],
        [],
    ]
    for preds in cases:
        py_kept = set(
            _prune_with_log_stats(live, rows, stats, preds, [])
        )
        df_kept = {
            os.path.relpath(r.file, root)
            for r in prune_files(idx, preds).collect()
        }
        assert py_kept == df_kept, preds


def test_translate_filters_shapes():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        IsNull,
        LessThanOrEqual,
        StringStartsWith,
    )

    preds, notnull, ins = _translate_filters(
        [
            EqualTo(("k",), 5),
            GreaterThan(("x",), 1.5),
            LessThanOrEqual(("s",), "zz"),
            IsNotNull(("k",)),
            IsNull(("s",)),  # unsupported for pruning: ignored
            EqualTo(("a", "b"), 1),  # nested: ignored
            StringStartsWith(("s",), "ab"),
            In(("k",), (1, 7, 9)),
            In(("k",), (1, None)),  # null in list: conservative skip
        ]
    )
    assert preds == [
        ("k", "=", 5),
        ("x", ">", 1.5),
        ("s", "<=", "zz"),
        ("s", ">=", "ab"),
        ("s", "<", "ac"),  # bump(p): exact prefix upper bound
    ]
    assert notnull == ["k"]
    assert ins == [("k", [1, 7, 9])]


def test_pushdown_in_and_startswith_prune(vsrc_spark, tmp_path):
    """IN-lists and prefix predicates prune: the stats-excluded file
    is corrupted, so a scan that failed to prune cannot pass."""
    root = str(tmp_path / "store")
    hot = _range_laid_store(vsrc_spark, root)  # k ranges per file:
    with open(hot, "wb") as fh:  # [0,100) [100,200) [200,300)*corrupt
        fh.write(b"garbage")
    got = (
        vsrc_spark.read.format("vstore")
        .option("pruneFiles", "true")
        .load(root)
        .where("k in (5, 105, 199)")
        .collect()
    )
    assert sorted(r.k for r in got) == [5, 105, 199]
    # prefix: only 'v1*' strings (k 1, 10-19, 100-199 files 1+2)
    n = (
        vsrc_spark.read.format("vstore")
        .option("pruneFiles", "true")
        .load(root)
        .where("s like 'v1%'")
        .count()
    )
    assert n == 1 + 10 + 100
    # an IN list with a value in the corrupted file's range must still
    # open it — and therefore fail (prune is proof-driven, not greedy)
    with pytest.raises(Exception):
        vsrc_spark.read.format("vstore").option("pruneFiles", "true").load(
            root
        ).where("k in (5, 250)").count()


def test_format_write_append_and_overwrite(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    df = vsrc_spark.range(0, 50).selectExpr("id as k", "id * 2 as v")
    df.write.format("vstore").mode("append").save(root)
    df2 = vsrc_spark.range(50, 80).selectExpr("id as k", "id * 2 as v")
    df2.write.format("vstore").mode("append").save(root)
    lib = V.read_versioned(vsrc_spark, root)
    assert lib.count() == 80
    assert [h["action"] for h in V.history(root)] == ["append", "append"]
    # stats land in the log for DS-written files: every live file has
    # recorded rows+stats (no footer fallback needed)
    live, rows, stats, _ = V._replay_stats(root, None)
    assert set(rows) == set(live) and set(stats) == set(live)
    # overwrite = one atomic snapshot swap
    df2.write.format("vstore").mode("overwrite").save(root)
    assert V.read_versioned(vsrc_spark, root).count() == 30
    h = V.history(root)[-1]
    assert h["action"] == "overwrite" and h["n_removed"] > 0
    # no staging debris left behind
    assert not os.path.exists(os.path.join(root, ".staging")) or not os.listdir(
        os.path.join(root, ".staging")
    )


def test_format_write_then_format_read_roundtrip(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    df = vsrc_spark.range(0, 25).selectExpr(
        "id as k",
        "id % 2 = 0 as b",
        "concat('r', id) as s",
        "date_add(date'2026-01-01', cast(id as int)) as d",
    )
    df.write.format("vstore").mode("append").save(root)
    back = vsrc_spark.read.format("vstore").load(root)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def _run_stream(spark, root, ckpt, out, ignore_changes=False):
    r = (
        spark.readStream.format("vstore")
        .option("path", root)
        .option("startingVersion", "1")
    )
    if ignore_changes:
        r = r.option("ignoreChanges", "true")
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_source_exactly_once_and_change_guard(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)
    _run_stream(vsrc_spark, root, ckpt, out)
    assert vsrc_spark.read.parquet(out).count() == 10
    # second run over the SAME checkpoint streams only the delta
    V.append(vsrc_spark.range(10, 25).selectExpr("id as k"), root)
    _run_stream(vsrc_spark, root, ckpt, out)
    got = vsrc_spark.read.parquet(out)
    assert got.count() == 25
    assert {r.k for r in got.collect()} == set(range(25))
    # a data-changing commit fails the stream with a clear error...
    V.delete_where(vsrc_spark, root, "k < 5")
    with pytest.raises(Exception, match="data-changing commit"):
        _run_stream(vsrc_spark, root, ckpt, out)
    # ...and ignoreChanges resumes past it (this delete dropped two
    # fully-matching files: no survivors re-added, so no duplicates)
    _run_stream(vsrc_spark, root, ckpt, out, ignore_changes=True)
    assert vsrc_spark.read.parquet(out).count() == 25


def _drain(reader, s, e, names):
    """Plan partitions for (s, e] on `reader` and read them the way an
    executor would; returns the rows as tuples in `names` order."""
    rows = []
    for p in reader.partitions({"version": s}, {"version": e}):
        for b in reader.read(p):
            for rec in b.to_pylist():
                rows.append(tuple(rec[n] for n in names))
    return rows


def test_stream_ignore_deletes_vs_ignore_changes(vsrc_spark, tmp_path):
    """ignoreDeletes tolerates delete-ONLY commits (nothing re-added,
    no duplicate risk) but still fails on rewrites; ignoreChanges
    tolerates both. Driven on the reader directly — the guard now
    fires at PARTITION PLANNING (driver, from the log), before any
    data file is touched."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    V.append(
        vsrc_spark.range(0, 10).selectExpr("id as k").coalesce(1), root
    )  # v1: one file
    V.append(
        vsrc_spark.range(10, 20).selectExpr("id as k").coalesce(1), root
    )  # v2
    V.delete_where(vsrc_spark, root, "k < 10")  # v3: drops v1's file whole
    V.delete_where(vsrc_spark, root, "k = 15")  # v4: rewrites v2's file
    planned = V.read_versioned(vsrc_spark, root).schema

    def rdr(**opts):
        return _VStoreStreamReader({"path": root, **opts}, planned)

    # plain reader fails at the delete-only commit, naming ignoreDeletes
    with pytest.raises(ValueError, match="ignoreDeletes"):
        rdr().partitions({"version": 2}, {"version": 4})
    # ignoreDeletes passes v3 but still fails v4 (re-added rows)
    with pytest.raises(ValueError, match="ignoreChanges"):
        rdr(ignoreDeletes="true").partitions({"version": 2}, {"version": 4})
    # ignoreChanges streams v4's survivor rows
    rows = _drain(rdr(ignoreChanges="true"), 2, 4, ["k"])
    assert sorted(k for (k,) in rows) == [k for k in range(10, 20) if k != 15]


def test_stream_starting_version_zero_replays_nothing_new(
    vsrc_spark, tmp_path
):
    """Default (no startingVersion): offsets start at the CURRENT
    version, so pre-existing history does not stream."""
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)
    q = (
        vsrc_spark.readStream.format("vstore")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the sink may not even have a _spark_metadata data file yet
    try:
        n = vsrc_spark.read.parquet(out).count()
    except Exception:
        n = 0
    assert n == 0


@pytest.mark.parametrize(
    "opt,val,want_batches",
    [("maxVersionsPerTrigger", "1", 4), ("maxRowsPerTrigger", "15", 4),
     ("maxRowsPerTrigger", "25", 2)],
)
def test_stream_rate_limiting(vsrc_spark, tmp_path, opt, val, want_batches):
    """Delta's maxFilesPerTrigger family on the vstore source: a deep
    backlog drains across MULTIPLE capped micro-batches (offset files
    prove the pacing) and every row still arrives exactly once."""
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    V.append(vsrc_spark.range(0, 1).selectExpr("id as k"), root)  # base
    for i in range(4):
        V.append(
            vsrc_spark.range(i * 10, i * 10 + 10).selectExpr("id as k"),
            root,
        )
    q = (
        vsrc_spark.readStream.format("vstore")
        .option("path", root)
        .option("startingVersion", "2")  # the 4 backlog appends
        .option(opt, val)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    # a capped batch admits only part of the backlog, so drain over
    # successive triggers (availableNow snapshots ONE latestOffset as
    # "all available" — the Python stream-reader API has no admission
    # control; the documented contract is pacing under continuous
    # triggers)
    import time

    got: list = []
    for _ in range(240):
        time.sleep(0.5)
        try:
            got = sorted(r.k for r in vsrc_spark.read.parquet(out).collect())
        except Exception:
            got = []
        if got == list(range(40)):
            break
    q.stop()
    assert got == list(range(40))
    n_batches = len([
        f for f in os.listdir(os.path.join(ckpt, "offsets"))
        if not f.startswith(".")
    ])
    assert n_batches >= want_batches  # backlog drained in capped steps


def test_stream_rate_limit_cap_never_starves(vsrc_spark, tmp_path):
    """A single commit bigger than maxRowsPerTrigger still drains —
    the cap always admits at least one version."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 100).selectExpr("id as k"), root)
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    r = _VStoreStreamReader(
        {"path": root, "maxRowsPerTrigger": "5", "startingVersion": "1"},
        vsrc_spark.range(1).selectExpr("id as k").schema,
    )
    assert r._capped_end(0, 1) == 1


def test_stream_sink_commits_versions_exactly_once(vsrc_spark, tmp_path):
    """File stream -> vstore streaming sink: each micro-batch is one
    atomic version with the batch id in the manifest meta; re-running
    the finished query over the same checkpoint adds nothing."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "store")
    os.makedirs(src)
    vsrc_spark.range(0, 20).selectExpr("id as k").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run():
        q = (
            vsrc_spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("vstore")
            .option("path", root)
            .option("queryId", ckpt)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert V.read_versioned(vsrc_spark, root).count() == 20
    h1 = V.history(root)
    assert all(e["action"] == "append" for e in h1)
    metas = []
    for _, p in V._manifests(root):
        metas.append(json.load(open(p)).get("meta", {}))
    assert all("batch_id" in m and m.get("query_id") == ckpt for m in metas)
    # replay the whole query over the same checkpoint: nothing new
    run()
    assert V.read_versioned(vsrc_spark, root).count() == 20
    assert len(V.history(root)) == len(h1)
    # a SECOND batch of input streams through incrementally
    vsrc_spark.range(20, 30).selectExpr("id as k").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert V.read_versioned(vsrc_spark, root).count() == 30


def test_stream_sink_replay_guard_direct(vsrc_spark, tmp_path):
    """The sink's commit() skips an epoch whose batch id the log
    already carries (the crash-between-sink-and-checkpoint window),
    and the replayed epoch's staged files are removed."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _StagedFiles,
        _VStoreStreamWriter,
    )

    root = str(tmp_path / "store")
    df = vsrc_spark.range(0, 5).selectExpr("id as k")
    w = _VStoreStreamWriter({"path": root, "queryId": "q1"}, df.schema, False)
    import pyarrow as pa

    def stage(values):
        batch = pa.RecordBatch.from_pydict({"k": values})
        return w.write(iter([batch]))

    m = stage([1, 2, 3])
    w.commit([m], batchId=0)
    assert V.read_versioned(vsrc_spark, root).count() == 3
    # replayed epoch 0: skipped, staged file cleaned up
    m2 = stage([1, 2, 3])
    w.commit([m2], batchId=0)
    assert V.read_versioned(vsrc_spark, root).count() == 3
    assert not os.path.exists(os.path.join(root, m2.rels[0]))
    assert len(V.history(root)) == 1
    # epoch 1 lands
    w.commit([stage([4, 5])], batchId=1)
    assert V.read_versioned(vsrc_spark, root).count() == 5
    # abort drops staged files without committing
    m3 = stage([9])
    w.abort([m3], batchId=2)
    assert not os.path.exists(os.path.join(root, m3.rels[0]))
    assert len(V.history(root)) == 2


def test_stream_sink_rejects_complete_mode(vsrc_spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamWriter,
    )

    df = vsrc_spark.range(0, 1).selectExpr("id as k")
    with pytest.raises(ValueError, match="append mode only"):
        _VStoreStreamWriter(
            {"path": str(tmp_path / "s")}, df.schema, True
        )


def test_format_to_format_pipeline(vsrc_spark, tmp_path):
    """vstore stream source -> vstore stream sink: an incremental
    store-to-store replication loop built entirely from the format."""
    src_root = str(tmp_path / "src_store")
    dst_root = str(tmp_path / "dst_store")
    ckpt = str(tmp_path / "ckpt")
    V.append(vsrc_spark.range(0, 12).selectExpr("id as k"), src_root)

    def pump():
        q = (
            vsrc_spark.readStream.format("vstore")
            .option("path", src_root)
            .option("startingVersion", "1")
            .load()
            .writeStream.format("vstore")
            .option("path", dst_root)
            .option("queryId", ckpt)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    pump()
    assert V.read_versioned(vsrc_spark, dst_root).count() == 12
    V.append(vsrc_spark.range(12, 20).selectExpr("id as k"), src_root)
    pump()
    got = V.read_versioned(vsrc_spark, dst_root)
    assert got.count() == 20
    assert {r.k for r in got.collect()} == set(range(20))


def test_partition_packing_row_budget(vsrc_spark, tmp_path):
    """Kept files pack into row-budgeted input partitions: many small
    files never become one task per file unless asked."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreBatchReader,
    )

    root = str(tmp_path / "store")
    # 8 files x 100 rows
    # exactly 8 source partitions of 100 rows each — range(n).repartition(8)
    # round-robins from defaultParallelism-many slices, so file row counts
    # varied with the test session's core count (uneven 800/8 packing)
    V.append(vsrc_spark.range(0, 800, 1, 8).selectExpr("id as k"), root)
    schema = V.read_versioned(vsrc_spark, root).schema

    def n_parts(**opts):
        r = _VStoreBatchReader({"path": root, **opts}, schema)
        parts = r.partitions()
        assert sum(len(p.files) for p in parts) == 8
        return len(parts)

    assert n_parts() == 1  # default budget swallows 800 rows
    assert n_parts(rowsPerPartition="200") == 4
    assert n_parts(rowsPerPartition="0") == 8  # opt out: per-file
    # values still exact under packing
    got = (
        vsrc_spark.read.format("vstore")
        .option("rowsPerPartition", "200")
        .load(root)
    )
    assert got.count() == 800
    assert {r.k for r in got.collect()} == set(range(800))


def _multiset(rows):
    from collections import Counter

    return Counter(tuple(r) for r in rows)


def test_cdf_batch_read_apply_law(vsrc_spark, tmp_path):
    """changesFrom/changesTo: applying the file-level CDC to the
    from-predecessor snapshot reproduces the to snapshot —
    multiset(v_from-1) + inserts - deletes == multiset(v_to)."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)  # v1
    V.append(vsrc_spark.range(10, 20).selectExpr("id as k"), root)  # v2
    V.delete_where(vsrc_spark, root, "k % 2 = 0")  # v3
    V.append(vsrc_spark.range(20, 24).selectExpr("id as k"), root)  # v4

    cdf = (
        vsrc_spark.read.format("vstore")
        .option("changesFrom", "2")
        .option("changesTo", "4")
        .load(root)
    )
    assert cdf.columns == ["k", "_change", "_commit_version"]
    rows = cdf.collect()
    assert {r._commit_version for r in rows} <= {2, 3, 4}
    base = _multiset(
        (r.k,) for r in V.read_versioned(vsrc_spark, root, 1).collect()
    )
    for r in sorted(rows, key=lambda r: r._commit_version):
        if r._change == "insert":
            base[(r.k,)] += 1
        else:
            base[(r.k,)] -= 1
    head = _multiset(
        (r.k,) for r in V.read_versioned(vsrc_spark, root, 4).collect()
    )
    assert +base == head
    # v2's inserts alone are exactly the appended rows
    ins2 = [
        r.k for r in rows if r._commit_version == 2 and r._change == "insert"
    ]
    assert sorted(ins2) == list(range(10, 20))
    # the delete shows the REMOVED files' rows as deletes (file-level:
    # survivors re-inserted)
    assert any(r._change == "delete" and r._commit_version == 3 for r in rows)


def test_cdf_vacuumed_range_raises(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)
    V.overwrite(vsrc_spark.range(10, 15).selectExpr("id as k"), root)
    V.vacuum(root, keep_last=1, retention_seconds=0.0)
    with pytest.raises(Exception, match="vacuum already reclaimed"):
        vsrc_spark.read.format("vstore").option("changesFrom", "1").load(
            root
        ).count()


def test_cdf_survives_checkpoint_compaction(vsrc_spark, tmp_path):
    """A checkpoint below the range seeds file origins, so the change
    feed still resolves deletes of files whose adding manifests were
    compacted away; a range whose OWN manifests are gone raises."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)  # v1
    V.append(vsrc_spark.range(10, 20).selectExpr("id as k"), root)  # v2
    V.checkpoint(root)  # c2
    V.delete_where(vsrc_spark, root, "k < 3")  # v3: removes v1-era files
    # compact: drop the pre-checkpoint manifests
    for v, p in V._manifests(root):
        if v <= 2:
            os.unlink(p)
    cdf = (
        vsrc_spark.read.format("vstore").option("changesFrom", "3").load(root)
    )
    rows = cdf.collect()
    dels = _multiset((r.k,) for r in rows if r._change == "delete")
    ins = _multiset((r.k,) for r in rows if r._change == "insert")
    # file-level: deleted files' FULL contents stream as deletes,
    # survivors re-insert; net = rows 0..2 gone
    net = ins.copy()
    net.subtract(dels)
    assert {k for (k,), c in net.items() if c < 0} == {0, 1, 2}
    # the compacted-away range itself is unreconstructable
    with pytest.raises(Exception, match="compaction deleted"):
        vsrc_spark.read.format("vstore").option("changesFrom", "1").load(
            root
        ).count()


def test_cdf_option_conflicts(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 5).selectExpr("id as k"), root)
    with pytest.raises(Exception, match="exclusive"):
        vsrc_spark.read.format("vstore").option("changesFrom", "1").option(
            "version", "1"
        ).load(root).count()
    with pytest.raises(Exception, match="invalid change range"):
        vsrc_spark.read.format("vstore").option("changesFrom", "7").load(
            root
        ).count()


def test_stream_schema_evolution_guard(vsrc_spark, tmp_path):
    """A mid-run evolved append (new column the planned schema lacks)
    fails the reader with a restart hint instead of silently dropping
    the column; a restarted/fresh query plans the widened schema. (A
    query RESTART re-calls schema(), so only the mid-run window needs
    the guard — exercised on the reader directly.)"""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 5).selectExpr("id as k"), root)
    planned = V.read_versioned(vsrc_spark, root).schema  # (k)
    rdr = _VStoreStreamReader({"path": root, "startingVersion": "1"}, planned)
    assert len(_drain(rdr, 0, 1, ["k"])) == 5
    # the table evolves while the query is running: PLANNING raises
    # (from the manifest's recorded schema — no data file opened)
    V.append(
        vsrc_spark.range(5, 8).selectExpr("id as k", "id * 2 as extra"), root
    )
    with pytest.raises(ValueError, match="evolved mid-stream"):
        rdr.partitions({"version": 1}, {"version": 2})
    # a fresh query (schema re-read) sees the widened schema
    df = (
        vsrc_spark.readStream.format("vstore")
        .option("path", root)
        .option("startingVersion", "1")
        .load()
    )
    assert df.columns == ["k", "extra"]


def test_reader_errors(vsrc_spark, tmp_path):
    with pytest.raises(Exception, match="no versioned table"):
        vsrc_spark.read.format("vstore").load(
            str(tmp_path / "nostore")
        ).count()


def test_batch_writer_idempotent_txn(vsrc_spark, tmp_path):
    """txnAppId/txnVersion through the format writer: the retried
    write publishes nothing, a newer version lands."""
    root = str(tmp_path / "store")
    df = vsrc_spark.range(0, 10).selectExpr("id as k")
    w = (
        df.write.format("vstore").mode("append")
        .option("txnAppId", "job").option("txnVersion", "1")
    )
    w.save(root)
    assert V.read_versioned(vsrc_spark, root).count() == 10
    w.save(root)  # retry: no-op
    assert V.read_versioned(vsrc_spark, root).count() == 10
    assert len(V.history(root)) == 1
    (
        df.write.format("vstore").mode("append")
        .option("txnAppId", "job").option("txnVersion", "2")
        .save(root)
    )
    assert V.read_versioned(vsrc_spark, root).count() == 20
    with pytest.raises(Exception, match="or neither"):
        df.write.format("vstore").mode("append").option(
            "txnAppId", "job"
        ).save(root)


def test_stream_change_feed_replays_inserts_and_deletes(
    vsrc_spark, tmp_path
):
    """Streaming CDF (readChangeFeed): every commit streams as CDC
    rows — a delete_where yields deletes of the removed files' rows
    plus survivor re-inserts — and the apply law holds: inserts minus
    deletes (as multisets) reconstructs the final snapshot from zero.
    A checkpointed rerun adds nothing (exactly-once)."""
    from collections import Counter

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    V.append(
        vsrc_spark.range(0, 100).selectExpr("id as k", "id * 2 as w"), root
    )
    V.append(
        vsrc_spark.range(100, 150).selectExpr("id as k", "id * 2 as w"),
        root,
    )
    V.delete_where(vsrc_spark, root, "k % 10 = 0")
    V.append(
        vsrc_spark.range(150, 160).selectExpr("id as k", "id * 2 as w"),
        root,
    )

    def run():
        q = (
            vsrc_spark.readStream.format("vstore")
            .option("path", root)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run()
    feed = vsrc_spark.read.parquet(out)
    assert set(feed.columns) == {"k", "w", "_change", "_commit_version"}
    acc: Counter = Counter()
    for r in feed.collect():
        if r._change == "insert":
            acc[(r.k, r.w)] += 1
        else:
            acc[(r.k, r.w)] -= 1
    want = Counter(
        (r.k, r.w) for r in V.read_versioned(vsrc_spark, root).collect()
    )
    assert {kv: n for kv, n in acc.items() if n} == dict(want)
    # the delete commit really streamed deletions
    assert feed.where("_change = 'delete'").count() > 0

    n1 = feed.count()
    run()  # checkpointed rerun: nothing new
    assert vsrc_spark.read.parquet(out).count() == n1


def test_read_change_feed_is_stream_only(vsrc_spark, tmp_path):
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(3).selectExpr("id as k"), root)
    with pytest.raises(Exception, match="streaming option"):
        vsrc_spark.read.format("vstore").option(
            "readChangeFeed", "true"
        ).load(root).count()
    with pytest.raises(Exception, match="exclusive"):
        vsrc_spark.readStream.format("vstore").option(
            "readChangeFeed", "true"
        ).option("version", "1").load(root)


def test_stream_planning_never_reads_data_bytes(vsrc_spark, tmp_path):
    """The 100x-scale contract of the partition-based stream reader:
    offset computation and partition planning consume manifest JSON
    ONLY. Proof: corrupt EVERY data file in the store — initialOffset,
    latestOffset (capped), partitions() and the evolution/change
    guards all still succeed; only read() (the executor path) dies."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamCDFReader,
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)
    V.append(vsrc_spark.range(10, 30).selectExpr("id as k"), root)
    planned = V.read_versioned(vsrc_spark, root).schema
    live, _ = V._replay(root, None)
    for f in live:  # every data byte is now garbage
        with open(os.path.join(root, f), "wb") as fh:
            fh.write(b"garbage")

    rdr = _VStoreStreamReader(
        {"path": root, "startingVersion": "1", "maxRowsPerTrigger": "10"},
        planned,
    )
    assert rdr.initialOffset() == {"version": 0}
    assert rdr.latestOffset() == {"version": 1}  # row cap planned from log
    parts = rdr.partitions({"version": 0}, {"version": 2})
    assert sum(len(p.files) for p in parts) == len(live)
    with pytest.raises(Exception):  # the EXECUTOR path is what opens files
        for p in parts:
            list(rdr.read(p))

    cdf = _VStoreStreamCDFReader(
        {"path": root, "readChangeFeed": "true", "startingVersion": "1"},
        vsrc_spark.createDataFrame(
            [], "k bigint, _change string, _commit_version bigint"
        ).schema,
    )
    assert cdf.latestOffset() == {"version": 2}
    cparts = cdf.partitions({"version": 0}, {"version": 2})
    assert sum(len(p.files) for p in cparts) == len(live)
    with pytest.raises(Exception):
        for p in cparts:
            list(cdf.read(p))


def test_stream_manifest_cache_one_read_per_version(vsrc_spark, tmp_path):
    """Each manifest is parsed ONCE per stream lifetime: repeated
    latestOffset/partitions cycles over a growing store never re-open
    already-summarized versions, and commit() prunes the cache."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    for lo in (0, 10, 20):
        V.append(
            vsrc_spark.range(lo, lo + 10).selectExpr("id as k"), root
        )
    planned = V.read_versioned(vsrc_spark, root).schema
    rdr = _VStoreStreamReader(
        {"path": root, "startingVersion": "1", "maxVersionsPerTrigger": "1"},
        planned,
    )
    rdr.initialOffset()
    assert rdr.latestOffset() == {"version": 1}
    rdr.partitions({"version": 0}, {"version": 1})
    assert rdr._minfo_loads == 1
    # second trigger: only v2 is new
    assert rdr.latestOffset() == {"version": 2}
    rdr.partitions({"version": 1}, {"version": 2})
    assert rdr._minfo_loads == 2
    # replanning an old range (engine replay) hits the cache
    rdr.partitions({"version": 0}, {"version": 1})
    assert rdr._minfo_loads == 2
    rdr.commit({"version": 2})  # cache tail dropped, no reload needed
    assert rdr.latestOffset() == {"version": 3}
    rdr.partitions({"version": 2}, {"version": 3})
    assert rdr._minfo_loads == 3


def test_stream_rate_cap_cursor_survives_restart(vsrc_spark, tmp_path):
    """Restart recovery: the engine replays partitions() of the last
    logged batch before asking for new offsets — a FRESH reader seeded
    only by that replay continues capping from the replayed end, so
    pacing survives restarts."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    for lo in (0, 10, 20, 30):
        V.append(
            vsrc_spark.range(lo, lo + 10).selectExpr("id as k"), root
        )
    planned = V.read_versioned(vsrc_spark, root).schema

    def rdr():
        return _VStoreStreamReader(
            {
                "path": root,
                "startingVersion": "1",
                "maxVersionsPerTrigger": "1",
            },
            planned,
        )

    r1 = rdr()
    r1.initialOffset()
    assert r1.latestOffset() == {"version": 1}
    r1.partitions({"version": 0}, {"version": 1})
    # "crash" after batch 0 was logged; the restarted reader sees the
    # engine replay batch 0's partitions first...
    r2 = rdr()
    r2.partitions({"version": 0}, {"version": 1})
    # ...and its next offset continues capped from there
    assert r2.latestOffset() == {"version": 2}
    assert r2.latestOffset() == {"version": 3}


def test_stream_lagging_reader_pruned_gap_raises(vsrc_spark, tmp_path):
    """A streaming reader whose checkpoint is behind the table
    checkpoint must FAIL when prune_log deleted the manifests in its
    range — silently skipping pruned versions would drop their rows
    from the stream forever."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    for lo in (0, 10, 20):
        V.append(
            vsrc_spark.range(lo, lo + 10).selectExpr("id as k"), root
        )
    planned = V.read_versioned(vsrc_spark, root).schema
    V.checkpoint(root)
    V.prune_log(root)  # v1..v3 manifests gone
    V.append(vsrc_spark.range(30, 40).selectExpr("id as k"), root)  # v4

    rdr = _VStoreStreamReader({"path": root}, planned)
    # a reader whose checkpoint sits at v1 needs v2..v3: unreconstructable
    with pytest.raises(ValueError, match="prune_log"):
        rdr.partitions({"version": 1}, {"version": 4})
    # the capped-offset walk refuses the same way instead of skipping
    capped = _VStoreStreamReader(
        {"path": root, "maxVersionsPerTrigger": "1"}, planned
    )
    with pytest.raises(ValueError, match="prune_log"):
        capped._capped_end(1, 4)
    # a reader that only needs post-prune versions proceeds
    assert [len(p.files) for p in rdr.partitions(
        {"version": 3}, {"version": 4}
    )] and True


def test_stream_partitions_pack_by_row_budget(vsrc_spark, tmp_path):
    """The stream reader packs admitted files into row-budgeted
    partitions exactly like the batch reader — a deep backlog of
    small commits never plans one task per file unless asked."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    root = str(tmp_path / "store")
    # 8 single-file commits x 100 rows
    for i in range(8):
        V.append(
            vsrc_spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id as k")
            .coalesce(1),
            root,
        )
    planned = V.read_versioned(vsrc_spark, root).schema

    def n_parts(**opts):
        r = _VStoreStreamReader(
            {"path": root, "startingVersion": "1", **opts}, planned
        )
        parts = r.partitions({"version": 0}, {"version": 8})
        assert sum(len(p.files) for p in parts) == 8
        return len(parts)

    assert n_parts() == 1
    assert n_parts(rowsPerPartition="200") == 4
    assert n_parts(rowsPerPartition="0") == 8


def _cdf_reader(spark, root, **opts):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamCDFReader,
    )

    schema = V.read_versioned(spark, root).schema
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    full = StructType(
        list(schema.fields)
        + [
            StructField("_change", StringType(), False),
            StructField("_commit_version", LongType(), False),
        ]
    )
    return _VStoreStreamCDFReader({"path": root, **opts}, full)


def _drain_cdf(reader, s, e):
    rows = []
    for p in reader.partitions({"version": s}, {"version": e}):
        for b in reader.read(p):
            rows.extend(
                (rec["k"], rec["_change"], rec["_commit_version"])
                for rec in b.to_pylist()
            )
    return rows


def test_cdf_stream_incremental_walk_matches_changed_files(
    vsrc_spark, tmp_path
):
    """The CDF stream reader's incremental origin tracking yields the
    same (file rows, change, version) feed as the full-walk batch
    reference (`_changed_files`) across appends, deletes and an
    overwrite — batch by batch, with manifests parsed once each."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 10).selectExpr("id as k"), root)  # v1
    V.append(vsrc_spark.range(10, 20).selectExpr("id as k"), root)  # v2
    V.delete_where(vsrc_spark, root, "k % 2 = 0")  # v3
    V.append(vsrc_spark.range(20, 24).selectExpr("id as k"), root)  # v4

    rdr = _cdf_reader(vsrc_spark, root, startingVersion="1")
    got = []
    for s, e in ((0, 2), (2, 3), (3, 4)):  # three micro-batches
        got.extend(_drain_cdf(rdr, s, e))
    loads_after_walk = rdr._minfo_loads

    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _changed_files,
    )

    import pyarrow.parquet as pq

    want = []
    for f, _origin, change, v, _dv in _changed_files(root, 1, 4)[0]:
        for rec in pq.read_table(os.path.join(root, f)).to_pylist():
            want.append((rec["k"], change, v))
    assert sorted(got) == sorted(want)
    # replanning the middle batch (engine replay) re-seeds correctly
    replay = _drain_cdf(rdr, 2, 3)
    assert sorted(replay) == sorted(
        r for r in want if r[2] == 3
    )
    # steady-state forward planning never re-parsed manifests beyond
    # the replay's re-seed
    assert rdr._minfo_loads == loads_after_walk


def test_cdf_stream_packs_partitions(vsrc_spark, tmp_path):
    """CDC backlogs pack into row-budgeted partitions like the plain
    stream reader — not one task per changed file."""
    root = str(tmp_path / "store")
    for i in range(6):
        V.append(
            vsrc_spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id as k")
            .coalesce(1),
            root,
        )
    rdr = _cdf_reader(vsrc_spark, root, startingVersion="1")
    parts = rdr.partitions({"version": 0}, {"version": 6})
    assert len(parts) == 1 and len(parts[0].files) == 6
    rdr2 = _cdf_reader(
        vsrc_spark, root, startingVersion="1", rowsPerPartition="200"
    )
    parts2 = rdr2.partitions({"version": 0}, {"version": 6})
    assert len(parts2) == 3
    assert sum(len(p.files) for p in parts2) == 6


def test_format_read_applies_deletion_vectors(vsrc_spark, tmp_path):
    """spark.read.format('vstore') masks dv-deleted rows exactly like
    the library read, including under time travel and pushdown-pruned
    scans; the stream source treats a dv commit as delete-only."""
    root = str(tmp_path / "store")
    V.append(
        vsrc_spark.range(0, 300).selectExpr("id as k", "id * 2 as w")
        .repartitionByRange(3, "k").sortWithinPartitions("k"),
        root,
    )
    V.delete_where(vsrc_spark, root, "k % 10 = 0", mode="dv")

    got = vsrc_spark.read.format("vstore").load(root)
    assert got.count() == 270
    assert got.where("k % 10 = 0").count() == 0
    lib = V.read_versioned(vsrc_spark, root)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, lib.collect())
    )
    # time travel to v1: the mask does not apply
    v1 = vsrc_spark.read.format("vstore").option("version", "1").load(root)
    assert v1.count() == 300
    # pushdown-pruned scan over the dv'd snapshot stays exact
    n = (
        vsrc_spark.read.format("vstore").option("pruneFiles", "true")
        .load(root).where("k < 100").count()
    )
    assert n == 90
    # plain stream: the dv commit is delete-only — fails without
    # ignoreDeletes, skips with it
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
    )

    planned = lib.schema
    with pytest.raises(ValueError, match="ignoreDeletes"):
        _VStoreStreamReader({"path": root}, planned).partitions(
            {"version": 1}, {"version": 2}
        )
    parts = _VStoreStreamReader(
        {"path": root, "ignoreDeletes": "true"}, planned
    ).partitions({"version": 1}, {"version": 2})
    assert parts == []  # nothing re-added, nothing streams


def test_cdf_batch_apply_law_with_deletion_vectors(vsrc_spark, tmp_path):
    """The batch change feed emits dv deletes ROW-LEVEL (only the
    deleted rows, no survivor re-inserts) and the apply law still
    reconstructs the head snapshot."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 20).selectExpr("id as k"), root)  # v1
    V.delete_where(vsrc_spark, root, "k % 4 = 0", mode="dv")  # v2
    V.append(vsrc_spark.range(20, 25).selectExpr("id as k"), root)  # v3
    V.delete_where(vsrc_spark, root, "k = 7", mode="dv")  # v4

    cdf = (
        vsrc_spark.read.format("vstore")
        .option("changesFrom", "2")
        .load(root)
    )
    rows = cdf.collect()
    dels = [(r.k, r._commit_version) for r in rows if r._change == "delete"]
    # row-level: exactly the deleted rows, nothing else
    assert sorted(dels) == sorted(
        [(k, 2) for k in range(0, 20, 4)] + [(7, 4)]
    )
    base = _multiset(
        (r.k,) for r in V.read_versioned(vsrc_spark, root, 1).collect()
    )
    for r in sorted(rows, key=lambda r: r._commit_version):
        if r._change == "insert":
            base[(r.k,)] += 1
        else:
            base[(r.k,)] -= 1
    head = _multiset(
        (r.k,) for r in V.read_versioned(vsrc_spark, root).collect()
    )
    assert +base == head


def test_cdf_stream_emits_dv_deletes(vsrc_spark, tmp_path):
    """The streaming change feed emits dv commits as row-level deletes
    through the executor path, batch by batch."""
    root = str(tmp_path / "store")
    V.append(vsrc_spark.range(0, 30).selectExpr("id as k"), root)  # v1
    V.delete_where(vsrc_spark, root, "k >= 25", mode="dv")  # v2
    rdr = _cdf_reader(vsrc_spark, root, startingVersion="1")
    got = _drain_cdf(rdr, 0, 2)
    ins = sorted(k for k, c, _v in got if c == "insert")
    dels = sorted((k, v) for k, c, v in got if c == "delete")
    assert ins == list(range(30))
    assert dels == [(k, 2) for k in range(25, 30)]


def test_format_write_partitioned(vsrc_spark, tmp_path):
    """`.option("partitionBy", ...)` on the format writer: files split
    one-tuple-per-file executor-side, the manifest records the layout,
    and the library's partition-exact DML fast path covers the
    format-written files (a partition delete is metadata-only)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "store")
    df = vsrc_spark.range(0, 300).selectExpr(
        "id", "cast(id % 3 as int) as b"
    )
    df.write.format("vstore").option("path", root).option(
        "partitionBy", "b"
    ).mode("append").save()
    assert V.table_partitioning(root) == ["b"]
    pcols, parts = V._partition_state(root)
    live, _ = V._replay(root, None)
    assert set(live) <= set(parts)
    for rel in live:
        vals = set(
            pq.read_table(os.path.join(root, rel), columns=["b"])
            .column("b").to_pylist()
        )
        assert len(vals) == 1, rel
    # second format append INHERITS the layout without the option
    df.where("id < 30").write.format("vstore").option("path", root).mode(
        "append"
    ).save()
    assert set(V._replay(root, None)[0]) <= set(V._partition_state(root)[1])
    # partition-exact delete over format-written files: corrupt the
    # doomed files — a path that reads them dies
    _, parts = V._partition_state(root)
    doomed = [f for f, pv in parts.items() if pv == ["1"]]
    for rel in doomed:
        with open(os.path.join(root, rel), "wb") as fh:
            fh.write(b"junk")
    V.delete_where(vsrc_spark, root, "b = 1")
    m = V.history(root)[-1]
    assert m["action"] == "delete"
    back = (
        vsrc_spark.read.format("vstore").load(root)
    )
    assert back.where("b = 1").count() == 0
    assert back.count() == 220
    # mismatched re-declare on append raises; overwrite may re-lay
    with pytest.raises(Exception, match="must match"):
        df.write.format("vstore").option("path", root).option(
            "partitionBy", "id"
        ).mode("append").save()
    df.write.format("vstore").option("path", root).option(
        "partitionBy", "id"
    ).mode("overwrite").save()
    assert V.table_partitioning(root) == ["id"]


def test_stream_sink_keeps_partition_layout(vsrc_spark, tmp_path):
    """A streaming vstore sink into a partitioned store splits each
    micro-batch by tuple, so stream-fed tables keep metadata-only
    partition drops."""
    root = str(tmp_path / "store")
    V.append(
        vsrc_spark.range(0, 10).selectExpr(
            "id", "cast(id % 2 as int) as b"
        ),
        root,
        partition_by=["b"],
    )
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    vsrc_spark.range(10, 40).selectExpr(
        "id", "cast(id % 2 as int) as b"
    ).write.parquet(src_dir)
    stream = (
        vsrc_spark.readStream.schema("id long, b int").parquet(src_dir)
    )
    q = (
        stream.writeStream.format("vstore")
        .option("path", root)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pcols, parts = V._partition_state(root)
    live, _ = V._replay(root, None)
    assert set(live) <= set(parts), "stream-written files tracked"
    V.delete_where(vsrc_spark, root, "b = 0")
    import glob as _glob
    import json as _json

    m = _json.load(
        open(sorted(_glob.glob(os.path.join(root, "_txlog", "v*.json")))[-1])
    )
    assert m["added"] == []  # metadata-only
    assert m["meta"]["partition_exact"] is True
    assert V.read_versioned(vsrc_spark, root).count() == 20


def test_default_read_safe_under_dataframe_reuse(vsrc_spark, tmp_path):
    """r11 correctness fix: Spark caches the planned partition list per
    relation (PythonDataSourceV2.readInfo, refreshed only when
    pushFilters runs), so with filter-derived pruning a REUSED
    DataFrame served a filterless query the LAST filtered query's
    pruned file set — rows silently vanished. The default reader never
    bakes filter state into the plan: filtered-then-filterless on ONE
    DataFrame (and on one temp view) stays exact."""
    root = str(tmp_path / "store")
    _range_laid_store(vsrc_spark, root)  # 3 files, k ranges disjoint
    df = vsrc_spark.read.format("vstore").load(root)
    assert df.where("k < 100").count() == 100   # would prune to 1 file
    assert df.count() == 300                    # the r10 bug returned 100
    assert df.where("k >= 250").count() == 50
    assert df.count() == 300
    # same discipline through a SQL temp view (shared relation too)
    vsrc_spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW vreuse USING vstore "
        f"OPTIONS (path '{root}')"
    )
    assert vsrc_spark.sql(
        "SELECT count(*) n FROM vreuse WHERE k = 5"
    ).collect()[0].n == 1
    assert vsrc_spark.sql(
        "SELECT count(*) n FROM vreuse"
    ).collect()[0].n == 300


def test_available_now_one_capped_batch_per_start_pinned(vsrc_spark, tmp_path):
    """VERDICT r11 #6 pin: PySpark 4.1.2's Python stream-reader API
    has NO admission control hooks — `latestOffset()` takes no
    ReadLimit argument and getDefaultReadLimit /
    prepareForTriggerAvailableNow / reportLatestOffset are absent —
    so trigger(availableNow) snapshots ONE latestOffset as "all
    available". The engine's caps shape that one offset, so a CAPPED
    query drains exactly one capped micro-batch per start (re-start
    continues from the checkpoint), while an UNCAPPED availableNow
    drains the whole backlog in one batch. Both legs pinned, plus the
    API shape — the first pyspark that adds Python read limits fails
    here and real admission control gets wired in. Concrete example
    (README): a 10 000-version backlog with maxVersionsPerTrigger=100
    under availableNow needs 100 restarts to drain; use a
    processingTime trigger (where caps pace batch-by-batch) or drop
    the cap and bound executor memory via rowsPerPartition."""
    import glob as _glob
    import inspect

    from pyspark.sql.datasource import DataSourceStreamReader

    sig = inspect.signature(DataSourceStreamReader.latestOffset)
    assert list(sig.parameters) == ["self"]  # no ReadLimit parameter
    for hook in (
        "getDefaultReadLimit",
        "prepareForTriggerAvailableNow",
        "reportLatestOffset",
    ):
        assert not hasattr(DataSourceStreamReader, hook)

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    for i in range(4):
        V.append(
            vsrc_spark.range(i * 10, i * 10 + 10).selectExpr("id as k"),
            root,
        )

    def drain_once(capped):
        r = (
            vsrc_spark.readStream.format("vstore")
            .option("path", root)
            .option("startingVersion", "1")
        )
        if capped:
            r = r.option("maxVersionsPerTrigger", "1")
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.k for r in vsrc_spark.read.parquet(out).collect())

    # capped: ONE capped batch per start — partial drain, no pacing
    assert drain_once(capped=True) == list(range(10))
    # a re-start continues from the checkpoint: next capped batch
    assert drain_once(capped=True) == list(range(20))
    # uncapped: the remaining backlog drains in one batch
    assert drain_once(capped=False) == list(range(40))
    offsets = [
        f
        for f in _glob.glob(os.path.join(ckpt, "offsets", "*"))
        if os.path.basename(f).isdigit()
    ]
    assert len(offsets) == 3  # one batch per start, never more
