"""Hive-style partitioned tables in the versioned store.

The layout contract: every data file of a partitioned store holds
exactly ONE partition-value tuple (columns retained in-file, Iceberg's
identity-partition posture), the tuple is recorded per file in the
manifest (`file_parts`), and a predicate that resolves over partition
columns alone drives METADATA-ONLY DML — partition-scoped DELETE /
replaceWhere drop or swap whole files with zero data I/O (pinned here
by corrupting the doomed files first: a path that read them would
die). Reference parity: the reference syncs partitions as first-class
objects (GDCUtil.java:61-111 partition batches); here the partition is
a transactional file-set inside the commit log.
"""
from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V


def _mkdf(spark, n=1000):
    return spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
        (F.col("id") * 2).alias("val"),
    )


def _last_manifest(root):
    return json.load(
        open(sorted(glob.glob(os.path.join(root, "_txlog", "v*.json")))[-1])
    )


def _corrupt(root, rels):
    for rel in rels:
        with open(os.path.join(root, rel), "wb") as fh:
            fh.write(b"not parquet")


def _assert_single_valued(root, cols):
    import pyarrow.parquet as pq

    pcols, parts = V._partition_state(root)
    live, _ = V._replay(root, None)
    assert pcols == cols
    assert set(live) <= set(parts), "every live file tracked"
    for rel in live:
        t = pq.read_table(os.path.join(root, rel), columns=cols)
        distinct = {
            tuple(r) for r in zip(*[t.column(c).to_pylist() for c in cols])
        }
        assert len(distinct) == 1, f"{rel} mixes partition tuples"


def test_partitioned_append_roundtrip_and_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _mkdf(spark)
    V.append(df, root, partition_by=["bucket"])
    assert V.table_partitioning(root) == ["bucket"]
    _assert_single_valued(root, ["bucket"])
    back = V.read_versioned(spark, root)
    assert back.columns == df.columns
    assert sorted(r["id"] for r in back.collect()) == list(range(1000))
    # second append inherits the layout without re-declaring
    V.append(_mkdf(spark).where("id < 8"), root)
    _assert_single_valued(root, ["bucket"])
    assert V.read_versioned(spark, root).count() == 1008
    d = V.describe_detail(root)
    assert d["partitioning"] == ["bucket"]
    assert d["num_partitions"] == 4


def test_partition_declaration_rules(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _mkdf(spark)
    V.append(df, root, partition_by=["bucket"])
    with pytest.raises(ValueError, match="must match"):
        V.append(df, root, partition_by=["cat"])
    flat = str(tmp_path / "flat")
    V.append(df, flat)
    with pytest.raises(ValueError, match="existing unpartitioned"):
        V.append(df, flat, partition_by=["bucket"])
    with pytest.raises(ValueError, match="not in schema"):
        V.append(df, str(tmp_path / "x"), partition_by=["nope"])
    arr = df.select("id", F.array("id").alias("a"))
    with pytest.raises(ValueError, match="non-atomic"):
        V.append(arr, str(tmp_path / "y"), partition_by=["a"])
    with pytest.raises(ValueError, match="partition column"):
        V.update_where(spark, root, "id = 1", {"bucket": "3"})


def test_partition_exact_delete_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    _, parts = V._partition_state(root)
    doomed = [f for f, pv in parts.items() if pv == ["2"]]
    assert doomed
    # PROOF: corrupt every file the delete must drop — any path that
    # opens them (probe scan, survivor rewrite) dies loudly
    _corrupt(root, doomed)
    V.delete_where(spark, root, "bucket = 2")
    m = _last_manifest(root)
    assert m["action"] == "delete"
    assert m["added"] == []  # no survivor rewrite
    assert sorted(m["removed"]) == sorted(doomed)
    assert m["meta"]["partition_exact"] is True
    assert m["meta"]["probe_files_scanned"] == 0
    out = V.read_versioned(spark, root)
    assert out.where("bucket = 2").count() == 0
    assert out.count() == 750
    # dv mode takes the same whole-file drop: no mask ever written
    V.delete_where(spark, root, "bucket = 3", mode="dv")
    assert _last_manifest(root)["added"] == []
    assert not os.path.exists(os.path.join(root, "_dv"))
    assert V.read_versioned(spark, root).count() == 500


def test_partition_exact_matches_flat_twin(spark, tmp_path):
    """Bit-equality with the probe-scan path on an unpartitioned twin,
    including a NULL-valued partition (predicate NULL keeps the row —
    SQL semantics on both paths)."""
    df = _mkdf(spark, 400).withColumn(
        "bucket",
        F.when(F.col("id") % 10 == 0, F.lit(None)).otherwise(F.col("bucket")),
    )
    part, flat = str(tmp_path / "p"), str(tmp_path / "f")
    V.append(df, part, partition_by=["bucket"])
    V.append(df, flat)
    for pred in ("bucket = 1", "bucket IS NULL", "bucket IN (0, 3)"):
        V.delete_where(spark, part, pred)
        V.delete_where(spark, flat, pred)
        a = sorted(map(tuple, V.read_versioned(spark, part).collect()))
        b = sorted(map(tuple, V.read_versioned(spark, flat).collect()))
        assert a == b, pred
    assert _last_manifest(part)["meta"]["partition_exact"] is True


def test_mixed_predicate_falls_back_to_probe(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    v = V.delete_where(spark, root, "bucket = 1 AND val > 1000")
    m = _last_manifest(root)
    assert m["version"] == v
    assert "partition_exact" not in (m.get("meta") or {})
    out = V.read_versioned(spark, root)
    assert out.where("bucket = 1 AND val > 1000").count() == 0
    assert out.where("bucket = 1").count() > 0  # survivors kept
    _assert_single_valued(root, ["bucket"])  # rewrite preserved layout


def test_replace_where_partition_swap(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    _, parts = V._partition_state(root)
    doomed = [f for f, pv in parts.items() if pv == ["1"]]
    _corrupt(root, doomed)  # swap must not read the replaced files
    repl = spark.range(2000, 2010).select(
        F.col("id"),
        F.lit(1).cast("int").alias("bucket"),
        F.lit("cX").alias("cat"),
        (F.col("id") * 2).alias("val"),
    )
    V.overwrite_where(spark, root, "bucket = 1", repl)
    m = _last_manifest(root)
    assert m["meta"]["partition_exact"] is True
    assert sorted(m["removed"]) == sorted(doomed)
    out = V.read_versioned(spark, root)
    assert out.where("bucket = 1").count() == 10
    assert out.count() == 750 + 10
    _assert_single_valued(root, ["bucket"])
    # idempotent backfill: re-running converges
    V.overwrite_where(spark, root, "bucket = 1", repl)
    assert V.read_versioned(spark, root).count() == 760


def test_update_preserves_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    V.update_where(spark, root, "bucket = 0", {"val": "val + 1"})
    _assert_single_valued(root, ["bucket"])
    out = V.read_versioned(spark, root)
    assert out.where("bucket = 0 AND val % 2 = 0").count() == 0
    assert out.where("bucket = 1 AND val % 2 = 1").count() == 0


def test_merge_preserves_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 100), root, partition_by=["bucket"])
    ups = spark.range(90, 110).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        F.lit("up").alias("cat"),
        F.lit(-1).cast("long").alias("val"),
    )
    V.merge_into(spark, root, ups, ["id"])
    _assert_single_valued(root, ["bucket"])
    out = V.read_versioned(spark, root)
    assert out.count() == 110
    assert out.where("cat = 'up'").count() == 20
    # partition-exact DML still fires on merge-written files
    V.delete_where(spark, root, "bucket = 2")
    assert _last_manifest(root)["meta"]["partition_exact"] is True


def test_optimize_repartitions_and_restores_fast_path(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    for i in range(3):
        V.append(_mkdf(spark).where(f"id % 7 = {i}"), root)
    before = sorted(map(tuple, V.read_versioned(spark, root).collect()))
    V.optimize(spark, root)
    _assert_single_valued(root, ["bucket"])
    after = sorted(map(tuple, V.read_versioned(spark, root).collect()))
    assert before == after
    # full optimize clusters: exactly one file per live partition tuple
    _, parts = V._partition_state(root)
    live, _ = V._replay(root, None)
    vals = [tuple(parts[f]) for f in live]
    assert len(vals) == len(set(vals)) == 4
    V.delete_where(spark, root, "bucket = 0")
    assert _last_manifest(root)["meta"]["partition_exact"] is True


def test_partition_state_survives_checkpoint_and_prune(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    V.append(_mkdf(spark).where("id < 40"), root)
    V.checkpoint(root)
    V.prune_log(root)  # every summarized manifest deleted
    assert V.table_partitioning(root) == ["bucket"]
    _assert_single_valued(root, ["bucket"])
    _, parts = V._partition_state(root)
    doomed = [f for f, pv in parts.items() if pv == ["3"]]
    _corrupt(root, doomed)
    V.delete_where(spark, root, "bucket = 3")
    assert _last_manifest(root)["meta"]["partition_exact"] is True
    assert V.read_versioned(spark, root).where("bucket = 3").count() == 0


def test_rollback_restores_partition_state(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 200), root, partition_by=["bucket"])
    v1 = V.describe_detail(root)["version"]
    V.delete_where(spark, root, "bucket = 1")
    # re-partition the whole table on another column
    snap = V.read_versioned(spark, root)
    V.overwrite(snap, root, partition_by=["cat"])
    assert V.table_partitioning(root) == ["cat"]
    V.rollback(spark, root, v1)
    assert V.table_partitioning(root) == ["bucket"]
    assert V.read_versioned(spark, root).count() == 200
    # the fast path works on the rolled-back state (file_parts restored)
    V.delete_where(spark, root, "bucket = 1")
    assert _last_manifest(root)["meta"]["partition_exact"] is True


def test_overwrite_clears_partitioning(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _mkdf(spark, 100)
    V.append(df, root, partition_by=["bucket"])
    V.overwrite(df, root, partition_by=[])
    assert V.table_partitioning(root) == []
    v = V.delete_where(spark, root, "bucket = 1")
    m = _last_manifest(root)
    assert m["version"] == v
    assert "partition_exact" not in (m.get("meta") or {})


def test_typed_partition_columns(spark, tmp_path):
    """Int + date partition columns: hive strings cast back to the
    table type, so range predicates resolve typed and exact."""
    root = str(tmp_path / "t")
    df = spark.range(0, 90).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01"), (F.col("id") % 3).cast("int")).alias(
            "day"
        ),
    )
    V.append(df, root, partition_by=["day"])
    _, parts = V._partition_state(root)
    doomed = [f for f, pv in parts.items() if pv >= ["2024-01-02"]]
    _corrupt(root, doomed)
    V.delete_where(spark, root, "day >= DATE'2024-01-02'")
    m = _last_manifest(root)
    assert m["meta"]["partition_exact"] is True
    out = V.read_versioned(spark, root)
    assert out.count() == 30
    assert out.select(F.max("day")).collect()[0][0].isoformat() == "2024-01-01"


def test_degraded_layout_disables_fast_path_until_optimize(spark, tmp_path):
    """A non-partition-aware writer (simulated legacy commit without
    file_parts) degrades the exact fast path to the probe — never
    correctness; OPTIMIZE re-lays the table and restores it."""
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 100), root, partition_by=["bucket"])
    legacy = V._stage_write(_mkdf(spark, 100).where("id >= 96"), root)
    V._commit(
        root, "append", legacy, [],
        V.read_versioned(spark, root).schema.json(),
    )
    V.delete_where(spark, root, "bucket = 1")
    m = _last_manifest(root)
    assert "partition_exact" not in (m.get("meta") or {})  # degraded
    assert V.read_versioned(spark, root).where("bucket = 1").count() == 0
    V.optimize(spark, root)
    V.delete_where(spark, root, "bucket = 2")
    assert _last_manifest(root)["meta"]["partition_exact"] is True


def test_time_travel_across_partition_dml(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 200), root, partition_by=["bucket"])
    V.delete_where(spark, root, "bucket = 0")
    assert V.read_versioned(spark, root, version=1).count() == 200
    assert V.read_versioned(spark, root).count() == 150
    n, stats = V.count_versioned(spark, root)
    assert n == 150 and stats["files_scanned"] == 0


def test_optimize_where_scopes_to_partition(spark, tmp_path):
    """OPTIMIZE ... WHERE (Delta): maintenance touches ONLY the
    predicate's partitions — other partitions' files stay live and
    byte-identical (pinned by corrupting them first: reading one would
    die), and a non-partition predicate refuses."""
    root = str(tmp_path / "t")
    for i in range(3):  # 3 small appends -> small-file debt everywhere
        V.append(_mkdf(spark, 200).where(f"id % 3 = {i}"), root,
                 partition_by=["bucket"] if i == 0 else None)
    _, parts = V._partition_state(root)
    live_before, _ = V._replay(root, None)
    outside = [f for f in live_before if parts[f] != ["1"]]
    _corrupt(root, outside)  # scoped optimize must never open these
    v = V.optimize(spark, root, where="bucket = 1")
    m = _last_manifest(root)
    assert m["version"] == v and m["action"] == "optimize"
    assert all(parts[f] == ["1"] for f in m["removed"])
    live_after, _ = V._replay(root, None)
    assert set(outside) <= set(live_after)  # untouched files stay live
    # the scoped partition compacted to one file
    _, parts2 = V._partition_state(root)
    b1 = [f for f in live_after if parts2[f] == ["1"]]
    assert len(b1) == 1
    with pytest.raises(ValueError, match="partition"):
        V.optimize(spark, root, where="val > 10")
    # an unmatched partition scope is a no-op version
    assert V.optimize(spark, root, where="bucket = 99") == v


def test_dynamic_partition_overwrite(spark, tmp_path):
    """overwrite_partitions: replace exactly the partitions the data
    carries — untouched partitions stay live byte-identical (pinned by
    corrupting them), the removal side is metadata-only, re-running
    converges."""
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 400), root, partition_by=["bucket"])
    _, parts = V._partition_state(root)
    live_before, _ = V._replay(root, None)
    outside = [f for f in live_before if parts[f] not in (["1"], ["2"])]
    before_bytes = {
        f: open(os.path.join(root, f), "rb").read() for f in outside
    }
    # corrupt the REPLACED partitions' files: the metadata-only swap
    # must never open them (they leave the live set, so later reads
    # never see them either)
    doomed = [f for f in live_before if parts[f] in (["1"], ["2"])]
    _corrupt(root, doomed)
    repl = spark.range(5000, 5020).select(
        F.col("id"),
        (F.col("id") % 2 + 1).cast("int").alias("bucket"),  # 1 and 2
        F.lit("new").alias("cat"),
        (F.col("id") * 2).alias("val"),
    )
    V.overwrite_partitions(repl, root)
    m = _last_manifest(root)
    assert m["action"] == "overwrite_partitions"
    assert sorted(m["removed"]) == sorted(doomed)
    out = V.read_versioned(spark, root)
    assert out.where("bucket IN (1, 2)").count() == 20
    assert out.where("cat = 'new'").count() == 20
    assert out.count() == 200 + 20  # buckets 0,3 intact
    live_after = set(V._replay(root, None)[0])
    assert set(outside) <= live_after
    # untouched partitions byte-identical
    assert all(
        open(os.path.join(root, f), "rb").read() == b
        for f, b in before_bytes.items()
    )
    # idempotent republish
    V.overwrite_partitions(repl, root)
    assert V.read_versioned(spark, root).count() == 220
    # guard rails
    flat = str(tmp_path / "flat")
    V.append(_mkdf(spark, 10), flat)
    with pytest.raises(ValueError, match="partitioned table"):
        V.overwrite_partitions(_mkdf(spark, 10), flat)


def test_dynamic_overwrite_via_format_writer(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 200), root, partition_by=["bucket"])
    repl = spark.range(900, 910).select(
        F.col("id"),
        F.lit(0).cast("int").alias("bucket"),
        F.lit("dyn").alias("cat"),
        (F.col("id") * 2).alias("val"),
    )
    repl.write.format("vstore").option("path", root).option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").save()
    m = _last_manifest(root)
    assert m["action"] == "overwrite_partitions"
    out = V.read_versioned(spark, root)
    assert out.where("bucket = 0").count() == 10
    assert out.count() == 150 + 10
    # static overwrite still swaps the whole table
    repl.write.format("vstore").option("path", root).mode(
        "overwrite"
    ).save()
    assert V.read_versioned(spark, root).count() == 10
    # dynamic without overwrite mode refuses
    with pytest.raises(Exception, match="dynamic"):
        repl.write.format("vstore").option("path", root).option(
            "partitionOverwriteMode", "dynamic"
        ).mode("append").save()


def test_stream_dynamic_overwrite_exactly_once(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 100), root, partition_by=["bucket"])
    repl = _mkdf(spark, 100).where("bucket = 2").withColumn(
        "cat", F.lit("recomputed")
    )
    v = V.overwrite_partitions_stream_batch(repl, 7, root, query_id="q")
    assert v is not None
    # replayed epoch: recognized, nothing committed
    assert V.overwrite_partitions_stream_batch(
        repl, 7, root, query_id="q"
    ) is None
    out = V.read_versioned(spark, root)
    assert out.where("cat = 'recomputed'").count() == 25
    assert out.count() == 100


def test_show_partitions_metadata_only(spark, tmp_path, capsys):
    root = str(tmp_path / "t")
    V.append(_mkdf(spark, 400), root, partition_by=["bucket"])
    live, _ = V._replay(root, None)
    _corrupt(root, live)  # metadata-only: no file may be OPENED
    rows = V.show_partitions(root)
    assert [r["partition"] for r in rows] == [
        {"bucket": str(b)} for b in range(4)
    ]
    assert all(r["rows"] == 100 for r in rows)
    assert all(r["files"] >= 1 and r["bytes"] > 0 for r in rows)
    from aws_glue_data_catalog_replication_utility_spark.cli import main

    assert main(["vstore", "--root", root, "--op", "partitions"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == rows
    with pytest.raises(ValueError, match="not partitioned"):
        V.show_partitions(str(tmp_path / "nope"))


def test_partition_values_with_separator_bytes_stay_distinct(
    spark, tmp_path
):
    """ADVICE r11: the composite split key must be INJECTIVE — string
    partition values containing the raw join separator ('\\x00;') or
    a literal null-sentinel lookalike ('\\x00N') must land in distinct
    files from their colliding neighbors, and a NULL value must stay
    distinct from the literal '\\x00N' string. Otherwise a later
    partition-exact DELETE silently drops the merged tuple's rows."""
    rows = [
        ("a\x00;b", "x", 1),   # raw separator inside the value
        ("a", "b\x00;x", 2),   # ...vs split across two columns
        ("\x00N", "x", 3),     # literal sentinel lookalike
        (None, "x", 4),        # genuine NULL
        ("p", "q", 5),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v int")
    root = str(tmp_path / "t")
    V.append(df, root, partition_by=["k1", "k2"])
    # five distinct tuples -> five files, each single-valued
    _cols, parts = V._partition_state(root)
    assert len(parts) == 5
    assert {tuple(pv) for pv in parts.values()} == {
        ("a\x00;b", "x"), ("a", "b\x00;x"), ("\x00N", "x"),
        (None, "x"), ("p", "q"),
    }
    # partition-exact delete of ONE colliding tuple touches only it
    V.delete_where(spark, root, "k1 = 'a\x00;b'")
    got = [
        (r.k1, r.k2, r.v) for r in V.read_versioned(spark, root).collect()
    ]
    assert (None, "x", 4) in got
    assert len(got) == 4 and all(r[2] != 1 for r in got)
    # NULL tuple still present and distinct from the '\x00N' literal
    assert V.read_versioned(spark, root).where(
        "k1 IS NULL"
    ).count() == 1
    assert V.read_versioned(spark, root).where(
        "k1 = '\x00N'"
    ).count() == 1


def test_nondeterministic_predicate_refuses_fast_path(spark, tmp_path):
    """ADVICE r11: a non-deterministic predicate over partition
    columns (e.g. `bucket = 7 OR rand() < 0.5`) must NOT take the
    per-file fast path — per-file evaluation is only per-row
    evaluation when the predicate is deterministic."""
    root = str(tmp_path / "t")
    V.append(_mkdf(spark), root, partition_by=["bucket"])
    live, _last, origin = V._replay_full(root, None)
    lub = V._table_lub_for(root, origin)[0]
    assert V._partition_exact_match(
        spark, root, live, "bucket = 1", lub
    ) is not None
    assert V._partition_exact_match(
        spark, root, live, "bucket = 1 OR rand() < 0.5", lub
    ) is None


def test_rollback_never_partitioned_keeps_none(spark, tmp_path):
    """ADVICE r11: rolling back a never-partitioned table must keep
    table_partitioning() == None ('never declared'), not flip it to
    [] ('explicitly cleared') — the two drive different refusal
    branches on a later partitioned append."""
    root = str(tmp_path / "t")
    df = _mkdf(spark, 100)
    V.append(df, root)  # v1, no declaration ever
    V.append(df, root)  # v2
    V.rollback(spark, root, 1)  # v3
    assert V.table_partitioning(root) is None
    m = _last_manifest(root)
    assert "partitioning" not in m
    # a partitioned table's rollback still resets as before
    root2 = str(tmp_path / "t2")
    V.append(df, root2, partition_by=["bucket"])  # v1
    V.overwrite(df, root2, partition_by=[])  # v2: cleared
    V.rollback(spark, root2, 1)  # v3: declaration restored
    assert V.table_partitioning(root2) == ["bucket"]


def test_format_overwrite_unpartition_records_cleared_layout(
    spark, tmp_path
):
    """ADVICE r11 (medium): a format overwrite with partitionBy=''
    must RECORD the cleared layout like the library's
    overwrite(partition_by=[]) — otherwise the stale declaration
    refuses partition DML forever while new files carry no tuples."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    root = str(tmp_path / "t")
    df = _mkdf(spark, 100)
    V.append(df, root, partition_by=["bucket"])
    assert V.table_partitioning(root) == ["bucket"]
    (
        df.write.format("vstore")
        .mode("overwrite")
        .option("partitionBy", "")
        .save(root)
    )
    assert V.table_partitioning(root) == []
    # show_partitions refuses cleanly instead of lumping under None
    with pytest.raises(ValueError):
        V.show_partitions(root)
    # and a fresh partitioned overwrite re-declares fine
    (
        df.write.format("vstore")
        .mode("overwrite")
        .option("partitionBy", "bucket")
        .save(root)
    )
    assert V.table_partitioning(root) == ["bucket"]
    assert len(V.show_partitions(root)) == 4
