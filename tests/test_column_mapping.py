"""Column mapping: RENAME / DROP COLUMN as metadata (Delta's column
mapping by stable field id).

Contract pinned here: a rename is ONE manifest (zero files touched —
proven by corrupting every data file before the rename, byte-compare
after); reads resolve every file field by its stable id to the CURRENT
logical name; time travel before the rename shows the old names; a
dropped-then-readded name gets a NEW id so old bytes never resurrect;
OPTIMIZE rewrites files to current names, restoring the stream
source's eligibility. Reference tie-in: the reference renames columns
by UPDATE_TABLE overwrite + full re-replication (GlueUtil.java:
175-192); here it is O(1) metadata over any number of files.
"""
from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V


def _mk(spark, n=100):
    return spark.range(0, n).selectExpr(
        "id as k", "id * 2 as v", "concat('s', id) as s"
    )


def _files(root):
    live, _ = V._replay(root, None)
    return {
        f: open(os.path.join(root, f), "rb").read() for f in live
    }


def test_rename_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mk(spark), root)
    before = _files(root)
    v = V.rename_column(root, "v", "value")
    assert _files(root) == before  # no byte moved
    m = json.load(
        open(sorted(glob.glob(os.path.join(root, "_txlog", "v*.json")))[-1])
    )
    assert m["action"] == "rename_column" and m["added"] == []
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "value", "s"]
    assert out.agg(F.sum("value")).collect()[0][0] == sum(
        2 * i for i in range(100)
    )
    assert v == 2
    # chained rename + rename BACK to the original name
    V.rename_column(root, "value", "val2")
    V.rename_column(root, "val2", "v")
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "v", "s"]
    assert out.agg(F.sum("v")).collect()[0][0] == sum(
        2 * i for i in range(100)
    )


def test_time_travel_shows_old_names(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mk(spark), root)  # v1
    V.rename_column(root, "v", "value")  # v2
    assert V.read_versioned(spark, root, version=1).columns == ["k", "v", "s"]
    assert V.read_versioned(spark, root, version=2).columns == [
        "k", "value", "s",
    ]


def test_post_rename_writes_merge(spark, tmp_path):
    """Old files (physical name v) + new files (written as value) are
    one column through every read and DML path."""
    root = str(tmp_path / "t")
    V.append(_mk(spark), root)
    V.rename_column(root, "v", "value")
    V.append(
        spark.range(100, 150).selectExpr(
            "id as k", "id * 2 as value", "concat('s', id) as s"
        ),
        root,
    )
    out = V.read_versioned(spark, root)
    assert out.count() == 150
    assert out.where("value = 198").count() == 1  # k=99, old file
    assert out.where("value = 298").count() == 1  # k=149, new file
    # DML addressed by the NEW name reaches rows in OLD files
    V.delete_where(spark, root, "value < 100")  # k < 50, all old files
    assert V.read_versioned(spark, root).count() == 100
    V.update_where(spark, root, "value = 100", {"s": "'updated'"})
    assert (
        V.read_versioned(spark, root).where("s = 'updated'").count() == 1
    )
    # merge on the renamed column's sibling key still lands
    V.merge_into(
        spark,
        root,
        spark.range(149, 151).selectExpr(
            "id as k", "id * 3 as value", "concat('m', id) as s"
        ),
        ["k"],
    )
    out = V.read_versioned(spark, root)
    assert out.where("s like 'm%'").count() == 2
    assert out.count() == 101


def test_drop_and_no_resurrection(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mk(spark, 10), root)
    V.drop_column(root, "v")
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "s"]
    # re-add the NAME: new id — old bytes stay dead
    V.append(
        spark.range(100, 105).selectExpr(
            "id as k", "id as v", "concat('s', id) as s"
        ),
        root,
    )
    rows = {r.k: r.v for r in V.read_versioned(spark, root).collect()}
    assert rows[0] is None and rows[100] == 100
    # dropping the only remaining... guard rails
    with pytest.raises(ValueError, match="no column"):
        V.drop_column(root, "nope")
    with pytest.raises(ValueError, match="already exists"):
        V.rename_column(root, "k", "s")


def test_mapping_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(
        _mk(spark).withColumn("b", (F.col("k") % 2).cast("int")),
        root,
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="partition column"):
        V.rename_column(root, "b", "bucket")
    V.add_table_constraint(spark, root, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        V.rename_column(root, "v", "value")
    with pytest.raises(ValueError, match="constraint"):
        V.drop_column(root, "v")
    # non-partition, non-constraint column renames fine
    V.rename_column(root, "s", "label")
    assert "label" in V.read_versioned(spark, root).columns


def test_mapping_survives_checkpoint_prune_and_rollback(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(_mk(spark, 40), root)  # v1
    V.rename_column(root, "v", "value")  # v2
    V.checkpoint(root)
    V.prune_log(root)
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "value", "s"]
    V.append(
        spark.range(40, 50).selectExpr(
            "id as k", "id * 2 as value", "concat('s', id) as s"
        ),
        root,
    )  # v3
    V.rename_column(root, "value", "price")  # v4
    V.rollback(spark, root, 3)  # back to the 'value' era
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "value", "s"]
    assert out.count() == 50


def test_format_batch_read_resolves_renames(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    root = str(tmp_path / "t")
    V.append(_mk(spark), root)
    V.rename_column(root, "v", "value")
    V.append(
        spark.range(100, 120).selectExpr(
            "id as k", "id * 2 as value", "concat('s', id) as s"
        ),
        root,
    )
    fmt = spark.read.format("vstore").load(root)
    assert fmt.columns == ["k", "value", "s"]
    assert fmt.count() == 120
    assert (
        fmt.agg(F.sum("value")).collect()[0][0]
        == sum(2 * i for i in range(120))
    )
    # time travel through the format shows the pre-rename name
    v1 = spark.read.format("vstore").option("version", "1").load(root)
    assert v1.columns == ["k", "v", "s"]


def test_stream_refuses_until_optimize_rewrites(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _VStoreStreamReader,
        register_vstore_source,
    )

    register_vstore_source(spark)
    root = str(tmp_path / "t")
    V.append(_mk(spark, 30), root)
    V.rename_column(root, "v", "value")
    planned = V.read_versioned(spark, root).schema
    rdr = _VStoreStreamReader({"path": root}, planned)
    with pytest.raises(ValueError, match="optimize"):
        rdr.partitions({"version": 0}, {"version": 2})
    # OPTIMIZE rewrites to current names: stream eligible again
    V.optimize(spark, root)
    rdr2 = _VStoreStreamReader(
        # ignoreChanges: the optimize commit is a rewrite (files
        # removed + re-added) — the standard Delta-source knob
        {"path": root, "startingVersion": "3", "ignoreChanges": "true"},
        planned,
    )
    parts = rdr2.partitions({"version": 2}, {"version": 3})
    assert parts  # the optimize commit's files plan cleanly
    rows = []
    for p in parts:
        for b in rdr2.read(p):
            rows.extend(b.to_pylist())
    assert len(rows) == 30
    assert {r["value"] for r in rows} == {2 * i for i in range(30)}


def test_cli_rename_and_drop(spark, tmp_path, capsys):
    from aws_glue_data_catalog_replication_utility_spark.cli import main

    root = str(tmp_path / "t")
    src = str(tmp_path / "in")
    _mk(spark, 20).write.parquet(src)

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run(["vstore", "--root", root, "--op", "append", "--in", src])
    rep = run([
        "vstore", "--root", root, "--op", "rename-column",
        "--column", "v", "--new-name", "value",
    ])
    assert rep["action"] == "rename_column"
    run([
        "vstore", "--root", root, "--op", "drop-column", "--column", "s",
    ])
    out = V.read_versioned(spark, root)
    assert out.columns == ["k", "value"]
    detail = run(["vstore", "--root", root, "--op", "detail"])
    assert {c["name"] for c in detail["column_mapping"]["cols"]} == {
        "k", "value",
    }


def test_dv_delete_on_renamed_column(spark, tmp_path):
    """mode='dv' deletes evaluate the predicate on RENAMED columns of
    old files (the physical->logical resolution happens before
    widening — a by-name evolve would NULL-pad and silently match
    nothing)."""
    root = str(tmp_path / "t")
    V.append(_mk(spark, 50), root)
    V.rename_column(root, "v", "value")
    live_before, _ = V._replay(root, None)
    V.delete_where(spark, root, "value < 20", mode="dv")  # k < 10
    assert V._replay(root, None)[0] == live_before  # no rewrite
    out = V.read_versioned(spark, root)
    assert out.count() == 40
    assert out.agg(F.min("value")).collect()[0][0] == 20
    n, stats = V.count_versioned(spark, root)
    assert n == 40 and stats["files_scanned"] == 0
