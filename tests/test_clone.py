"""Shallow clone: zero-copy table copies that are fully independent
from their first local write, with the documented source-vacuum
caveat. Reference tie-in: the reference clones a catalog by full
re-replication (export/import over every table); here a 100 TB clone
is O(live files) metadata."""
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


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.append(_mk(spark), src)
    V.delete_where(spark, src, "k % 10 = 0")
    want = sorted(map(tuple, V.read_versioned(spark, src).collect()))
    assert V.clone_table(src, dst) == 1
    # zero bytes copied: the clone has no data directory at all
    assert not os.path.isdir(os.path.join(dst, "data"))
    got = sorted(map(tuple, V.read_versioned(spark, dst).collect()))
    assert got == want
    # counts stay metadata-only (stats carried over, no footer opened)
    n, stats = V.count_versioned(spark, dst)
    assert n == 90 and stats["files_scanned"] == 0
    with pytest.raises(ValueError, match="already has a table"):
        V.clone_table(src, dst)


def test_clone_diverges_independently(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.append(_mk(spark), src)
    V.clone_table(src, dst)
    # writes + DML on the clone stage locally and never touch source
    src_files = {
        f: open(os.path.join(src, f), "rb").read()
        for f in V._replay(src, None)[0]
    }
    V.append(_mk(spark).where("k < 5"), dst)
    V.delete_where(spark, dst, "k >= 50")
    V.update_where(spark, dst, "k = 1", {"v": "999"})
    out = V.read_versioned(spark, dst)
    assert out.count() == 55  # 50 kept + 5 re-appended
    assert out.where("v = 999").count() == 2
    # source untouched, bytes and content
    assert V.read_versioned(spark, src).count() == 100
    assert all(
        open(os.path.join(src, f), "rb").read() == b
        for f, b in src_files.items()
    )
    # the clone's vacuum never deletes source bytes
    V.vacuum(dst, keep_last=1, retention_seconds=0)
    assert V.read_versioned(spark, src).count() == 100
    assert all(os.path.exists(os.path.join(src, f)) for f in src_files)


def test_clone_historical_version(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.append(_mk(spark, 60), src)  # v1
    V.delete_where(spark, src, "k >= 30")  # v2
    V.clone_table(src, dst, version=1)
    assert V.read_versioned(spark, dst).count() == 60
    m = json.load(
        open(sorted(glob.glob(os.path.join(dst, "_txlog", "v*.json")))[0])
    )
    assert m["action"] == "clone" and m["meta"]["source_version"] == 1


def test_clone_carries_dv_partitions_mapping_constraints(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _mk(spark, 200).withColumn("b", (F.col("k") % 2).cast("int"))
    V.append(df, src, partition_by=["b"])
    V.add_table_constraint(spark, src, "v_pos", "v >= 0")
    V.rename_column(src, "s", "label")
    V.delete_where(spark, src, "k >= 190", mode="dv")
    V.clone_table(src, dst)
    out = V.read_versioned(spark, dst)
    assert out.columns == ["k", "v", "label", "b"]
    assert out.count() == 190  # dv mask applies on the clone
    n, stats = V.count_versioned(spark, dst)
    assert n == 190 and stats["files_scanned"] == 0
    # partition-exact DML fast path carried over (metadata-only drop)
    V.delete_where(spark, dst, "b = 1")
    m = json.load(
        open(sorted(glob.glob(os.path.join(dst, "_txlog", "v*.json")))[-1])
    )
    assert m["added"] == [] and m["meta"]["partition_exact"] is True
    assert V.read_versioned(spark, dst).count() == 95
    # constraints enforce on the clone's writers
    with pytest.raises(V.ConstraintViolation):
        V.append(
            spark.range(1).selectExpr(
                "id as k", "-5 as v", "'x' as label",
                "cast(0 as int) as b",
            ),
            dst,
        )
    # source unaffected by all of it
    assert V.read_versioned(spark, src).count() == 190


def test_clone_cli(spark, tmp_path, capsys):
    from aws_glue_data_catalog_replication_utility_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.append(_mk(spark, 30), src)
    assert main([
        "vstore", "--root", src, "--op", "clone", "--out", dst,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"version": 1, "action": "clone", "dst": dst}
    assert V.read_versioned(spark, dst).count() == 30
