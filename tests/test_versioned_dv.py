"""Deletion vectors (versioned.delete_where(mode="dv")): merge-on-read
deletes that never rewrite a data file. The contract under attack:
bit-identical reads vs rewrite-mode on every surface (snapshot, time
travel, counts, merge, optimize, rollback, vacuum, checkpoint+prune),
zero data-file churn, and no resurrection of dv-deleted rows through
any rewrite path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    # None-safe canonical ordering (evolved reads NULL-pad old rows)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_dv_delete_matches_rewrite_and_rewrites_nothing(
    spark, orders, tmp_path
):
    ra = str(tmp_path / "rewrite")
    rb = str(tmp_path / "dv")
    for root in (ra, rb):
        V.append(orders.repartition(4), root)
    live_before, _ = V._replay(rb, None)
    sizes = {
        f: os.path.getsize(os.path.join(rb, f)) for f in live_before
    }

    V.delete_where(spark, ra, "o_custkey % 7 = 0")  # copy-on-write
    V.delete_where(spark, rb, "o_custkey % 7 = 0", mode="dv")

    # same logical table...
    assert _rows(V.read_versioned(spark, rb)) == _rows(
        V.read_versioned(spark, ra)
    )
    # ...but the dv store rewrote NOTHING: live set and bytes identical
    live_after, _ = V._replay(rb, None)
    assert live_after == live_before
    for f, sz in sizes.items():
        assert os.path.getsize(os.path.join(rb, f)) == sz
    # the manifest carries the dv + per-file counts, no added/removed
    with open(V._manifests(rb)[-1][1]) as fh:
        m = json.load(fh)
    assert m["action"] == "delete" and m["meta"]["mode"] == "dv"
    assert m["added"] == [] and m["removed"] == []
    assert sum(m["dv_rows"].values()) == orders.where(
        "o_custkey % 7 = 0"
    ).count()
    # time travel to v1 still shows everything
    assert _rows(V.read_versioned(spark, rb, 1)) == _rows(orders)


def test_dv_count_versioned_stays_metadata_only(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders.repartition(3), root)
    V.delete_where(spark, root, "o_orderkey % 5 = 0", mode="dv")
    want = orders.where("o_orderkey % 5 != 0").count()
    n, info = V.count_versioned(spark, root)
    assert n == want
    assert info["files_scanned"] == 0  # counts never opened a file
    d = V.describe_detail(root)
    assert d["num_rows"] == want
    assert d["num_deletion_vectors"] == 1
    assert d["dv_deleted_rows"] == orders.count() - want


def test_dv_deletes_compose_and_redelete_is_noop(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    v2 = V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")
    # re-deleting the same rows finds only already-masked positions:
    # NO new version (the probe may hit, but the dv comes out empty)
    assert V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv") == v2
    assert not [
        d for d in os.listdir(os.path.join(root, "_dv"))
    ][2:]  # no orphan dv dir beyond the one committed
    # a second, different dv composes with the first
    V.delete_where(spark, root, "o_custkey % 11 = 0", mode="dv")
    want = orders.where(
        "o_custkey % 7 != 0 AND o_custkey % 11 != 0"
    )
    assert _rows(V.read_versioned(spark, root)) == _rows(want)
    n, _ = V.count_versioned(spark, root)
    assert n == want.count()


def test_dv_rows_never_resurrect_through_rewrites(spark, orders, tmp_path):
    """A rewrite-mode delete / MERGE / optimize over dv-masked files
    must apply the mask before re-staging survivors."""
    root = str(tmp_path / "t")
    V.append(orders.repartition(2), root)
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")

    # rewrite-mode delete of OTHER rows in the same files
    V.delete_where(spark, root, "o_orderkey % 2 = 0")
    want = orders.where("o_custkey % 7 != 0 AND o_orderkey % 2 != 0")
    assert _rows(V.read_versioned(spark, root)) == _rows(want)

    # MERGE: update some survivors; dv'd rows stay gone
    upd = want.limit(5).withColumn("o_totalprice", F.lit(1.0))
    V.merge_into(spark, root, upd, ["o_orderkey"])
    got = V.read_versioned(spark, root)
    oracle = want.join(
        upd.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(upd)
    assert _rows(got) == _rows(oracle)

    # full OPTIMIZE compacts to clean files; mask no longer needed
    V.optimize(spark, root, target_file_bytes=1 << 26)
    assert _rows(V.read_versioned(spark, root)) == _rows(oracle)
    # post-optimize the dv counts are fully stale: checkpoint drops dvs
    V.checkpoint(root)
    with open(V._checkpoints(root)[-1][1]) as fh:
        c = json.load(fh)
    assert "dvs" not in c


def test_dv_merge_can_reinsert_deleted_key(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    victim = orders.select("o_orderkey").first().o_orderkey
    V.delete_where(spark, root, f"o_orderkey = {victim}", mode="dv")
    assert (
        V.read_versioned(spark, root)
        .where(F.col("o_orderkey") == victim)
        .count()
        == 0
    )
    upd = spark.createDataFrame(
        [(int(victim), -1, 9.5)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    )
    V.merge_into(spark, root, upd, ["o_orderkey"])
    got = (
        V.read_versioned(spark, root)
        .where(F.col("o_orderkey") == victim)
        .collect()
    )
    assert [(r.o_custkey, r.o_totalprice) for r in got] == [(-1, 9.5)]


def test_dv_rollback_restores_and_reapplies_masks(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)  # v1
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")  # v2
    # rollback to v1: dv'd rows resurrect
    V.rollback(spark, root, 1)  # v3
    assert _rows(V.read_versioned(spark, root)) == _rows(orders)
    # rollback to v2: the mask applies again
    V.rollback(spark, root, 2)  # v4
    assert _rows(V.read_versioned(spark, root)) == _rows(
        orders.where("o_custkey % 7 != 0")
    )
    n, _ = V.count_versioned(spark, root)
    assert n == orders.where("o_custkey % 7 != 0").count()


def test_dv_state_survives_checkpoint_and_prune(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")
    want = _rows(V.read_versioned(spark, root))
    V.checkpoint(root)
    V.prune_log(root)
    assert V._manifests(root) == []  # the dv manifest is gone
    assert _rows(V.read_versioned(spark, root)) == want
    n, info = V.count_versioned(spark, root)
    assert n == len(want) and info["files_scanned"] == 0
    # and further commits on top keep the mask
    V.append(orders.limit(3).withColumn("o_custkey", F.lit(-1)), root)
    assert V.read_versioned(spark, root).count() == len(want) + 3


def test_dv_vacuum_reclaims_expired_masks_only(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)  # v1
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")  # v2
    V.overwrite(orders.limit(10), root)  # v3: resets dv state
    V.delete_where(spark, root, "o_orderkey < 3", mode="dv")  # v4
    assert len(os.listdir(os.path.join(root, "_dv"))) == 2
    rep = V.vacuum(root, keep_last=2, retention_seconds=0.0)
    assert rep["dv_removed"] == 1  # v2's mask expired with v1/v2
    assert len(os.listdir(os.path.join(root, "_dv"))) == 1
    got = V.read_versioned(spark, root)
    assert got.count() == orders.limit(10).where("o_orderkey >= 3").count()


def test_dv_across_schema_generations(spark, orders, tmp_path):
    """dv-mode delete over a store whose live files span TWO origin
    schemas: matches are computed per generation, widened to the LUB,
    and the masked read equals the rewrite-mode result."""
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    gen2 = orders.limit(200).withColumn("tag", F.lit("g2"))
    for root in (ra, rb):
        V.append(orders.repartition(2), root)
        V.append(gen2, root)
    V.delete_where(spark, ra, "o_custkey % 5 = 0")
    V.delete_where(spark, rb, "o_custkey % 5 = 0", mode="dv")
    assert _rows(V.read_versioned(spark, rb)) == _rows(
        V.read_versioned(spark, ra)
    )


def test_dv_mode_validation(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    with pytest.raises(ValueError, match="mode"):
        V.delete_where(spark, root, "o_orderkey < 0", mode="nope")
    # no matches: no version, no dv dir
    v = V.delete_where(spark, root, "o_orderkey < 0", mode="dv")
    assert v == 1
    assert not os.path.isdir(os.path.join(root, "_dv"))


def test_optimize_purge_dvs_rewrites_only_masked_files(
    spark, orders, tmp_path
):
    """optimize(purge_dvs=True): the masked files are rewritten with
    their masks applied, unmasked files stay live byte-identical, the
    table reads identically, and the next checkpoint compacts the
    fully-stale dv relations away."""
    root = str(tmp_path / "t")
    # lay out so the dv touches SOME files only
    V.append(
        spark.range(0, 400)
        .selectExpr("id as k", "id * 2 as w")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k"),
        root,
    )
    V.delete_where(spark, root, "k < 150", mode="dv")  # masks 2 of 4
    live_before, _ = V._replay(root, None)
    masked = set(V._replay_dvs(root, None)[1])
    untouched = [f for f in live_before if f not in masked]
    assert 0 < len(masked) < len(live_before)
    sizes = {
        f: os.path.getsize(os.path.join(root, f)) for f in untouched
    }
    want = _rows(V.read_versioned(spark, root))

    v = V.optimize(spark, root, purge_dvs=True)
    live_after, _ = V._replay(root, None)
    for f in untouched:  # unmasked files survive byte-identical
        assert f in live_after
        assert os.path.getsize(os.path.join(root, f)) == sizes[f]
    for f in masked:
        assert f not in live_after
    assert _rows(V.read_versioned(spark, root)) == want
    with open(V._manifests(root)[-1][1]) as fh:
        m = json.load(fh)
    assert m["meta"]["purge_dvs"] is True
    # nothing left to purge: no new version
    assert V.optimize(spark, root, purge_dvs=True) == v
    # the stale dv compacts out of the checkpoint
    V.checkpoint(root)
    with open(V._checkpoints(root)[-1][1]) as fh:
        assert "dvs" not in json.load(fh)
    with pytest.raises(ValueError, match="exclusive"):
        V.optimize(spark, root, purge_dvs=True, zorder_by=["k"])


def test_update_where_matches_dataframe_oracle(spark, orders, tmp_path):
    """UPDATE ... SET: matching rows transformed (all RHS see the
    pre-update row), non-matching and NULL-predicate rows unchanged,
    untouched files byte-identical, schema stable, time travel shows
    the pre-update table."""
    root = str(tmp_path / "t")
    V.append(orders.repartition(4), root)
    live_v1, _ = V._replay(root, None)
    sizes = {f: os.path.getsize(os.path.join(root, f)) for f in live_v1}

    v = V.update_where(
        spark, root, "o_custkey % 7 = 0",
        {"o_totalprice": "o_totalprice * 2 + o_custkey",
         "o_custkey": "-o_custkey"},
    )
    assert v == 2
    got = V.read_versioned(spark, root)
    cond = F.coalesce(F.expr("o_custkey % 7 = 0"), F.lit(False))
    want = orders.withColumns(
        {
            "o_totalprice": F.when(
                cond, F.expr("o_totalprice * 2 + o_custkey")
            ).otherwise(F.col("o_totalprice")),
            "o_custkey": F.when(cond, F.expr("-o_custkey")).otherwise(
                F.col("o_custkey")
            ),
        }
    )
    assert _rows(got) == _rows(want)
    assert got.schema == orders.schema
    # time travel: v1 is the pre-update table
    assert _rows(V.read_versioned(spark, root, 1)) == _rows(orders)
    # files without matches stayed live and byte-identical
    live_v2, _ = V._replay(root, None)
    for f in live_v1:
        if f in live_v2:
            assert os.path.getsize(os.path.join(root, f)) == sizes[f]
    with open(V._manifests(root)[-1][1]) as fh:
        m = json.load(fh)
    assert m["action"] == "update"
    assert m["meta"]["assignments"]["o_custkey"] == "-o_custkey"
    # no-match update: no new version
    assert V.update_where(
        spark, root, "o_orderkey < 0", {"o_totalprice": "0.0"}
    ) == 2
    with pytest.raises(ValueError, match="unknown column"):
        V.update_where(spark, root, "o_orderkey = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="non-empty"):
        V.update_where(spark, root, "o_orderkey = 1", {})


def test_update_where_respects_dvs_and_constraints(
    spark, orders, tmp_path
):
    root = str(tmp_path / "t")
    V.append(orders, root)
    V.add_table_constraint(spark, root, "pos", "o_totalprice >= 0.0")
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")
    # updating a superset predicate: dv'd rows neither update nor
    # resurrect
    V.update_where(
        spark, root, "o_custkey % 7 = 0 OR o_custkey % 5 = 0",
        {"o_totalprice": "o_totalprice + 1.0"},
    )
    got = V.read_versioned(spark, root)
    assert got.where("o_custkey % 7 = 0").count() == 0
    base = orders.where("o_custkey % 7 != 0")
    want = base.withColumn(
        "o_totalprice",
        F.when(
            F.expr("o_custkey % 5 = 0"), F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    assert _rows(got) == _rows(want)
    # a constraint-violating UPDATE raises BEFORE any version lands
    n_before = len(V.history(root))
    with pytest.raises(V.ConstraintViolation):
        V.update_where(
            spark, root, "o_custkey % 3 = 0", {"o_totalprice": "-1.0"}
        )
    assert len(V.history(root)) == n_before
    assert _rows(V.read_versioned(spark, root)) == _rows(want)


def test_dv_update_matches_rewrite_on_every_surface(
    spark, orders, tmp_path
):
    """update_where(mode="dv"): ONE commit masks the matched rows and
    appends the transformed rows — bit-identical to rewrite-mode on
    snapshot read, count, time travel, and history shape, with ZERO
    pre-existing data files rewritten or removed."""
    ra = str(tmp_path / "rewrite")
    rb = str(tmp_path / "dv")
    for root in (ra, rb):
        V.append(orders.repartition(4), root)
    live_before, _ = V._replay(rb, None)
    sizes = {
        f: os.path.getsize(os.path.join(rb, f)) for f in live_before
    }

    pred = "o_custkey % 7 = 0"
    sets = {"o_totalprice": "o_totalprice * 2 + o_custkey",
            "o_custkey": "-o_custkey"}
    V.update_where(spark, ra, pred, sets)
    V.update_where(spark, rb, pred, sets, mode="dv")

    # same logical table on both stores
    assert _rows(V.read_versioned(spark, rb)) == _rows(
        V.read_versioned(spark, ra)
    )
    assert (
        V.read_versioned(spark, rb).schema
        == V.read_versioned(spark, ra).schema
    )
    # counts stay metadata-only AND agree (mask subtracts, append adds)
    na, ia = V.count_versioned(spark, ra)
    nb, ib = V.count_versioned(spark, rb)
    assert na == nb == orders.count()
    assert ib["files_scanned"] == 0
    # the dv store removed nothing and every original file is
    # byte-identical; only NEW files were added
    live_after, _ = V._replay(rb, None)
    assert set(live_before) <= set(live_after)
    for f, sz in sizes.items():
        assert os.path.getsize(os.path.join(rb, f)) == sz
    with open(V._manifests(rb)[-1][1]) as fh:
        m = json.load(fh)
    assert m["action"] == "update" and m["meta"]["mode"] == "dv"
    assert m["removed"] == [] and len(m["added"]) >= 1
    assert sum(m["dv_rows"].values()) == orders.where(pred).count()
    # time travel: v1 is the pre-update table
    assert _rows(V.read_versioned(spark, rb, 1)) == _rows(orders)


def test_dv_update_composes_with_prior_masks_and_cdc(
    spark, orders, tmp_path
):
    """A dv UPDATE over a store carrying a prior dv DELETE: masked
    rows neither update nor resurrect, and the change feed emits
    row-level delete (old values) + insert (new values)."""
    root = str(tmp_path / "t")
    V.append(orders, root)  # v1
    V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")  # v2
    V.update_where(
        spark, root, "o_custkey % 7 = 0 OR o_custkey % 5 = 0",
        {"o_totalprice": "o_totalprice + 1.0"}, mode="dv",
    )  # v3
    base = orders.where("o_custkey % 7 != 0")
    want = base.withColumn(
        "o_totalprice",
        F.when(
            F.expr("o_custkey % 5 = 0"), F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    got = V.read_versioned(spark, root)
    assert got.where("o_custkey % 7 = 0").count() == 0
    assert _rows(got) == _rows(want)
    # keyed CDC between v2 and v3: exactly the updated keys, as updates
    ch = V.changes_between(spark, root, 2, 3, keys=["o_orderkey"])
    by_change = {
        r["change"]: r["n"]
        for r in ch.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    n_upd = base.where("o_custkey % 5 = 0").count()
    assert by_change.get("update", 0) == n_upd
    assert by_change.get("insert", 0) == 0
    assert by_change.get("delete", 0) == 0
    # a second identical dv update re-matches (values changed, so the
    # predicate still holds) — but a fully-masked predicate is a no-op
    v = V._manifests(root)[-1][0]
    assert V.update_where(
        spark, root, "o_custkey % 7 = 0",
        {"o_totalprice": "0.0"}, mode="dv",
    ) == v  # all matches already masked: no new version


def test_dv_update_purge_rollback_checkpoint(spark, orders, tmp_path):
    """The maintenance loop over a dv UPDATE: purge_dvs retires the
    masks, rollback restores the pre-update snapshot, checkpoint+prune
    preserve the masked read."""
    root = str(tmp_path / "t")
    V.append(orders.repartition(3), root)  # v1
    V.update_where(
        spark, root, "o_custkey % 7 = 0",
        {"o_totalprice": "-o_totalprice"}, mode="dv",
    )  # v2
    want = _rows(V.read_versioned(spark, root))
    # checkpoint + prune: masked read survives log compaction
    V.checkpoint(root)
    V.prune_log(root)
    assert _rows(V.read_versioned(spark, root)) == want
    # purge: masks retire, content identical, no live file masked;
    # the next checkpoint compacts the fully-stale relation away
    V.optimize(spark, root, purge_dvs=True)
    assert _rows(V.read_versioned(spark, root)) == want
    live = set(V._replay(root, None)[0])
    assert not (set(V._replay_dvs(root, None)[1]) & live)
    V.checkpoint(root)
    with open(V._checkpoints(root)[-1][1]) as fh:
        assert "dvs" not in json.load(fh)
    n, info = V.count_versioned(spark, root)
    assert n == len(want) and info["files_scanned"] == 0


def test_dv_update_rollback_restores_pre_update(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)  # v1
    V.update_where(
        spark, root, "o_custkey % 7 = 0",
        {"o_totalprice": "-1.0"}, mode="dv",
    )  # v2
    V.rollback(spark, root, 1)  # v3
    assert _rows(V.read_versioned(spark, root)) == _rows(orders)
    # roll forward again: the mask + appended rows reapply
    V.rollback(spark, root, 2)  # v4
    assert _rows(V.read_versioned(spark, root)) == _rows(
        V.read_versioned(spark, root, 2)
    )
    n, _ = V.count_versioned(spark, root)
    assert n == orders.count()


def test_update_constraint_preview_sees_pre_update_rows(
    spark, orders, tmp_path
):
    """Regression (r12 builder-found): the constraint preview must
    select matched rows by their PRE-update values. A self-referencing
    UPDATE (predicate o_custkey = k, assignment o_custkey -> -1)
    changes the predicate column, so filtering AFTER the transform
    validated an empty set and a constraint-violating version could
    commit. Both modes must refuse."""
    k = orders.select("o_custkey").first().o_custkey
    for mode in ("rewrite", "dv"):
        root = str(tmp_path / f"t_{mode}")
        V.append(orders, root)
        V.add_table_constraint(
            spark, root, "ck_pos", "o_custkey >= 0"
        )
        n_before = len(V.history(root))
        with pytest.raises(V.ConstraintViolation):
            V.update_where(
                spark, root, f"o_custkey = {k}",
                {"o_custkey": "-1"}, mode=mode,
            )
        assert len(V.history(root)) == n_before
        assert _rows(V.read_versioned(spark, root)) == _rows(orders)


def test_dv_commit_counting_is_distributed(spark, orders, tmp_path):
    """Pin for VERDICT r11 #1: the dv commit path must never
    materialize O(deleted rows) on the driver — the per-file counts
    come from a Spark aggregate, and NO pyarrow table read happens
    anywhere in a dv-mode DELETE or UPDATE."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    V.append(orders.repartition(3), root)
    real = pq.read_table
    calls = []

    def spy(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    pq.read_table = spy
    try:
        V.delete_where(spark, root, "o_custkey % 7 = 0", mode="dv")
        V.update_where(
            spark, root, "o_custkey % 5 = 0",
            {"o_totalprice": "0.0"}, mode="dv",
        )
    finally:
        pq.read_table = real
    assert calls == []  # counting ran as a Spark job, not pyarrow
    with open(V._manifests(root)[-1][1]) as fh:
        m = json.load(fh)
    assert sum(m["dv_rows"].values()) == orders.where(
        "o_custkey % 7 != 0 AND o_custkey % 5 = 0"
    ).count()


def test_dv_update_on_partitioned_table(spark, orders, tmp_path):
    """dv UPDATE on a hive-partitioned store: appended rows keep the
    one-tuple-per-file invariant, partition-column assignment refused,
    partition DML still works afterwards."""
    root = str(tmp_path / "t")
    df = orders.withColumn("bucket", F.expr("o_orderkey % 3"))
    V.append(df, root, partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition column"):
        V.update_where(
            spark, root, "o_custkey = 1", {"bucket": "0"}, mode="dv"
        )
    V.update_where(
        spark, root, "o_custkey % 7 = 0",
        {"o_totalprice": "o_totalprice + 0.5"}, mode="dv",
    )
    cond = F.coalesce(F.expr("o_custkey % 7 = 0"), F.lit(False))
    want = df.withColumn(
        "o_totalprice",
        F.when(cond, F.col("o_totalprice") + 0.5).otherwise(
            F.col("o_totalprice")
        ),
    )
    assert _rows(V.read_versioned(spark, root)) == _rows(want)
    # every live file still maps to exactly one partition tuple
    _cols, parts = V._partition_state(root, None)
    live, _ = V._replay(root, None)
    assert set(live) == set(parts)
    # partition-exact DELETE still metadata-only on top of the dv state
    V.delete_where(spark, root, "bucket = 1")
    assert _rows(V.read_versioned(spark, root)) == _rows(
        want.where("bucket != 1")
    )
