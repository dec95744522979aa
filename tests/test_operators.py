"""Unit tests for the relational operator library (SURVEY.md §5.1):
reference edge cases — empty prefix bypass, 10/11 threshold boundary,
the 4 partition-sync cases, merge outcome flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.operators import (
    apply_merge,
    exists_semi,
    full_refresh_sync,
    latest_by,
    merge_outcomes,
    missing_anti,
    prefix_semi_join,
    threshold_route,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- joins


def test_exists_and_anti(spark):
    left = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    right = _df(spark, [(2,), (3,), (3,)], "id int")
    assert {r.id for r in exists_semi(left, right, ["id"]).collect()} == {2, 3}
    assert {r.id for r in missing_anti(left, right, ["id"]).collect()} == {1}


def test_prefix_semi_join_matches_case_insensitively(spark):
    dbs = _df(
        spark,
        [("raw_data_x",), ("RAW_DATA_Y",), ("processed_z",), ("tmp_1",)],
        "name string",
    )
    got = {r.name for r in prefix_semi_join(dbs, ["raw_data_", "TMP_"]).collect()}
    assert got == {"raw_data_x", "RAW_DATA_Y", "tmp_1"}


def test_prefix_empty_bypass_returns_everything(spark):
    # GDCReplicationPlanner.java:70-81 — empty config means export all
    dbs = _df(spark, [("a",), ("b",)], "name string")
    assert prefix_semi_join(dbs, []).count() == 2
    assert prefix_semi_join(dbs, [""]).count() == 2


def test_prefix_dataframe_variant(spark):
    dbs = _df(spark, [("raw_1",), ("cooked_2",)], "name string")
    prefixes = _df(spark, [("raw_",)], "prefix string")
    got = prefix_semi_join(dbs, prefixes).collect()
    assert [r.name for r in got] == ["raw_1"]


# -------------------------------------------------------------- routing


def test_threshold_boundary_10_vs_11(spark):
    # ExportDatabaseWithTables.java:73,174 — <=10 inline, >10 large
    items = _df(spark, [("t10",), ("t11",), ("t0",)], "name string")
    children = _df(
        spark,
        [("t10", i) for i in range(10)] + [("t11", i) for i in range(11)],
        "name string, p int",
    )
    routed = {
        r.name: (r.n_children, r.route)
        for r in threshold_route(items, children, ["name"], threshold=10).collect()
    }
    assert routed["t10"] == (10, "inline")
    assert routed["t11"] == (11, "large")
    assert routed["t0"] == (0, "inline")  # empty partition list publishes inline


# ---------------------------------------------------------------- merge


def test_merge_outcomes_all_four_actions(spark):
    target = _df(spark, [(1, "same"), (2, "old"), (4, "keepme")], "id int, v string")
    source = _df(spark, [(1, "same"), (2, "new"), (3, "created")], "id int, v string")
    out = {r.id: (r.merge_action, r.v) for r in merge_outcomes(source, target, ["id"]).collect()}
    assert out[1] == ("skip", "same")
    assert out[2] == ("update", "new")
    assert out[3] == ("create", "created")
    assert out[4] == ("keep", "keepme")


def test_merge_null_safe_comparison(spark):
    target = _df(spark, [(1, None), (2, "x")], "id int, v string")
    source = _df(spark, [(1, None), (2, None)], "id int, v string")
    out = {r.id: r.merge_action for r in merge_outcomes(source, target, ["id"]).collect()}
    assert out[1] == "skip"  # null == null must not read as change
    assert out[2] == "update"


def test_merge_compares_map_and_nested_struct_columns(spark):
    # the real catalog schemas compare `parameters` (map<string,string>)
    # and `storage_descriptor` (struct nesting maps) — <=> rejects maps,
    # so these must go through the canonicalizer (VERDICT r01 #1)
    schema = (
        "id int, parameters map<string,string>, "
        "sd struct<location:string,serde:struct<lib:string,parameters:map<string,string>>>"
    )
    target = _df(
        spark,
        [
            (1, {"a": "1", "b": "2"}, ("s3://x", ("lib1", {"k": "v"}))),
            (2, {"a": "1"}, ("s3://y", ("lib1", {}))),
            (3, None, (None, None)),
        ],
        schema,
    )
    source = _df(
        spark,
        [
            # same map content (entry order is irrelevant for maps) -> skip
            (1, {"b": "2", "a": "1"}, ("s3://x", ("lib1", {"k": "v"}))),
            # nested serde parameter changed -> update
            (2, {"a": "1"}, ("s3://y", ("lib1", {"new": "param"}))),
            # null map/struct on both sides -> skip
            (3, None, (None, None)),
            (4, {"fresh": "row"}, ("s3://z", ("lib2", {}))),
        ],
        schema,
    )
    out = {r.id: r.merge_action for r in merge_outcomes(source, target, ["id"]).collect()}
    assert out == {1: "skip", 2: "update", 3: "skip", 4: "create"}


def test_merge_compares_arrays_of_maps(spark):
    # the recursive canonicalizer path for ArrayType(MapType): element
    # maps compare by entry SET (order-free), array order still matters
    schema = "id int, arr array<map<string,string>>"
    target = _df(
        spark,
        [(1, [{"a": "1", "b": "2"}]), (2, [{"x": "1"}, {"y": "2"}]), (3, None)],
        schema,
    )
    source = _df(
        spark,
        [
            (1, [{"b": "2", "a": "1"}]),  # same entries, reordered -> skip
            (2, [{"y": "2"}, {"x": "1"}]),  # array ORDER differs -> update
            (3, None),  # null == null -> skip
        ],
        schema,
    )
    out = {r.id: r.merge_action for r in merge_outcomes(source, target, ["id"]).collect()}
    assert out == {1: "skip", 2: "update", 3: "skip"}


def test_apply_merge_idempotent(spark):
    target = _df(spark, [(1, "a"), (2, "b")], "id int, v string")
    source = _df(spark, [(2, "B"), (3, "c")], "id int, v string")
    once = apply_merge(source, target, ["id"])
    twice = apply_merge(source, once, ["id"])
    assert sorted((r.id, r.v) for r in once.collect()) == sorted(
        (r.id, r.v) for r in twice.collect()
    ) == [(1, "a"), (2, "B"), (3, "c")]


# ----------------------------------------------------------------- sync


def test_full_refresh_four_cases(spark):
    # README.md:266-273 semantics, orders≙tables / parts≙partitions
    # t1: in export, export has parts  -> replaced wholesale
    # t2: in export, export has none   -> wiped
    # t3: not in export, target has    -> untouched
    # t4: in export, target empty      -> added
    exported_tables = _df(spark, [("t1",), ("t2",), ("t4",)], "tbl string")
    exported_parts = _df(
        spark, [("t1", "p-new"), ("t4", "p-added")], "tbl string, p string"
    )
    target_parts = _df(
        spark,
        [("t1", "p-old1"), ("t1", "p-old2"), ("t2", "p-gone"), ("t3", "p-stays")],
        "tbl string, p string",
    )
    got = sorted(
        (r.tbl, r.p)
        for r in full_refresh_sync(
            exported_parts, exported_tables, target_parts, keys=["tbl"]
        ).collect()
    )
    assert got == [("t1", "p-new"), ("t3", "p-stays"), ("t4", "p-added")]


# ----------------------------------------------------------------- skew


def test_salted_join_equals_plain_join(spark):
    from aws_glue_data_catalog_replication_utility_spark.operators.skew import (
        salted_join,
    )

    # one hot key (k=1 carries 200 rows) + normal keys
    big = _df(
        spark,
        [(1, i) for i in range(200)] + [(2, 900), (3, 901)],
        "k int, payload int",
    )
    small = _df(spark, [(1, "hot"), (2, "warm"), (4, "unmatched")], "k int, tag string")
    expected = sorted(
        (r.k, r.payload, r.tag) for r in big.join(small, "k").collect()
    )
    for buckets in (1, 4, 16):
        got = sorted(
            (r.k, r.payload, r.tag)
            for r in salted_join(big, small, ["k"], buckets=buckets).collect()
        )
        assert got == expected


# ------------------------------------------------------- asof/range join


def test_asof_join_inclusive_and_null_before_first(spark):
    import datetime as dt

    from aws_glue_data_catalog_replication_utility_spark.operators import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(0), "e0"), (1, t(10), "e1"), (1, t(20), "e2"), (2, t(5), "e3")],
        "k int, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(15), 200.0)],
        "k int, ts timestamp_ntz, v double",
    )
    got = {r.tag: r.v for r in asof_join(left, right, by=["k"]).collect()}
    assert got["e0"] is None  # before any right row
    assert got["e1"] == 100.0  # equal ts is INCLUSIVE
    assert got["e2"] == 200.0  # latest at-or-before
    assert got["e3"] is None  # key with no right rows at all


def test_asof_join_null_values_propagate_from_latest_row(spark):
    """A genuine NULL in the latest right row must NOT be papered over by
    an older non-null value, and with several value_cols every output
    field must come from the SAME right row (standard ASOF semantics)."""
    import datetime as dt

    from aws_glue_data_catalog_replication_utility_spark.operators import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(20), "e")], "k int, ts timestamp_ntz, tag string"
    )
    right = spark.createDataFrame(
        [(1, t(5), 100.0, "old"), (1, t(10), None, None)],
        "k int, ts timestamp_ntz, v double, label string",
    )
    (row,) = asof_join(left, right, by=["k"]).collect()
    # latest right row (t=10) has NULLs in both value columns: they win
    assert row.v is None
    assert row.label is None


def test_bucketed_range_join_boundaries_match_naive(spark):
    import datetime as dt

    from aws_glue_data_catalog_replication_utility_spark.operators import (
        bucketed_range_join,
    )

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    points = spark.createDataFrame(
        [(1, t(0), "p0"), (1, t(30), "p1"), (1, t(60), "p2"), (1, t(61), "p3")],
        "k int, ts timestamp_ntz, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, t(0), t(60), "i1"), (1, t(45), t(61), "i2"), (2, t(0), t(60), "i3")],
        "k int, start_ts timestamp_ntz, end_ts timestamp_ntz, iid string",
    )
    # tiny bucket width (60s) forces multi-bucket interval expansion
    got = sorted(
        (r.tag, r.iid)
        for r in bucketed_range_join(
            points, intervals, by=["k"], width_seconds=60
        ).collect()
    )
    naive = sorted(
        (r.tag, r.iid)
        for r in points.join(
            intervals,
            on=[
                points.k == intervals.k,
                points.ts >= intervals.start_ts,
                points.ts <= intervals.end_ts,
            ],
        ).collect()
    )
    assert got == naive
    assert ("p2", "i1") in got and ("p3", "i1") not in got  # ends inclusive


# --------------------------------------------------------------- window


def test_latest_by_with_tiebreak(spark):
    df = _df(
        spark,
        [(1, 10, "a"), (1, 10, "b"), (1, 9, "c"), (2, 5, "d")],
        "k int, run int, v string",
    )
    got = {r.k: r.v for r in latest_by(df, ["k"], "run", tiebreak=["v"]).collect()}
    assert got == {1: "b", 2: "d"}


# --------------------------------------------------- concurrency helper


def test_run_overlapped_result_error_and_idempotent_join():
    """The shared overlap primitive (q34/q55 writer, q53 CC towers,
    importer async fill): results come back through join(), side-thread
    exceptions re-raise on the caller thread (every time — a barrier
    callback may join twice), and join is safe to call repeatedly."""
    import pytest

    from aws_glue_data_catalog_replication_utility_spark.concurrency import (
        run_overlapped,
    )

    ok = run_overlapped(lambda: 42)
    assert ok.join() == 42
    assert ok.join() == 42

    def boom():
        raise RuntimeError("side-channel write failed")

    bad = run_overlapped(boom)
    with pytest.raises(RuntimeError, match="side-channel write failed"):
        bad.join()
    with pytest.raises(RuntimeError, match="side-channel write failed"):
        bad.join()


def test_snapshot_changeset_semantics_and_roundtrip(spark):
    """CDC diff of two keyed snapshots: one row per changed key only
    (insert/update/delete; unchanged keys — including a map column
    whose entry ORDER moved, which canonical equality must ignore —
    emit nothing), and the round-trip law holds:
    apply_changeset(old, changeset) == new."""
    from aws_glue_data_catalog_replication_utility_spark.operators.sync import (
        apply_changeset,
        snapshot_changeset,
    )

    schema = "k long, m map<string,string>, v string"
    old = spark.createDataFrame(
        [
            (1, {"a": "1", "b": "2"}, "one"),
            (2, {"x": "9"}, "two"),
            (3, None, "three"),
            (4, {"q": "7"}, "four"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, {"b": "2", "a": "1"}, "one"),   # map reordered: unchanged
            (2, {"x": "9"}, "TWO"),             # update (v changed)
            (4, {"q": "8"}, "four"),            # update (map value changed)
            (5, {"n": "5"}, "five"),            # insert
        ],  # 3 deleted
        schema,
    )
    cs = {r.k: r for r in snapshot_changeset(old, new, ["k"]).collect()}
    assert {k: r.change for k, r in cs.items()} == {
        2: "update", 3: "delete", 4: "update", 5: "insert"
    }
    assert cs[2].v == "TWO" and cs[5].v == "five"  # new payload
    assert cs[3].v == "three"                      # delete carries old payload

    replayed = sorted(
        (r.k, None if r.m is None else tuple(sorted(r.m.items())), r.v)
        for r in apply_changeset(
            old, snapshot_changeset(old, new, ["k"]), ["k"]
        ).collect()
    )
    want = sorted(
        (r.k, None if r.m is None else tuple(sorted(r.m.items())), r.v)
        for r in new.collect()
    )
    assert replayed == want


def test_snapshot_changeset_matches_duckdb_exactly(spark):
    """The changeset over a real keyed table agrees bit-for-bit with a
    DuckDB FULL OUTER JOIN + IS DISTINCT FROM oracle: new snapshot =
    orders with %13 keys deleted, %7 priorities rewritten, and a
    shifted-key insert slice."""
    import duckdb
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.operators.sync import (
        snapshot_changeset,
    )

    path = "/root/testdata/sf0.01/orders.parquet"
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    old = spark.read.parquet(path).select(*cols)
    new = (
        old.where(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("9-REWRITTEN")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .unionByName(
            old.where(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_orderpriority",
            )
        )
    )
    got = sorted(
        tuple(r)
        for r in snapshot_changeset(old, new, ["o_orderkey"])
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
                "change")
        .collect()
    )
    want = duckdb.connect().execute(f"""
        WITH old AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
          FROM '{path}'),
        new AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN '9-REWRITTEN'
                      ELSE o_orderpriority END AS o_orderpriority
          FROM old WHERE o_orderkey % 13 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
                 o_orderpriority
          FROM old WHERE o_orderkey % 17 = 0)
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               COALESCE(n.o_custkey, o.o_custkey) AS o_custkey,
               COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
               COALESCE(n.o_orderpriority, o.o_orderpriority)
                   AS o_orderpriority,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS change
        FROM new n FULL OUTER JOIN old o USING (o_orderkey)
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR n.o_custkey IS DISTINCT FROM o.o_custkey
           OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
           OR n.o_orderpriority IS DISTINCT FROM o.o_orderpriority
        ORDER BY 1
    """).fetchall()
    assert got == sorted(tuple(w) for w in want)
    assert len(got) > 0


def test_partition_sync_skew_plan_shapes(spark):
    """SURVEY 4.3(d): the (database_name, table_name) sync key skews —
    the reference fixture's single table carries 4.79M records / 744
    objects, so ONE table holding ~95% of partitions is the realistic
    shape. Two plan-level guarantees, both asserted here:

    1. The normal path NEVER shuffles the partition relation on the
       skewed key at all: the table scope is one row per table
       (metadata-sized), so the anti-join broadcasts it — skew cannot
       hurt a join whose big side never exchanges.
    2. When broadcast is impossible (a million-table catalog pushes the
       scope past the threshold), AQE's skew-join splits the hot
       partition at runtime (`skew=true` on the SMJ) — asserted by
       forcing SMJ and lowering the skew thresholds to fixture scale.
    Results are bit-identical on both paths.
    """
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.operators.sync import (
        full_refresh_sync,
    )

    def _loc():
        # incompressible payload: shuffle sizes are measured COMPRESSED,
        # and a constant location string would deflate the hot partition
        # below any realistic skew threshold
        return F.concat(
            F.lit("s3://bucket/"), F.md5(F.col("id").cast("string")),
            F.lit("/"), F.md5((F.col("id") + 1).cast("string")),
        )

    # ONE hot table with 95% of target partitions + 100 cold tables
    hot_n, cold_tables, cold_n = 60_000, 100, 30
    target = (
        spark.range(hot_n)
        .select(
            F.lit("db").alias("database_name"),
            F.lit("hot_table").alias("table_name"),
            _loc().alias("location"),
        )
        .unionByName(
            spark.range(cold_tables * cold_n).select(
                F.lit("db").alias("database_name"),
                F.concat(F.lit("t"), (F.col("id") % cold_tables)).alias(
                    "table_name"
                ),
                _loc().alias("location"),
            )
        )
        .localCheckpoint(eager=True)
    )
    # export refreshes the hot table and 10 cold ones
    exported_tables = spark.createDataFrame(
        [("db", "hot_table")] + [("db", f"t{i}") for i in range(10)],
        "database_name string, table_name string",
    )
    exported_parts = spark.createDataFrame(
        [("db", "hot_table", "p=new0"), ("db", "t0", "p=new1")],
        "database_name string, table_name string, location string",
    )

    out = full_refresh_sync(exported_parts, exported_tables, target)
    physical = out._jdf.queryExecution().executedPlan().toString()
    # path 1 (default): the scope broadcasts by HINT (not by stats), so
    # the 60k-row partition relation never exchanges on the skewed key
    assert "BroadcastHashJoin" in physical and "LeftAnti" in physical
    # exactly ONE hash exchange: the scope's own dedup (metadata-sized,
    # one row per exported table); the partition relation reaches the
    # join without shuffling
    assert physical.count("Exchange hashpartitioning") == 1
    n_bcast = out.count()
    want = (
        cold_tables * cold_n - 10 * cold_n  # 10 cold tables wiped
        + 2  # new partitions
    )
    assert n_bcast == want

    # path 2 (broadcast_scope=False, million-table-catalog shape):
    # shuffled anti-join + fixture-scale skew thresholds -> AQE splits
    # the hot key's partition at runtime (skew=true on the SMJ)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out2 = full_refresh_sync(
            exported_parts, exported_tables, target, broadcast_scope=False
        )
        # collect() drives THIS DataFrame's own QueryExecution, so the
        # adaptive plan below is the FINAL one (count() would build and
        # finalize a different plan tree)
        assert len(out2.collect()) == want  # same answer on the SMJ path
        executed = out2._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in executed and "LeftAnti" in executed
        assert "skew=true" in executed  # AQE split the hot key's partition
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
