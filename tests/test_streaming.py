"""Streaming leg tests (SURVEY.md §2B #17): the event plane consumed via
readStream + foreachBatch running the same idempotent import plan, with
checkpointed micro-batches; plus the event-time windowed rollup matching
its batch shape. Proves the effectively-once property the reference gets
from at-least-once redelivery + idempotent apply
(ExportLargeTable.java:136-141, ImportLambda redelivery)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.model import sample_catalog
from aws_glue_data_catalog_replication_utility_spark.plans.export import export_catalog
from aws_glue_data_catalog_replication_utility_spark.plans.importer import import_events
from aws_glue_data_catalog_replication_utility_spark.plans.planner import plan_replication
from aws_glue_data_catalog_replication_utility_spark.streaming import (
    dedupe_events,
    latest_version,
    read_audit,
    read_state,
    session_rollup,
    start_event_stream,
    windowed_rollup,
)


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    side = str(root / "side_channel")
    events_dir = str(root / "events")
    state_root = str(root / "state")

    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", run_id=7, batch_id="b1"
    )
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        run_id=7, side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    # multiple files -> multiple micro-batches under maxFilesPerTrigger=1
    events.repartition(3).write.mode("overwrite").json(events_dir)

    q = start_event_stream(
        spark,
        events_dir,
        state_root,
        checkpoint_path=str(root / "ckpt1"),
        side_channel_path=side,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    return {
        "events": events,
        "events_dir": events_dir,
        "state_root": state_root,
        "side": side,
        "root": root,
        "src": (src_dbs, src_tables, src_parts),
    }


def test_stream_state_matches_batch_import(spark, stream_env):
    sdbs, stables, sparts = read_state(spark, stream_env["state_root"])
    # the batch job over the same full event set is the oracle
    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog

    d, t, p = empty_catalog(spark)
    batch = import_events(
        spark, stream_env["events"], d, t, p, side_channel_path=stream_env["side"]
    )
    assert {r.name for r in sdbs.collect()} == {r.name for r in batch.databases.collect()}
    assert sorted(
        (r.database_name, r.name) for r in stables.collect()
    ) == sorted((r.database_name, r.name) for r in batch.tables.collect())
    assert sparts.count() == batch.partitions.count() == 2 * (0 + 3 + 10 + 11 + 31)
    # more than one micro-batch actually ran
    assert latest_version(stream_env["state_root"]) >= 2


def test_stream_replay_is_effectively_once(spark, stream_env):
    """Re-deliver EVERY event (fresh checkpoint = full replay) against the
    already-applied state: state content must not change and the replay's
    audit must be all-skip — at-least-once redelivery + idempotent MERGE
    == effectively-once."""
    state_root = stream_env["state_root"]
    before_dbs, before_tables, before_parts = read_state(spark, state_root)
    n_dbs, n_tables, n_parts = (
        before_dbs.count(), before_tables.count(), before_parts.count(),
    )
    q = start_event_stream(
        spark,
        stream_env["events_dir"],
        state_root,
        checkpoint_path=str(stream_env["root"] / "ckpt2"),  # fresh -> replay all
        side_channel_path=stream_env["side"],
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    after_dbs, after_tables, after_parts = read_state(spark, state_root)
    assert after_dbs.count() == n_dbs
    assert after_tables.count() == n_tables
    assert after_parts.count() == n_parts
    # replayed batches overwrote their audit partitions with all-skip rows
    ta = read_audit(spark, state_root, "table_import")
    assert ta.where(F.col("table_created") | F.col("table_updated")).count() == 0
    da = read_audit(spark, state_root, "db_import")
    assert da.where(F.col("is_created")).count() == 0


def test_partition_commit_wipes_hive_escaped_dir_names(spark, tmp_path):
    """partitionBy() writers %XX-escape special characters in directory
    names; the delete-all lane must target the ESCAPED path, or the wipe
    silently misses (and a '/' in a name would address a wrong subtree)."""
    from aws_glue_data_catalog_replication_utility_spark.model import PARTITION
    from aws_glue_data_catalog_replication_utility_spark.streaming.ingest import (
        commit_partitions,
        read_partitions,
    )

    state = str(tmp_path / "state")
    delta = spark.createDataFrame(
        [("999", "d1", "a:b/c", ["2024"], None, None, None, None)], PARTITION
    )
    scope = spark.createDataFrame(
        [("d1", "a:b/c")], "database_name string, table_name string"
    )
    commit_partitions(spark, delta, scope, state)
    assert read_partitions(spark, state).count() == 1

    # delete-all case: table in scope, zero delta rows
    commit_partitions(spark, delta.limit(0), scope, state)
    assert read_partitions(spark, state).count() == 0


def test_version_retention_maps_skip_archive(spark, tmp_path):
    """`skipArchive` mapping (GlueUtil.java:264-350: UpdateTable archives
    the prior table version unless skipArchive=true). At snapshot
    granularity: the default retains every committed v=N directory
    (skipArchive=false — history recoverable); retain_versions=1 prunes
    to the newest after each commit (skipArchive=true — no archive)."""
    import os

    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        write_small_planes,
    )

    d, t, _ = empty_catalog(spark)

    archive_root = str(tmp_path / "archive")
    for _ in range(3):
        write_small_planes(d, t, archive_root)
    vs = sorted(x for x in os.listdir(archive_root) if x.startswith("v="))
    assert vs == ["v=1", "v=2", "v=3"]  # skipArchive=false: all retained
    assert latest_version(archive_root) == 3

    prune_root = str(tmp_path / "prune")
    for _ in range(3):
        write_small_planes(d, t, prune_root, retain_versions=1)
    vs = [x for x in os.listdir(prune_root) if x.startswith("v=")]
    assert vs == ["v=3"]  # skipArchive=true: only the current state
    assert latest_version(prune_root) == 3
    dbs, tables, _parts = read_state(spark, prune_root)  # still readable
    assert dbs.count() == 0 and tables.count() == 0


def test_stream_with_retention_keeps_only_latest_version(spark, tmp_path):
    """End-to-end retention through the stream job: multiple micro-batches
    with retain_versions=1 leave exactly one v=N snapshot on disk
    (skipArchive=true semantics), and the final state still matches the
    unretained stream's content."""
    import os

    root = tmp_path
    side = str(root / "side")
    events_dir = str(root / "events")
    state_root = str(root / "state")

    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="b1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    msgs.unionByName(tbl_msgs).repartition(3).write.mode("overwrite").json(events_dir)

    q = start_event_stream(
        spark,
        events_dir,
        state_root,
        checkpoint_path=str(root / "ckpt"),
        side_channel_path=side,
        max_files_per_trigger=1,
        retain_versions=1,
    )
    q.awaitTermination(300)

    vs = [d for d in os.listdir(state_root) if d.startswith("v=")]
    v = latest_version(state_root)
    assert v >= 2  # several micro-batches committed...
    assert vs == [f"v={v}"]  # ...but only the newest survives
    dbs, tables, parts = read_state(spark, state_root)
    assert dbs.count() == 1 and tables.count() == 5
    assert parts.count() == 0 + 3 + 10 + 11 + 31


def test_unrelated_batch_leaves_partition_files_untouched(spark, tmp_path):
    """VERDICT r02 scale fix: the partitions plane is committed with
    dynamic partition overwrite, so a micro-batch touching one table must
    leave every other table's partition FILES byte-identical (same paths,
    sizes, mtimes) — not rewrite the whole plane per batch."""
    import os

    side = str(tmp_path / "side")
    events_dir = str(tmp_path / "events")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="b1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    events.coalesce(1).write.mode("overwrite").json(events_dir)

    q = start_event_stream(
        spark, events_dir, state_root, checkpoint_path=ckpt, side_channel_path=side
    )
    q.awaitTermination(300)

    def snapshot(table):
        d = f"{state_root}/partitions/database_name=raw_data_db0/table_name={table}"
        return {
            f: (st.st_size, st.st_mtime_ns)
            for f in sorted(os.listdir(d))
            if not f.startswith(("_", "."))
            for st in [os.stat(os.path.join(d, f))]
        }

    t4_before = snapshot("table_4")
    assert t4_before  # the 31-partition table landed

    # second micro-batch: ONLY table_1's inline event, redelivered
    only_t1 = events.where(
        (F.col("message_type") == "table") & F.col("payload").contains('"table_1"')
    )
    assert only_t1.count() == 1
    only_t1.coalesce(1).write.mode("append").json(events_dir)
    q = start_event_stream(
        spark, events_dir, state_root, checkpoint_path=ckpt, side_channel_path=side
    )
    q.awaitTermination(300)

    assert snapshot("table_4") == t4_before  # untouched table: identical files
    assert snapshot("table_1") != {}  # touched table was rewritten
    _, _, parts = read_state(spark, state_root)
    assert parts.count() == 0 + 3 + 10 + 11 + 31  # state still correct


def test_windowed_rollup_stream_matches_batch(spark, tmp_path):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 5), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 55), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 5), "view", 3.0),
        (dt.datetime(2024, 1, 1, 0, 20), "view", 4.0),  # late, same hour 0
        (dt.datetime(2024, 1, 1, 2, 10), "click", 5.0),
    ]
    schema = "ts timestamp, event_type string, value double"  # watermark needs TIMESTAMP (session TZ=UTC)
    batch_df = spark.createDataFrame(rows, schema)
    events_dir = str(tmp_path / "ev")
    batch_df.write.mode("overwrite").json(events_dir)

    expected = sorted(
        (str(r.window_start), r.event_type, r.n, r.sum_value)
        for r in windowed_rollup(batch_df).collect()
    )

    stream = spark.readStream.schema(schema).json(events_dir)
    q = (
        windowed_rollup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (str(r.window_start), r.event_type, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    )
    assert got == expected


def test_session_rollup_stream_matches_batch(spark, tmp_path):
    """The stateful session-window operator: same plan, batch vs stream.
    Sessions: user 1 has two (45-min gap), user 2 one (gaps < 30 min)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0), 1, 1.0),
        (dt.datetime(2024, 1, 1, 0, 10), 1, 2.0),
        (dt.datetime(2024, 1, 1, 0, 55), 1, 3.0),  # 45-min gap -> new session
        (dt.datetime(2024, 1, 1, 0, 0), 2, 4.0),
        (dt.datetime(2024, 1, 1, 0, 25), 2, 5.0),
        (dt.datetime(2024, 1, 1, 0, 45), 2, 6.0),  # chained: still session 1
    ]
    schema = "ts timestamp, user_id long, value double"
    batch_df = spark.createDataFrame(rows, schema)
    events_dir = str(tmp_path / "sess_ev")
    batch_df.write.mode("overwrite").json(events_dir)

    expected = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in session_rollup(batch_df).collect()
    )
    assert len(expected) == 3  # sanity: 2 sessions for user 1, 1 for user 2

    stream = spark.readStream.schema(schema).json(events_dir)
    q = (
        session_rollup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM session_test").collect()
    )
    assert got == expected


def test_dedupe_events_drops_redeliveries_across_batches(spark, tmp_path):
    """At-least-once redelivery simulated as the SAME event ids landing
    in different micro-batches: dedupe_events must emit each id once
    (watermark-bounded state), matching the batch dropDuplicates."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    batch1 = [(101, t0, 1.0), (102, t0, 2.0), (103, t0, 3.0)]
    batch2 = [(102, t0, 2.0), (103, t0, 3.0), (104, t0, 4.0)]  # redeliveries
    schema = "event_id long, ts timestamp, value double"
    events_dir = str(tmp_path / "dedupe_ev")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").json(
        events_dir
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").json(
        events_dir
    )

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(
        events_dir
    )
    q = (
        dedupe_events(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedupe_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.sql("SELECT * FROM dedupe_test").collect())
    assert got == [101, 102, 103, 104]  # each id exactly once


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join: same plan in batch and under two
    readStreams with watermarks (state bounded by the interval + the
    watermark horizon); append output must equal the batch join."""
    import datetime as dt

    from aws_glue_data_catalog_replication_utility_spark.streaming.enrich import (
        interval_join,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    clicks = [
        (t0 + dt.timedelta(minutes=m), u, f"c{m}")
        for u, m in [(1, 5), (1, 40), (2, 10)]
    ]
    buys = [
        (t0 + dt.timedelta(minutes=m), u, float(m))
        for u, m in [(1, 8), (1, 70), (2, 9), (3, 12)]
    ]
    cs, bs = "ts timestamp, user_id long, click_id string", (
        "ts timestamp, user_id long, amount double"
    )
    cdf, bdf = spark.createDataFrame(clicks, cs), spark.createDataFrame(buys, bs)
    cdir, bdir = str(tmp_path / "c"), str(tmp_path / "b")
    cdf.write.mode("overwrite").json(cdir)
    bdf.write.mode("overwrite").json(bdir)

    # purchase within [click_ts - 2m, click_ts + 10m]
    expected = sorted(
        (r.click_id, str(r.r_ts), r.r_amount)
        for r in interval_join(
            cdf, bdf, on="user_id", lower="2 minutes", upper="10 minutes"
        ).collect()
    )
    assert expected  # the fixture produces matches

    q = (
        interval_join(
            spark.readStream.schema(cs).json(cdir),
            spark.readStream.schema(bs).json(bdir),
            on="user_id",
            lower="2 minutes",
            upper="10 minutes",
            watermark="1 hour",
        )
        .writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.click_id, str(r.r_ts), r.r_amount)
        for r in spark.sql("SELECT * FROM ij_test").collect()
    )
    assert got == expected


def test_kafka_decode_roundtrip_and_poison_record(spark):
    """The Kafka adapter's engine-side contract (sources/streams.py):
    encode -> decode round-trips the MESSAGE envelope bit-for-bit, and a
    poison record (unparseable value) still yields a row addressed by
    topic/partition/offset whose raw value lands in `payload` — the
    import dispatch then dead-letters it (bad-type lane) instead of
    dropping it."""
    from aws_glue_data_catalog_replication_utility_spark.sources.streams import (
        decode_kafka_events,
        encode_kafka_events,
    )

    events = spark.createDataFrame(
        [
            ("e1", "database", "111", "b1", '{"name": "d1"}', None, None),
            ("e2", "table", "111", "b1", '{"table": {"name": "t"}}', "b", "r"),
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    wire = encode_kafka_events(events)
    # shape the connector's output: key/value binary + address columns
    raw = wire.select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )
    back = decode_kafka_events(raw)
    assert sorted(map(str, back.collect())) == sorted(map(str, events.collect()))

    poison = spark.createDataFrame(
        [(b"k", b"{not json", "events", 3, 42)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    rows = decode_kafka_events(poison).collect()
    assert len(rows) == 1
    assert rows[0].event_id == "events/3/42"
    assert rows[0].message_type is None  # -> import DLQ bad-type lane
    assert rows[0].payload == "{not json"


def test_kafka_source_requires_connector(spark):
    """Without the spark-sql-kafka jar the adapter must fail LOUDLY at
    stream-build time (DATA_SOURCE_NOT_FOUND), never silently no-op. If
    a deployment bundles the connector, load() succeeds and this test
    self-skips."""
    from aws_glue_data_catalog_replication_utility_spark.sources.streams import (
        KafkaEventSource,
    )

    src = KafkaEventSource("localhost:9092", "events")
    try:
        src.load(spark)
        pytest.skip("kafka connector present in this environment")
    except Exception as e:
        assert "kafka" in str(e).lower()


def test_stream_via_explicit_source_adapter(spark, tmp_path):
    """The ingest is source-agnostic: driving it through an explicit
    FileEventSource adapter instance produces the same converged state
    as the events_path shorthand (the adapter seam KafkaEventSource
    plugs into)."""
    from aws_glue_data_catalog_replication_utility_spark.model import sample_catalog
    from aws_glue_data_catalog_replication_utility_spark.sources.streams import (
        FileEventSource,
    )

    side = str(tmp_path / "side")
    events_dir = str(tmp_path / "events")
    state_root = str(tmp_path / "state")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_", run_id=1, batch_id="b1"
    )
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        run_id=1, side_channel_path=side,
    )
    msgs.unionByName(tbl_msgs).write.mode("overwrite").json(events_dir)
    q = start_event_stream(
        spark,
        state_root=state_root,
        checkpoint_path=str(tmp_path / "ckpt"),
        side_channel_path=side,
        source=FileEventSource(events_dir),
    )
    q.awaitTermination(300)
    sdbs, stables, sparts = read_state(spark, state_root)
    assert {r.name for r in sdbs.collect()} == {"raw_data_db0"}
    assert stables.count() == 5
    assert sparts.count() == 0 + 3 + 10 + 11 + 31


# ---------------------------------------------------------------------------
# partition commit backend matrix (VERDICT r04 #8): same 4-case semantics
# on the plain-parquet lane (sandbox default) and the Delta replaceWhere
# lane (transactional, gated on delta-spark being importable)
# ---------------------------------------------------------------------------

from aws_glue_data_catalog_replication_utility_spark.streaming.ingest import (  # noqa: E402
    _scope_predicate,
    commit_partitions,
    delta_backend_available,
    read_partitions,
    replace_where_equivalent,
)

@pytest.mark.parametrize("backend", ["parquet", "delta"])
def test_partition_commit_four_cases_per_backend(spark, tmp_path, backend):
    """The 4-case sync matrix (GDCUtil.java:61-111) holds on every
    backend: overwrite-in-scope, delete-all-in-scope, untouched
    out-of-scope, and idempotent replay. The delta leg skips (visibly)
    where delta-spark isn't installed — the sandbox ships plain
    pyspark; the predicate logic it relies on is covered everywhere by
    test_scope_predicate_quoting_and_guards."""
    if backend == "delta" and not delta_backend_available():
        pytest.skip("delta-spark not installed in this environment")
    from aws_glue_data_catalog_replication_utility_spark.model import PARTITION

    state = str(tmp_path / f"state_{backend}")

    def part_rows(*specs):
        return spark.createDataFrame(
            [("999", db, tbl, [v], None, None, None, None) for db, tbl, v in specs],
            PARTITION,
        )

    def scope_of(*pairs):
        return spark.createDataFrame(
            list(pairs), "database_name string, table_name string"
        )

    # batch 1: two tables land
    b1 = part_rows(("d1", "t1", "2024"), ("d1", "t1", "2025"), ("d1", "t2", "2024"))
    commit_partitions(spark, b1, scope_of(("d1", "t1"), ("d1", "t2")), state, backend)
    got = read_partitions(spark, state, backend)
    assert got.count() == 3

    # batch 2: t1 rewritten smaller (delete-then-add), t2 out of scope
    b2 = part_rows(("d1", "t1", "2026"))
    commit_partitions(spark, b2, scope_of(("d1", "t1")), state, backend)
    got = {(r.table_name, r.values[0]) for r in read_partitions(spark, state, backend).collect()}
    assert got == {("t1", "2026"), ("t2", "2024")}

    # batch 3: t2 in scope with zero rows -> delete-all
    commit_partitions(spark, b2.limit(0), scope_of(("d1", "t2")), state, backend)
    got = {(r.table_name, r.values[0]) for r in read_partitions(spark, state, backend).collect()}
    assert got == {("t1", "2026")}

    # replay batch 2 (at-least-once redelivery) -> state unchanged
    commit_partitions(spark, b2, scope_of(("d1", "t1")), state, backend)
    got = {(r.table_name, r.values[0]) for r in read_partitions(spark, state, backend).collect()}
    assert got == {("t1", "2026")}


def test_delta_replace_where_semantics(spark, tmp_path):
    """The Delta lane's 4-case semantics, EXECUTED without delta-spark
    (no network in this sandbox to fetch the jar — VERDICT r05 #1 best
    effort): `replace_where_equivalent` runs the exact predicate string
    `_commit_partitions_delta` hands the Delta writer through Spark's
    expression parser and applies replaceWhere's documented
    delete-matching-then-insert set semantics. Each batch's resulting
    state is pinned bit-for-bit against the parquet backend committing
    the same batches on disk — so when the gated real-delta leg of the
    matrix runs elsewhere, the two lanes are proven to agree on the
    same inputs. Includes names with quotes/backslashes so the
    predicate escaping executes, not just parses."""
    from aws_glue_data_catalog_replication_utility_spark.model import PARTITION

    state = str(tmp_path / "state_pq")

    def part_rows(*specs):
        return spark.createDataFrame(
            [("999", db, tbl, [v], None, None, None, None) for db, tbl, v in specs],
            PARTITION,
        )

    def scope_of(*pairs):
        return spark.createDataFrame(
            list(pairs), "database_name string, table_name string"
        )

    sim = spark.createDataFrame([], PARTITION)  # delta-lane simulated state

    def step(delta, scope):
        nonlocal sim
        commit_partitions(spark, delta, scope, state, "parquet")
        sim = replace_where_equivalent(sim, delta, scope)
        sim = spark.createDataFrame(sim.collect(), PARTITION)  # commit
        disk = {
            (r.database_name, r.table_name, tuple(r.values))
            for r in read_partitions(spark, state).collect()
        }
        mem = {
            (r.database_name, r.table_name, tuple(r.values))
            for r in sim.collect()
        }
        assert mem == disk

    b1 = part_rows(("d'1", "t\\1", "2024"), ("d'1", "t\\1", "2025"), ("d'1", "t2", "2024"))
    step(b1, scope_of(("d'1", "t\\1"), ("d'1", "t2")))          # create
    step(part_rows(("d'1", "t\\1", "2026")), scope_of(("d'1", "t\\1")))  # rewrite
    step(part_rows(), scope_of(("d'1", "t2")))                   # delete-all
    step(part_rows(("d'1", "t\\1", "2026")), scope_of(("d'1", "t\\1")))  # replay


def test_scope_predicate_quoting_and_guards(spark):
    """The Delta lane's replaceWhere predicate builder: SQL-quote
    injection-safe, null-safe equality, empty scope replaces nothing,
    overflow guard raises. Pure driver logic, testable without delta."""
    scope = spark.createDataFrame(
        [("d'b", "t1"), (None, "t2"), ("d\\", "t\\'3")],
        "database_name string, table_name string",
    )
    pred = _scope_predicate(scope, ["database_name", "table_name"])
    assert "d''b" in pred and "NULL" in pred and "<=>" in pred
    # round-trip through Spark's expression parser: the predicate must
    # select EXACTLY the scope rows (backslashes are escape chars in
    # default-mode string literals — a name ending in '\' must not
    # swallow the closing quote or match a different name; ADVICE r05)
    universe = scope.unionByName(
        spark.createDataFrame(
            [("d", "t1"), ("d\\\\", "t'3"), ("x", "y")],
            "database_name string, table_name string",
        )
    )
    got = {
        (r.database_name, r.table_name)
        for r in universe.where(F.expr(pred)).collect()
    }
    assert got == {("d'b", "t1"), (None, "t2"), ("d\\", "t\\'3")}

    empty = scope.limit(0)
    assert _scope_predicate(empty, ["database_name", "table_name"]) == "false"

    with pytest.raises(ValueError, match="sync scope exceeds"):
        _scope_predicate(scope, ["database_name", "table_name"], max_tables=1)


def test_user_event_progress_stateful_operator(spark, tmp_path):
    """The applyInPandasWithState operator: per-user running totals and
    an out-of-order counter across micro-batches. Two files replay as
    two batches (maxFilesPerTrigger=1): an event in batch 2 older than
    batch 1's max must count as out-of-order; final totals must equal
    the batch ground truth; the same data in ONE batch shows ooo=0
    (order-sensitivity is exactly the cross-batch part)."""
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        user_event_progress,
    )

    from datetime import datetime

    schema = "user_id long, ts timestamp, value double"
    t = lambda s_: datetime.fromisoformat(s_)
    b1 = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 5.0),
            (1, t("2024-01-01 10:30:00"), 7.0),
            (2, t("2024-01-01 09:00:00"), 1.0),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:10:00"), 9.0),   # OLDER than u1's 10:30 -> ooo
            (1, t("2024-01-01 11:00:00"), 2.0),
            (2, t("2024-01-01 09:45:00"), 3.0),   # in order for u2
        ],
        schema,
    )
    events_dir = str(tmp_path / "ev")
    b1.coalesce(1).write.mode("overwrite").json(f"{events_dir}/f=1")
    b2.coalesce(1).write.mode("overwrite").json(f"{events_dir}/f=2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .json(events_dir)
    )
    q = (
        user_event_progress(stream)
        .writeStream.format("memory")
        .queryName("progress_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM progress_test").collect()
    final = {}
    for r in rows:  # update mode: last row per user (max total) is final
        if r.user_id not in final or r.total_events > final[r.user_id].total_events:
            final[r.user_id] = r
    u1, u2 = final[1], final[2]
    assert (u1.total_events, u1.ooo_events, u1.max_value) == (4, 1, 9.0)
    assert str(u1.last_ts) == "2024-01-01 11:00:00"
    assert (u2.total_events, u2.ooo_events, u2.max_value) == (2, 0, 3.0)
    # per-batch rows exist too (one per key per micro-batch it appears in)
    assert sum(1 for r in rows if r.user_id == 1) == 2

    # one-batch replay: same totals, no cross-batch history -> ooo = 0
    one_dir = str(tmp_path / "one")
    b1.unionByName(b2).coalesce(1).write.mode("overwrite").json(one_dir)
    stream1 = spark.readStream.schema(schema).json(one_dir)
    q2 = (
        user_event_progress(stream1)
        .writeStream.format("memory")
        .queryName("progress_one")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got1 = {r.user_id: r for r in spark.sql("SELECT * FROM progress_one").collect()}
    assert (got1[1].total_events, got1[1].ooo_events) == (4, 0)
    assert got1[1].max_value == 9.0 and str(got1[1].last_ts) == "2024-01-01 11:00:00"


def test_user_event_progress_chunk_boundary_independent(spark, tmp_path):
    """ooo_events must not depend on Arrow chunking: with
    arrow.maxRecordsPerBatch=2 a 5-event micro-batch spans 3 chunks,
    and events in later chunks that are newer than the PRIOR batch max
    but older than an earlier chunk's max must NOT count (the r06
    defect counted them). Expected ooo: exactly the 1 event older than
    batch 1's max."""
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        user_event_progress,
    )
    from datetime import datetime

    schema = "user_id long, ts timestamp, value double"
    t = lambda s_: datetime.fromisoformat(s_)
    b1 = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 1.0),
            (1, t("2024-01-01 10:30:00"), 2.0),
            (1, t("2024-01-01 10:50:00"), 3.0),
        ],
        schema,
    )
    # batch 2: only 10:40 precedes batch 1's max (10:50). 10:58 and
    # 11:00 follow the 11:30 chunk but are NOT out-of-order.
    b2 = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:55:00"), 4.0),
            (1, t("2024-01-01 11:30:00"), 5.0),
            (1, t("2024-01-01 10:58:00"), 6.0),
            (1, t("2024-01-01 11:00:00"), 7.0),
            (1, t("2024-01-01 10:40:00"), 8.0),
        ],
        schema,
    )
    events_dir = str(tmp_path / "ev")
    b1.coalesce(1).write.mode("overwrite").json(f"{events_dir}/f=1")
    b2.coalesce(1).write.mode("overwrite").json(f"{events_dir}/f=2")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .json(events_dir)
        )
        q = (
            user_event_progress(stream)
            .writeStream.format("memory")
            .queryName("progress_chunks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    rows = spark.sql("SELECT * FROM progress_chunks").collect()
    final = max((r for r in rows if r.user_id == 1), key=lambda r: r.total_events)
    assert (final.total_events, final.ooo_events, final.max_value) == (8, 1, 8.0)
    assert str(final.last_ts) == "2024-01-01 11:30:00"


def test_user_event_progress_state_ttl_eviction(spark, tmp_path):
    """EventTimeTimeout eviction: a key idle past last_event+ttl is
    dropped from the state store (numRowsTotal falls), and a
    re-arriving key restarts from empty state (total resets, no ooo
    even though its new event is 'old' vs pre-eviction history).
    Semantics inside the horizon are unchanged (user 1's running
    totals match the no-TTL operator)."""
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        user_event_progress,
    )
    from datetime import datetime

    schema = "user_id long, ts timestamp, value double"
    t = lambda s_: datetime.fromisoformat(s_)
    batches = [
        # b1: both users live
        [(1, t("2024-01-01 10:00:00"), 1.0), (2, t("2024-01-01 10:00:00"), 9.0)],
        # b2: only u1 -> watermark after b2 = 11:00; u2 timeout = 10:30
        [(1, t("2024-01-01 11:00:00"), 2.0)],
        # b3: wm 11:00 > 10:30 -> u2 evicted during this batch
        [(1, t("2024-01-01 11:30:00"), 3.0)],
        # b4: u2 returns with an event OLDER than its evicted history's
        # future — fresh state: total=1, ooo=0
        [(2, t("2024-01-01 11:40:00"), 4.0)],
    ]
    events_dir = str(tmp_path / "ev")
    for i, rows_ in enumerate(batches):
        spark.createDataFrame(rows_, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(f"{events_dir}/f={i}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .json(events_dir)
    )
    q = (
        user_event_progress(stream, state_ttl_ms=30 * 60 * 1000)
        .writeStream.format("memory")
        .queryName("progress_ttl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state_counts = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    rows = spark.sql("SELECT * FROM progress_ttl").collect()
    u1 = max((r for r in rows if r.user_id == 1), key=lambda r: r.total_events)
    assert (u1.total_events, u1.ooo_events, u1.max_value) == (3, 0, 3.0)
    u2_rows = sorted(
        (r for r in rows if r.user_id == 2), key=lambda r: str(r.last_ts)
    )
    # two appearances: pre-eviction (total 1) and post-restart (total 1,
    # NOT 2 — history was evicted)
    assert [r.total_events for r in u2_rows] == [1, 1]
    assert [r.ooo_events for r in u2_rows] == [0, 0]
    assert str(u2_rows[-1].last_ts) == "2024-01-01 11:40:00"
    # the state store shrank when u2 was evicted, then regrew on return
    assert max(state_counts) == 2 and min(state_counts[1:]) == 1


def test_streaming_embed_feeds_ann_index(spark, tmp_path):
    """The streaming text->vector->index loop (VERDICT r06 #6): build an
    index offline from a seed corpus, stream two micro-batches of new
    docs through start_embed_stream, and (a) the meta version bumps
    once per batch, (b) a search finds the near-duplicate that arrived
    in batch 2 from a batch-1 query, (c) the index still verifies."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        load_ann_meta,
        search_ann_index,
        verify_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        start_embed_stream,
    )

    # seed corpus: ids 0..7 present (index seeding), distinct token sets
    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    emb0 = hashed_tf_embedding(seed_docs).select("doc_id", "embedding")
    build_ann_index(
        spark, emb0, root, n_clusters=4, m=4, k=8, id_col="doc_id"
    )
    assert load_ann_meta(root)["version"] == 1

    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    b1 = [(100, dup_text), (101, "completely different subject matter one")]
    b2 = [
        (200, dup_text + " again"),  # near-dup of doc 100, arrives later
        (201, "another unrelated batch two document"),
    ]
    docs_dir = str(tmp_path / "docs")
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(f"{docs_dir}/f={i}")

    q = start_embed_stream(
        spark,
        docs_path=docs_dir,
        index_root=root,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    assert load_ann_meta(root)["version"] == 3  # one bump per micro-batch
    verify_ann_index(spark, root)

    queries = hashed_tf_embedding(
        spark.createDataFrame([(100, dup_text)], "doc_id long, text string")
    ).select(F.col("doc_id").alias("query_id"), "embedding")
    hits = search_ann_index(spark, root, queries, k=3, nprobe=4).collect()
    assert hits, "search over the streamed index returned nothing"
    # the batch-2 near-dup must be the top non-self neighbor
    assert hits[0].vec_id == 200 or {r.vec_id for r in hits} >= {200}

    # replay safety: a FRESH checkpoint re-delivers every file (the
    # at-least-once worst case); delete-before-append makes the
    # re-append an in-place replace, so totals/dup_ids/results converge
    n_before = (
        spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .count()
    )
    q2 = start_embed_stream(
        spark,
        docs_path=docs_dir,
        index_root=root,
        checkpoint_path=str(tmp_path / "ckpt_replay"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    verify_ann_index(spark, root)  # raises on dup_ids
    n_after = (
        spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .count()
    )
    assert n_after == n_before
    hits2 = search_ann_index(spark, root, queries, k=3, nprobe=4).collect()
    assert sorted(map(tuple, hits2)) == sorted(map(tuple, hits))

    # guard: streaming against a missing index fails fast
    import pytest

    with pytest.raises(ValueError, match="no ANN index"):
        start_embed_stream(
            spark, docs_path=docs_dir, index_root=str(tmp_path / "nope"),
            checkpoint_path=str(tmp_path / "ckpt2"),
        )


def test_streaming_near_dedup_incremental(spark, tmp_path):
    """Incremental MinHash/LSH near-dedup: a batch-2 doc that
    near-duplicates a batch-1 keeper is flagged against the signature
    store; within-batch dups keep the smallest id; only keepers'
    signatures enter the store; a fresh-checkpoint full replay
    overwrites per-batch outputs and converges (idempotent); and the
    stream's dup pairs agree with the batch lane's band pairs on the
    same corpus."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        minhash_band_pairs,
        minhash_signature_arrays,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    text_x = "the quick brown fox jumps over the lazy dog near the river bank"
    text_y = "completely different subject matter about catalog replication pipelines here"
    text_z = "a third unrelated document discussing streaming state stores and watermarks"
    b1 = [(1, text_x), (2, text_y)]
    b2 = [(10, text_x), (11, text_z), (12, text_z), (13, "too short")]
    docs_dir = str(tmp_path / "docs")
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(f"{docs_dir}/f={i}")

    state = str(tmp_path / "state")
    q = start_near_dedup_stream(
        spark,
        docs_path=docs_dir,
        state_root=state,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert len(dec) == 6
    assert dec[1].keep and dec[2].keep and dec[11].keep
    assert dec[13].keep  # too short to shingle -> trivially kept
    assert not dec[10].keep and dec[10].dup_of == 1 and dec[10].est == 1.0
    assert not dec[12].keep and dec[12].dup_of == 11 and dec[12].est == 1.0

    store_ids = {
        r.doc_id
        for r in spark.read.option("basePath", f"{state}/signatures")
        .parquet(f"{state}/signatures")
        .select("doc_id")
        .dropDuplicates()
        .collect()
    }
    assert store_ids == {1, 2, 11}  # keepers only (13 has no shingles)

    # stream verdicts agree with the batch lane on this corpus
    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    sigs = minhash_signature_arrays(all_docs)
    batch_pairs = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in minhash_band_pairs(sigs).collect()
    }
    stream_pairs = {
        (r.doc_id, r.dup_of) for r in dec.values() if not r.keep
    }
    assert stream_pairs <= batch_pairs and stream_pairs == {(10, 1), (12, 11)}

    # replay: fresh checkpoint re-delivers everything; per-batch
    # overwrite keeps decisions and the store byte-stable in content
    q2 = start_near_dedup_stream(
        spark,
        docs_path=docs_dir,
        state_root=state,
        checkpoint_path=str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    dec2 = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert len(dec2) == 6
    assert {k: (v.keep, v.dup_of) for k, v in dec2.items()} == {
        k: (v.keep, v.dup_of) for k, v in dec.items()
    }
    store_ids2 = {
        r.doc_id
        for r in spark.read.option("basePath", f"{state}/signatures")
        .parquet(f"{state}/signatures")
        .select("doc_id")
        .dropDuplicates()
        .collect()
    }
    assert store_ids2 == store_ids


def test_near_dedup_state_compaction(spark, tmp_path):
    """compact_dedup_state merges the cold signature tail into one
    partition and coalesces decision files WITHOUT changing a verdict,
    a store row, or per-doc batch history; the stream keeps serving
    (a post-compaction batch still near-dups against a compacted
    keeper); a crash between tmp-write and swap resumes idempotently;
    and the stream refuses to start over a pending compaction."""
    import json
    import os
    import shutil

    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        _COMPACT_TMP,
        compact_dedup_state,
        read_dedup_decisions,
        start_near_dedup_stream,
    )

    t1 = "the quick brown fox jumps over the lazy dog near the river bank"
    t2 = "completely different subject matter about catalog replication pipelines here"
    t3 = "a third unrelated document discussing streaming state stores and watermarks"
    batches = [[(1, t1)], [(2, t2)], [(3, t3), (4, t3)]]
    docs_dir = str(tmp_path / "docs")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(f"{docs_dir}/f={i}")

    state = str(tmp_path / "state")

    def run_stream(ckpt):
        q = start_near_dedup_stream(
            spark,
            docs_path=docs_dir,
            state_root=state,
            checkpoint_path=str(tmp_path / ckpt),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run_stream("ckpt")

    def store_rows():
        return sorted(
            (r.doc_id, r.band, r.band_key, tuple(r.sig), r.batch_id)
            for r in spark.read.option("basePath", f"{state}/signatures")
            .parquet(f"{state}/signatures")
            .collect()
        )

    def decisions():
        return sorted(
            map(tuple, read_dedup_decisions(spark, state).collect())
        )

    dec_before = decisions()
    rows_before = store_rows()
    assert {b for *_, b in rows_before} == {0, 1, 2}

    report = compact_dedup_state(spark, state)
    assert report["compacted"] and not report["resumed_pending"]
    # batches 0 and 1 merged into batch_id=1; batch 2 (keep_last) kept
    assert report["signature_dirs_before"] == 3
    assert report["signature_dirs_after"] == 2
    assert report["signature_files_after"] < report["signature_files_before"]
    assert report["decision_files_after"] <= report["decision_files_before"]
    # store content identical except the merged rows' partition key
    remap = lambda b: 1 if b <= 1 else b  # noqa: E731
    assert store_rows() == sorted(
        (d, bd, k, s, remap(b)) for d, bd, k, s, b in rows_before
    )
    # decision history EXACT — per-doc batch ids survive the rewrite
    assert decisions() == dec_before

    # idempotent: nothing left to merge below the keep_last horizon
    report2 = compact_dedup_state(spark, state)
    assert not report2["compacted"]
    assert decisions() == dec_before

    # the stream still serves: a new batch near-dupping a COMPACTED
    # keeper (doc 1, originally batch 0) is flagged against the store
    spark.createDataFrame([(10, t1)], "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").json(f"{docs_dir}/f=3")
    run_stream("ckpt")
    dec = {r.doc_id: r for r in read_dedup_decisions(spark, state).collect()}
    assert not dec[10].keep and dec[10].dup_of == 1 and dec[10].est == 1.0

    # crash-resume: fabricate the post-tmp pre-swap state by restoring
    # the sources next to a fully written tmp tree + manifest
    rows_now = store_rows()
    dec_now = decisions()
    ids = sorted(
        int(n.split("=")[1])
        for n in os.listdir(f"{state}/signatures")
        if n.startswith("batch_id=")
    )
    comp, target = ids[:-1], ids[-2]
    tmp = f"{state}/{_COMPACT_TMP}"
    merged = spark.read.parquet(
        *[f"{state}/signatures/batch_id={b}" for b in comp]
    )
    merged.coalesce(1).write.parquet(f"{tmp}/signatures/batch_id={target}")
    with open(f"{tmp}/MANIFEST.json", "w") as fh:
        json.dump({"signatures": {"sources": comp, "target": target}}, fh)

    # a pending compaction blocks the stream
    import pytest

    with pytest.raises(RuntimeError, match="pending compaction"):
        start_near_dedup_stream(
            spark,
            docs_path=docs_dir,
            state_root=state,
            checkpoint_path=str(tmp_path / "ckpt_blocked"),
        )

    report3 = compact_dedup_state(spark, state)
    assert report3["resumed_pending"]
    assert not os.path.exists(tmp)
    remap2 = lambda b: target if b <= target else b  # noqa: E731
    assert store_rows() == sorted(
        (d, bd, k, s, remap2(b)) for d, bd, k, s, b in rows_now
    )
    assert decisions() == dec_now
    shutil.rmtree(str(tmp_path / "ckpt_blocked"), ignore_errors=True)


def test_streaming_semantic_dedup_through_index(spark, tmp_path):
    """The incremental semantic-dedup loop: a batch-1 doc matching a
    SEED keeper is flagged against the index; a batch-2 doc matching a
    batch-1 KEEPER proves keepers accrete; within-batch duplicates keep
    the smallest id; dropped dups never enter the index; a
    fresh-checkpoint full replay converges (delete-before-anything
    self-heal); and a missing index fails fast."""
    import pytest
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        verify_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        read_semantic_decisions,
        start_semantic_dedup_stream,
    )

    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    build_ann_index(
        spark,
        hashed_tf_embedding(seed_docs).select("doc_id", "embedding"),
        root, n_clusters=4, m=4, k=8, id_col="doc_id",
    )

    seed3 = "seed document number 3 about topic_3 " * 3
    uniq1 = "completely different subject matter about replication pipelines"
    uniq2 = "another unrelated batch two document discussing watermarks"
    b1 = [(100, seed3), (101, uniq1)]
    # 203: EMPTY text -> zero embedding -> cosine 0 vs everything;
    # must survive (and not crash the unit-normalize under ANSI mode)
    b2 = [(200, uniq1), (201, uniq2), (202, uniq2), (203, "")]
    docs_dir = str(tmp_path / "docs")
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(f"{docs_dir}/f={i}")

    state = str(tmp_path / "state")

    def run(ckpt):
        q = start_semantic_dedup_stream(
            spark,
            docs_path=docs_dir,
            index_root=root,
            state_root=state,
            checkpoint_path=str(tmp_path / ckpt),
            threshold=0.99,
            k=3,
            nprobe=4,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run("ckpt")

    dec = {r.doc_id: r for r in read_semantic_decisions(spark, state).collect()}
    assert len(dec) == 6
    # batch 1: 100 duplicates the SEED keeper 3 (exact text -> cosine 1)
    assert not dec[100].keep and dec[100].dup_of == 3
    assert dec[100].cosine == pytest.approx(1.0)
    assert dec[101].keep
    # batch 2: 200 duplicates the batch-1 KEEPER 101 (accretion);
    # 202 duplicates 201 WITHIN the batch (min-id keeps); the
    # zero-vector doc is kept (cosine 0 against everything)
    assert not dec[200].keep and dec[200].dup_of == 101
    assert dec[201].keep
    assert not dec[202].keep and dec[202].dup_of == 201
    assert dec[203].keep and dec[203].dup_of is None

    verify_ann_index(spark, root)
    indexed = {
        r[0]
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .select("doc_id")
        .collect()
    }
    assert indexed == set(range(8)) | {101, 201, 203}  # keepers only

    # full replay from a fresh checkpoint converges bit-for-bit
    before = sorted(map(tuple, read_semantic_decisions(spark, state).collect()))
    run("ckpt2")
    verify_ann_index(spark, root)  # no dup_ids from the re-append
    assert sorted(
        map(tuple, read_semantic_decisions(spark, state).collect())
    ) == before
    indexed2 = {
        r[0]
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .select("doc_id")
        .collect()
    }
    assert indexed2 == indexed

    with pytest.raises(ValueError, match="no ANN index"):
        start_semantic_dedup_stream(
            spark,
            docs_path=docs_dir,
            index_root=str(tmp_path / "nope"),
            state_root=state,
            checkpoint_path=str(tmp_path / "ckpt3"),
        )


def test_streaming_media_feature_extraction(spark, tmp_path):
    """The streaming multimodal loop: two micro-batches of image blobs
    run the batch decode lane unchanged inside foreachBatch — decoded
    rows match the batch operator bit-for-bit, a garbage blob survives
    as an error row (the stream does not die), and a fresh-checkpoint
    full replay overwrites per-batch outputs and converges."""
    import pytest

    from tests.test_multimodal import _encode_bmp, _encode_ppm
    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        decode_image,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming import (
        read_media_features,
        start_media_stream,
    )

    red2x1 = _encode_bmp(2, 1, [[(255, 0, 0), (255, 0, 0)]])
    green1x1 = _encode_ppm(1, 1, [[(0, 255, 0)]])
    b1 = [(1, bytearray(red2x1)), (2, bytearray(b"not an image at all"))]
    b2 = [(3, bytearray(green1x1)), (4, None)]
    blobs_dir = str(tmp_path / "blobs")
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, "doc_id long, blob binary").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{blobs_dir}/f={i}")

    out = str(tmp_path / "media")

    def run(ckpt):
        q = start_media_stream(
            spark,
            blobs_path=blobs_dir,
            out_root=out,
            checkpoint_path=str(tmp_path / ckpt),
            kind="image",
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run("ckpt")
    got = {r.doc_id: r for r in read_media_features(spark, out).collect()}
    assert len(got) == 4
    assert {got[1].batch_id, got[3].batch_id} == {0, 1}

    # bit-for-bit the batch operator's output on the union
    all_blobs = spark.createDataFrame(b1 + b2, "doc_id long, blob binary")
    want = {r.doc_id: r for r in decode_image(all_blobs).collect()}
    for did, w in want.items():
        g = got[did]
        assert (
            g.format, g.width, g.height, g.channels, g.channel_means, g.error
        ) == (
            w.format, w.width, w.height, w.channels, w.channel_means, w.error
        ), did
    assert got[1].error is None and got[1].channel_means == [255.0, 0.0, 0.0]
    assert got[3].error is None and got[3].channel_means == [0.0, 255.0, 0.0]
    assert got[2].error is not None and got[4].error == "null blob"

    # replay converges
    before = sorted(map(tuple, read_media_features(spark, out).collect()))
    run("ckpt2")
    assert sorted(map(tuple, read_media_features(spark, out).collect())) == before

    with pytest.raises(ValueError, match="kind"):
        start_media_stream(
            spark, blobs_path=blobs_dir, out_root=out,
            checkpoint_path=str(tmp_path / "ckpt3"), kind="video",
        )


def test_quality_gate_stream_splits_and_reports(spark, tmp_path):
    """The streaming quality gate: two micro-batches, each split into
    clean/quarantine with per-row failed_checks lists and a per-batch
    report whose counts equal the BATCH gate's on the same rows; replay
    from a fresh checkpoint converges to identical outputs."""
    from aws_glue_data_catalog_replication_utility_spark.functions import (
        expectations as E,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.quality import (
        read_gate_outputs,
        start_quality_gate_stream,
    )

    in_dir = str(tmp_path / "in")
    rows1 = [(1, "a", 10.0), (2, None, 5.0), (3, "c", -1.0)]
    rows2 = [(4, "d", 2.0), (5, None, -9.0)]
    schema = "id bigint, name string, v double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    checks = [E.not_null("name"), E.in_range("v", 0, None, name="v_pos")]
    out_root = str(tmp_path / "gate")

    def run(ckpt: str, out: str):
        q = start_quality_gate_stream(
            spark,
            in_path=in_dir,
            schema=schema,
            checks=checks,
            out_root=out,
            checkpoint_path=ckpt,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"), out_root)
    clean, quarantine, report = read_gate_outputs(spark, out_root)

    assert sorted(r.id for r in clean.collect()) == [1, 4]
    quar = {r.id: sorted(r.failed_checks) for r in quarantine.collect()}
    assert quar == {
        2: ["not_null(name)"],
        3: ["v_pos"],
        5: ["not_null(name)", "v_pos"],
    }
    # report counts == the batch gate run over all rows, summed
    rep = {}
    for r in report.collect():
        rep[r.check] = rep.get(r.check, 0) + r.violations
    all_rows = spark.createDataFrame(rows1 + rows2, schema)
    batch_rep = {
        r.check: r.violations
        for r in E.check_expectations(all_rows, checks).collect()
    }
    assert rep == batch_rep
    assert report.count() == 2 * len(checks)  # two batches x two checks

    # fresh-checkpoint replay converges to the same outputs
    out2 = str(tmp_path / "gate2")
    run(str(tmp_path / "ckpt2"), out2)
    c2, q2, _ = read_gate_outputs(spark, out2)
    assert sorted(r.id for r in c2.collect()) == [1, 4]
    assert {r.id: sorted(r.failed_checks) for r in q2.collect()} == quar

    # non-row-local checks are refused up front
    import pytest

    with pytest.raises(ValueError, match="row-local checks only"):
        start_quality_gate_stream(
            spark, in_path=in_dir, schema=schema,
            checks=[E.unique("id")], out_root=out_root,
            checkpoint_path=str(tmp_path / "ckpt3"),
        )


def test_score_stream_routes_keep_reject(spark, tmp_path):
    """The learned filter on arrival: two micro-batches scored with a
    trained model; keep/reject routing equals the batch scoring lane
    bit-for-bat, replay converges (per-batch overwrite)."""
    import random

    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.score import (
        start_score_stream,
    )

    rng = random.Random(11)
    good = "the quick brown fox jumps over the lazy dog".split()
    bad = "zxqv qqwz vvxk jjqp zzrw xkcd qpzm wvxx".split()
    labeled = spark.createDataFrame(
        [(i, " ".join(rng.choices(good, k=20)), 1) for i in range(50)]
        + [(500 + i, " ".join(rng.choices(bad, k=20)), 0) for i in range(50)],
        "doc_id bigint, text string, label int",
    )
    model = train_quality_classifier(labeled, dim=64, max_iter=20)

    src = tmp_path / "in"
    src.mkdir()
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    b1 = [(1000 + i, " ".join(rng.choices(good, k=15))) for i in range(8)]
    b2 = [(2000 + i, " ".join(rng.choices(bad, k=15))) for i in range(8)]
    spark.createDataFrame(b1, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(src / "f2"))
    # file-stream over the two subdirs' files
    allsrc = str(src)
    stream_docs = spark.createDataFrame(
        b1 + b2, "doc_id bigint, text string"
    )
    q = start_score_stream(
        spark,
        model,
        in_path=allsrc + "/*/",
        out_root=out_root,
        checkpoint_path=ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    kept = spark.read.option("basePath", f"{out_root}/keep").parquet(
        f"{out_root}/keep"
    )
    rej = spark.read.option("basePath", f"{out_root}/reject").parquet(
        f"{out_root}/reject"
    )
    want = {
        r.doc_id: r.quality_keep
        for r in score_quality(
            stream_docs, model, keep_threshold=0.5
        ).collect()
    }
    got_keep = {r.doc_id for r in kept.collect()}
    got_rej = {r.doc_id for r in rej.collect()}
    assert got_keep == {d for d, k in want.items() if k}
    assert got_rej == {d for d, k in want.items() if not k}
    # multiple micro-batches actually happened
    assert kept.select("batch_id").distinct().count() >= 1
    assert len(got_keep) + len(got_rej) == 16
    # the planted separation shows up on arrival
    assert all(d < 2000 for d in got_keep)


def test_all_doc_loops_run_through_file_stream_source(spark, tmp_path):
    """Bus-agnosticism of the six doc/blob streaming loops: each one
    accepts a source ADAPTER (anything with load(spark)) instead of a
    hardcoded file path, so a Kafka deployment swaps ONE constructor
    per loop. Drives every loop through FileStreamSource end-to-end;
    the Kafka leg stays import-guarded (no connector jar here)."""
    import random

    from aws_glue_data_catalog_replication_utility_spark.functions import (
        expectations as E,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.classifier import (
        train_quality_classifier,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )
    from aws_glue_data_catalog_replication_utility_spark.sources.streams import (
        FileStreamSource,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.embed import (
        start_embed_stream,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.media import (
        read_media_features,
        start_media_stream,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.neardedup import (
        read_dedup_decisions,
        start_near_dedup_stream,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.quality import (
        read_gate_outputs,
        start_quality_gate_stream,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.score import (
        start_score_stream,
    )
    from aws_glue_data_catalog_replication_utility_spark.streaming.semdedup import (
        read_semantic_decisions,
        start_semantic_dedup_stream,
    )

    doc_schema = "doc_id long, text string"
    seeds = spark.createDataFrame(
        [(i, f"seed document number {i} about topic_{i} " * 3) for i in range(8)],
        doc_schema,
    )

    # --- embed loop ----------------------------------------------------
    idx1 = str(tmp_path / "idx1")
    build_ann_index(
        spark, hashed_tf_embedding(seeds).select("doc_id", "embedding"),
        idx1, n_clusters=2, m=4, k=8, id_col="doc_id",
    )
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(100, "a brand new streamed document about rivers and banks")],
        doc_schema,
    ).coalesce(1).write.json(docs_dir)
    q = start_embed_stream(
        spark,
        source=FileStreamSource(docs_dir, doc_schema),
        index_root=idx1,
        checkpoint_path=str(tmp_path / "ck_embed"),
    )
    q.awaitTermination(120)
    indexed = {
        r.doc_id
        for r in spark.read.option("basePath", f"{idx1}/vectors")
        .parquet(f"{idx1}/vectors").select("doc_id").collect()
    }
    assert 100 in indexed

    # --- near-dedup loop -------------------------------------------------
    nd_state = str(tmp_path / "nd_state")
    q = start_near_dedup_stream(
        spark,
        source=FileStreamSource(docs_dir, doc_schema),
        state_root=nd_state,
        checkpoint_path=str(tmp_path / "ck_nd"),
    )
    q.awaitTermination(120)
    assert read_dedup_decisions(spark, nd_state).count() == 1

    # --- semantic-dedup loop ----------------------------------------------
    sd_state = str(tmp_path / "sd_state")
    q = start_semantic_dedup_stream(
        spark,
        source=FileStreamSource(docs_dir, doc_schema),
        index_root=idx1,
        state_root=sd_state,
        checkpoint_path=str(tmp_path / "ck_sd"),
        threshold=0.99,
        nprobe=2,
    )
    q.awaitTermination(120)
    dec = {r.doc_id: r for r in read_semantic_decisions(spark, sd_state).collect()}
    # doc 100 is already indexed by the embed loop above; the sem-dedup
    # replay self-heal deletes-then-reappends it, and nothing else
    # clears the 0.99 threshold -> kept
    assert dec[100].keep

    # --- media loop (stats kind: pure blob features) ---------------------
    blobs_dir = str(tmp_path / "blobs")
    spark.createDataFrame(
        [(1, b"\x00\x01\x02\x03"), (2, b"\xff" * 16)],
        "doc_id long, blob binary",
    ).coalesce(1).write.parquet(blobs_dir)
    media_out = str(tmp_path / "media_out")
    q = start_media_stream(
        spark,
        source=FileStreamSource(
            blobs_dir, "doc_id long, blob binary", format="parquet"
        ),
        out_root=media_out,
        checkpoint_path=str(tmp_path / "ck_media"),
        kind="stats",
    )
    q.awaitTermination(120)
    assert read_media_features(spark, media_out).count() == 2

    # --- quality gate loop -------------------------------------------------
    rows_dir = str(tmp_path / "rows")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 5.0)], "id bigint, name string, v double"
    ).coalesce(1).write.parquet(rows_dir)
    gate_out = str(tmp_path / "gate_out")
    q = start_quality_gate_stream(
        spark,
        source=FileStreamSource(
            rows_dir, "id bigint, name string, v double", format="parquet"
        ),
        checks=[E.not_null("name")],
        out_root=gate_out,
        checkpoint_path=str(tmp_path / "ck_gate"),
    )
    q.awaitTermination(120)
    clean, quarantine, _ = read_gate_outputs(spark, gate_out)
    assert {r.id for r in clean.collect()} == {1}
    assert {r.id for r in quarantine.collect()} == {2}

    # --- score loop ---------------------------------------------------------
    rng = random.Random(7)
    good = "the quick brown fox jumps over the lazy dog".split()
    bad = "zxqv qqwz vvxk jjqp zzrw xkcd qpzm wvxx".split()
    labeled = spark.createDataFrame(
        [(i, " ".join(rng.choices(good, k=20)), 1) for i in range(40)]
        + [(500 + i, " ".join(rng.choices(bad, k=20)), 0) for i in range(40)],
        "doc_id bigint, text string, label int",
    )
    model = train_quality_classifier(labeled, dim=64, max_iter=20)
    score_in = str(tmp_path / "score_in")
    spark.createDataFrame(
        [(1000, " ".join(good)), (2000, " ".join(bad))],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(score_in)
    score_out = str(tmp_path / "score_out")
    q = start_score_stream(
        spark,
        model,
        source=FileStreamSource(score_in, doc_schema, format="parquet"),
        out_root=score_out,
        checkpoint_path=str(tmp_path / "ck_score"),
    )
    q.awaitTermination(120)
    kept = {
        r.doc_id
        for r in spark.read.option("basePath", f"{score_out}/keep")
        .parquet(f"{score_out}/keep").collect()
    }
    assert kept == {1000}
