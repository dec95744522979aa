"""Golden end-to-end: plan -> export -> import round-trip on a
fixture-shaped two-catalog setup (SURVEY.md §5.2), asserting the target
snapshot equals the source modulo the fields createTableInput drops
(GlueUtil.java:175-192), plus idempotence (apply ∘ apply = apply)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.model import (
    empty_catalog,
    sample_catalog,
)
from aws_glue_data_catalog_replication_utility_spark.plans.export import export_catalog
from aws_glue_data_catalog_replication_utility_spark.plans.importer import import_events
from aws_glue_data_catalog_replication_utility_spark.plans.planner import (
    plan_replication,
    tokenize_prefixes,
)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    side = str(tmp_path_factory.mktemp("side_channel"))
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, plan_audit = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", run_id=7, batch_id="b1"
    )
    tbl_msgs, export_audit = export_catalog(
        spark,
        msgs,
        src_tables,
        src_parts,
        threshold=10,
        batch_id="b1",
        run_id=7,
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    tgt_dbs, tgt_tables, tgt_parts = empty_catalog(spark)
    result = import_events(
        spark,
        events,
        tgt_dbs,
        tgt_tables,
        tgt_parts,
        target_catalog_id="999999999999",
        side_channel_path=side,
        run_id=8,
    )
    return {
        "src": (src_dbs, src_tables, src_parts),
        "events": events,
        "side": side,
        "result": result,
        "plan_audit": plan_audit,
        "export_audit": export_audit,
    }


def test_tokenizer():
    assert tokenize_prefixes("a, b,,c", ",") == ["a", "b", "c"]
    assert tokenize_prefixes("") == []


def test_planner_prefix_scoping(pipeline):
    # 4 dbs with prefixes raw_data_/processed_data_/tmp_/other_ -> 2 pass
    events = pipeline["events"]
    db_events = events.where(F.col("message_type") == "database")
    names = {
        r[0]
        for r in db_events.select(
            F.get_json_object("payload", "$.name")
        ).collect()
    }
    assert names == {"raw_data_db0", "processed_data_db1"}


def test_threshold_routing_split(pipeline):
    events = pipeline["events"]
    by_type = {
        r.message_type: r.n
        for r in events.groupBy("message_type").agg(F.count("*").alias("n")).collect()
    }
    # per db: parts_per_table=(0,3,10,11,31) -> 3 inline + 2 large
    assert by_type["table"] == 2 * 3
    assert by_type["largeTable"] == 2 * 2


def test_databases_replicated(pipeline):
    res = pipeline["result"]
    names = {r.name for r in res.databases.collect()}
    assert names == {"raw_data_db0", "processed_data_db1"}


def test_tables_replicated_minus_dropped_fields(pipeline):
    src_dbs, src_tables, src_parts = pipeline["src"]
    res = pipeline["result"]
    replicated_fields = [
        "database_name",
        "name",
        "owner",
        "description",
        "retention",
        "table_type",
        "parameters",
        "partition_keys",
        "storage_descriptor",
    ]
    src = (
        src_tables.where(
            F.col("database_name").isin("raw_data_db0", "processed_data_db1")
        )
        .select(*replicated_fields)
        .collect()
    )
    tgt = res.tables.select(*replicated_fields).collect()
    assert sorted(map(str, src)) == sorted(map(str, tgt))
    # created_by is NOT replicated (GlueUtil.java:175-192 projection)
    assert "created_by" not in res.tables.columns


def test_partitions_full_set(pipeline):
    src_dbs, src_tables, src_parts = pipeline["src"]
    res = pipeline["result"]
    src_n = src_parts.where(
        F.col("database_name").isin("raw_data_db0", "processed_data_db1")
    ).count()
    assert res.partitions.count() == src_n == 2 * (0 + 3 + 10 + 11 + 31)
    # values survive positionally
    src_keys = {
        (r.database_name, r.table_name, tuple(r["values"]))
        for r in src_parts.where(F.col("database_name") == "raw_data_db0").collect()
    }
    tgt_keys = {
        (r.database_name, r.table_name, tuple(r["values"]))
        for r in res.partitions.where(
            F.col("database_name") == "raw_data_db0"
        ).collect()
    }
    assert src_keys == tgt_keys


def test_import_idempotent(pipeline, spark):
    res = pipeline["result"]
    again = import_events(
        spark,
        pipeline["events"],
        res.databases,
        res.tables,
        res.partitions,
        target_catalog_id="999999999999",
        side_channel_path=pipeline["side"],
        run_id=9,
    )
    assert again.databases.count() == res.databases.count()
    assert again.tables.count() == res.tables.count()
    assert again.partitions.count() == res.partitions.count()
    # second run is all skips: nothing created/updated
    assert again.table_import_audit.where(
        F.col("table_created") | F.col("table_updated")
    ).count() == 0
    assert again.db_import_audit.where(F.col("is_created")).count() == 0


def test_audit_flags_first_run(pipeline):
    res = pipeline["result"]
    ta = res.table_import_audit
    assert ta.where(F.col("table_created")).count() == 10  # 2 dbs x 5 tables
    assert ta.where(F.col("table_updated")).count() == 0
    da = res.db_import_audit
    assert da.where(F.col("is_created")).count() == 2


def test_export_audit_marks_large_tables(pipeline):
    ea = pipeline["export_audit"]
    large = {r.table_id for r in ea.where(F.col("is_large_table")).collect()}
    # parts_per_table=(0,3,10,11,31): table_3 (11) and table_4 (31) route large
    assert large == {
        "table_3|raw_data_db0",
        "table_4|raw_data_db0",
        "table_3|processed_data_db1",
        "table_4|processed_data_db1",
    }
    assert ea.where(F.col("is_large_table")).where(
        F.col("object_key").isNull()
    ).count() == 0


def test_synthetic_catalog_matches_sample_shape(spark):
    # the Spark-native generator (used by the q34 benchmark) must keep
    # the fixture shape: prefix cycle, 5 tables/db, (0,3,10,11,31) parts
    from aws_glue_data_catalog_replication_utility_spark.model import (
        synthetic_catalog,
    )

    sd, st, sp = sample_catalog(spark, n_dbs=4)
    gd, gt, gp = synthetic_catalog(spark, n_dbs=4)
    assert gd.count() == sd.count() == 4
    assert gt.count() == st.count() == 20
    assert gp.count() == sp.count() == 4 * (0 + 3 + 10 + 11 + 31)
    assert {r.name for r in gd.collect()} == {r.name for r in sd.collect()}
    # same partition addressing (db, table, values)
    key = lambda df: {
        (r.database_name, r.table_name, tuple(r["values"])) for r in df.collect()
    }
    assert key(gp) == key(sp)
    # schemas align with the declared catalog model (importable as-is)
    assert gt.schema.fieldNames() == st.schema.fieldNames()


def test_export_object_key_shape(pipeline):
    # <run_date>_<run_id>_<catalog>_<db>_<table> — ExportLargeTable.java:97-101,
    # with run_date/run_id as injected job parameters (never wall-clock)
    import re

    keys = [
        r.object_key
        for r in pipeline["export_audit"].where(F.col("is_large_table")).collect()
    ]
    assert len(keys) == 4
    pat = re.compile(r"^2024-01-01_7_123412341234_(raw_data_db0|processed_data_db1)_table_[34]$")
    assert all(pat.match(k) for k in keys), keys


def test_malformed_messages_route_to_dlq(pipeline, spark):
    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog

    bad = spark.createDataFrame(
        [
            ("e1", "database", "111", "b1", "{not json", None, None),
            ("e2", "garbageType", "111", "b1", "{}", None, None),
            ("e3", "table", "111", "b1", '{"table": {"noname": 1}}', None, None),
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, bad, d, t, p)
    got = {(r.event_id, r.schema_type) for r in res.dlq.collect()}
    assert got == {("e1", "Database"), ("e2", "garbageType"), ("e3", "Table")}
    assert res.tables.count() == 0 and res.databases.count() == 0


def test_large_table_without_side_channel_parks_in_dlq(spark):
    # ADVICE r01: a largeTable event with no readable side channel must
    # NOT enter the sync scope (that would wipe the target's partitions
    # for that table) — it parks in the DLQ for re-drive, matching the
    # reference's fail-and-redeliver (ImportLargeTable.java:78-81)
    tgt_dbs, tgt_tables, tgt_parts = sample_catalog(spark, catalog_id="999999999999")
    payload = (
        '{"catalog_id": "123412341234", "large_table": true, '
        '"number_of_partitions": 31, '
        '"table": {"database_name": "raw_data_db0", "name": "table_4", '
        '"owner": "o", "retention": 0, "table_type": "EXTERNAL_TABLE", '
        '"parameters": {}, "partition_keys": [], '
        '"storage_descriptor": {"location": "s3://x"}}, '
        '"s3_object_key": "k", "s3_bucket_name": "b"}'
    )
    events = spark.createDataFrame(
        [("e1", "largeTable", "123412341234", "b1", payload, "b", "local")],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    before = tgt_parts.count()
    res = import_events(
        spark, events, tgt_dbs, tgt_tables, tgt_parts, side_channel_path=None
    )
    assert res.partitions.count() == before  # nothing wiped
    dlq = res.dlq.collect()
    assert len(dlq) == 1 and dlq[0].schema_type == "largeTable"
    assert dlq[0].source_glue_catalog_id == "123412341234"


def test_large_table_missing_side_channel_dir_parks_not_wipes(spark, tmp_path):
    """ADVICE r02: side channel IS configured, but one largeTable's
    side-channel directory is missing (failed export, deleted object).
    The reference fails that message (NPE in S3Util.getPartitionsFromS3)
    and redelivers — so we park it in the DLQ and keep it OUT of the
    sync scope rather than wiping the target's partitions with zero
    replacements. Every other table, including the other large one,
    still applies."""
    import shutil

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="b1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    shutil.rmtree(
        f"{side}/catalog_id=123412341234/database_name=raw_data_db0/"
        "table_name=table_4"
    )

    # the target already holds table_4's partitions from a prior sync
    tgt_dbs, tgt_tables, tgt_parts = sample_catalog(spark, catalog_id="999999999999")
    t4 = (F.col("database_name") == "raw_data_db0") & (
        F.col("table_name") == "table_4"
    )
    assert tgt_parts.where(t4).count() == 31
    res = import_events(
        spark, events, tgt_dbs, tgt_tables, tgt_parts,
        target_catalog_id="999999999999", side_channel_path=side,
    )
    assert res.partitions.where(t4).count() == 31  # untouched, NOT wiped
    dlq = res.dlq.collect()
    assert len(dlq) == 1 and dlq[0].schema_type == "largeTable"
    # the other large table (table_3, 11 partitions) still fully applied
    assert res.partitions.where(
        (F.col("database_name") == "raw_data_db0")
        & (F.col("table_name") == "table_3")
    ).count() == 11


def test_corrupt_side_channel_line_dead_letters(spark, tmp_path):
    """A malformed ndjson line in a large table's side channel must NOT
    fail the import or vanish: good lines of that table still apply,
    the bad line lands in the DLQ addressed to its table
    (S3Util.java:223-233 line-by-line parse semantics)."""
    import os

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="b1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    # inject garbage into table_4's side-channel directory
    bad_dir = (
        f"{side}/catalog_id=123412341234/database_name=raw_data_db0/"
        "table_name=table_4"
    )
    assert os.path.isdir(bad_dir)
    with open(f"{bad_dir}/zz-corrupt.json", "w") as fh:
        fh.write("this is {not valid json\n")

    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p, side_channel_path=side)
    # all real partitions applied despite the bad line
    assert res.partitions.count() == 0 + 3 + 10 + 11 + 31
    dlq = res.dlq.collect()
    assert len(dlq) == 1
    assert dlq[0].schema_type == "corruptPartitionLine"
    assert dlq[0].event_id == "123412341234|raw_data_db0|table_4"
    assert "not valid json" in dlq[0].payload


def test_dlq_redrive_converges(spark, tmp_path):
    """Failed-then-fixed flow (DLQImportDatabaseOrTable.java:78-165):
    largeTable events dead-letter while the side channel is unreadable;
    once it exists, re-driving the DLQ through the same import logic
    converges the target to the full catalog and empties the DLQ."""
    from aws_glue_data_catalog_replication_utility_spark.plans.redrive import redrive_dlq

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", run_id=7, batch_id="b1"
    )
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        run_id=7, side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    d, t, p = empty_catalog(spark)

    # side channel "not yet readable": large tables park in the DLQ
    first = import_events(spark, events, d, t, p, side_channel_path=None)
    assert first.dlq.count() == 4  # 2 dbs x 2 large tables
    assert first.tables.count() == 6  # only the small tables applied
    assert first.partitions.count() == 2 * (0 + 3 + 10)

    # blocker fixed: re-drive the DLQ through the same import
    second = redrive_dlq(
        spark,
        first.dlq,
        first.databases,
        first.tables,
        first.partitions,
        side_channel_path=side,
    )
    assert second.dlq.count() == 0
    assert second.tables.count() == 10
    assert second.partitions.count() == 2 * (0 + 3 + 10 + 11 + 31)
    # the re-driven tables were created (not updated) on the target
    created = second.table_import_audit.where(F.col("table_created"))
    assert created.count() == 4


def test_failure_audit_planner_and_export(spark, tmp_path):
    """VERDICT r02 #4: failed publishes must appear in the AUDIT with
    is_exported=False + an error reason (SNSUtil.java:115-123 records
    the failed publish via DDBUtil), not only vanish from the message
    stream. An entity with no name is the one statically-detectable
    publish failure in a pure-plan world."""
    from aws_glue_data_catalog_replication_utility_spark.model import DATABASE

    src_dbs, src_tables, src_parts = sample_catalog(spark)
    bad_db = spark.createDataFrame(
        [("123412341234", None, "nameless", None, None, None)], DATABASE
    )
    # empty prefix list = replicate-everything bypass
    # (GDCReplicationPlanner.java:70-81) so the nameless db reaches publish
    msgs, plan_audit = plan_replication(
        src_dbs.unionByName(bad_db), prefix_string="", batch_id="b1"
    )
    assert msgs.count() == 4  # no message for the nameless db
    assert plan_audit.count() == 5  # ... but it IS audited
    failed = plan_audit.where(~F.col("is_exported")).collect()
    assert len(failed) == 1
    assert failed[0].sns_msg_id is None and "no name" in failed[0].error
    assert plan_audit.where(F.col("is_exported")).where(
        F.col("error").isNotNull()
    ).count() == 0

    # export side: a nameless table audits as failed, emits no message
    bad_tbl = src_tables.where(
        (F.col("database_name") == "raw_data_db0") & (F.col("name") == "table_0")
    ).withColumn("name", F.lit(None).cast("string"))
    side = str(tmp_path / "side")
    tbl_msgs, export_audit = export_catalog(
        spark,
        msgs,
        src_tables.unionByName(bad_tbl),
        src_parts,
        threshold=10,
        batch_id="b1",
        side_channel_path=side,
    )
    assert tbl_msgs.count() == 4 * 5  # 3 inline + 2 large per db, bad one absent
    assert export_audit.count() == 21
    f = export_audit.where(~F.col("is_exported")).collect()
    assert len(f) == 1
    assert "no name" in f[0].error and f[0].sns_msg_id is None


def test_import_failure_audit_rows(spark):
    """Corrupt / unappliable events must produce audit rows with the
    failure flag (DDBUtil.java:150-157 TableReplicationStatus error
    lane), alongside their DLQ rows."""
    large_payload = (
        '{"catalog_id": "111", "large_table": true, '
        '"number_of_partitions": 31, '
        '"table": {"database_name": "raw_data_db0", "name": "table_4", '
        '"owner": "o", "retention": 0, "table_type": "EXTERNAL_TABLE", '
        '"parameters": {}, "partition_keys": [], '
        '"storage_descriptor": {"location": "s3://x"}}, '
        '"s3_object_key": "k", "s3_bucket_name": "b"}'
    )
    bad = spark.createDataFrame(
        [
            ("e1", "database", "111", "b1", "{not json", None, None),
            ("e3", "table", "111", "b1", '{"table": {"noname": 1}}', None, None),
            ("e4", "largeTable", "111", "b1", large_payload, "b", "local"),
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, bad, d, t, p, side_channel_path=None)

    da = res.db_import_audit.collect()
    assert len(da) == 1
    assert da[0].is_created is False and "unparseable" in da[0].error
    assert da[0].db_id == "e1"  # event_id keys the row when name is unknown

    ta = {r.table_id: r for r in res.table_import_audit.collect()}
    assert set(ta) == {"e3", "table_4|raw_data_db0"}
    assert ta["e3"].error == "unparseable table payload"
    assert ta["e3"].table_created is False and ta["e3"].table_updated is False
    assert ta["table_4|raw_data_db0"].error.startswith("no side channel")
    assert ta["table_4|raw_data_db0"].partitions_updated is False
    # nothing applied
    assert res.tables.count() == 0 and res.databases.count() == 0


def test_partition_validation_routes_bad_rows(spark):
    """Per-partition failure INSIDE a batch (GlueUtil.java:425-449
    BatchCreatePartition error handling): a partition row with no
    addressable values dead-letters row-by-row; its siblings still
    apply; the owning table's audit row summarizes the failure count."""
    sd = '{"location": "s3://x"}'
    payload = (
        '{"table": {"database_name": "d1", "name": "t1", "owner": "o", '
        '"retention": 0, "table_type": "EXTERNAL_TABLE", "parameters": {}, '
        '"partition_keys": [{"name": "year", "type": "string"}], '
        f'"storage_descriptor": {sd}}}, '
        '"partition_list": ['
        f'{{"values": ["2024", "01", "01"], "storage_descriptor": {sd}}}, '
        f'{{"values": ["2024", null, "02"], "storage_descriptor": {sd}}}, '
        f'{{"values": ["2024", "01", "03"], "storage_descriptor": {sd}}}]}}'
    )
    events = spark.createDataFrame(
        [("e1", "table", "111", "b1", payload, None, None)],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p)
    # siblings applied, bad row did not poison the batch
    assert res.partitions.count() == 2
    dlq = res.dlq.collect()
    assert len(dlq) == 1 and dlq[0].schema_type == "Partition"
    assert "2024" in dlq[0].payload
    ta = res.table_import_audit.collect()
    assert len(ta) == 1
    assert ta[0].table_created is True
    assert ta[0].export_has_partitions is True
    assert ta[0].error == "1 partition row(s) failed validation"


def test_duplicate_event_in_one_batch_does_not_double_partitions(spark):
    """SQS at-least-once can deliver the same message twice into ONE
    drained batch. The reference applies each message's delete-all-then-
    add-all sequentially (idempotent); the set-oriented union must dedupe
    by partition address with the same latest-event-wins rule as the
    table merge — or every inline partition would appear twice."""
    sd = '{"location": "s3://x"}'
    payload = (
        '{"table": {"database_name": "d1", "name": "t1", "owner": "o", '
        '"retention": 0, "table_type": "EXTERNAL_TABLE", "parameters": {}, '
        '"partition_keys": [{"name": "year", "type": "string"}], '
        f'"storage_descriptor": {sd}}}, '
        '"partition_list": ['
        f'{{"values": ["2024"], "storage_descriptor": {sd}}}, '
        f'{{"values": ["2025"], "storage_descriptor": {sd}}}]}}'
    )
    events = spark.createDataFrame(
        [
            ("e1", "table", "111", "b1", payload, None, None),
            ("e2", "table", "111", "b1", payload, None, None),  # redelivery
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p)
    assert res.tables.count() == 1
    assert res.partitions.count() == 2  # NOT 4
    assert {tuple(r["values"]) for r in res.partitions.collect()} == {
        ("2024",), ("2025",),
    }


def test_auto_create_missing_parent_db(spark):
    # GDCUtil.java:47-57: table arrives whose db is absent on target
    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog

    table_payload = (
        '{"table": {"database_name": "orphan_db", "name": "t1", '
        '"owner": "o", "retention": 0, "table_type": "EXTERNAL_TABLE", '
        '"parameters": {}, "partition_keys": [], '
        '"storage_descriptor": {"location": "s3://x"}}, "partition_list": []}'
    )
    events = spark.createDataFrame(
        [("e1", "table", "111122223333", "b1", table_payload, None, None)],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p)
    dbs = res.databases.collect()
    assert len(dbs) == 1 and dbs[0].name == "orphan_db"
    assert "111122223333" in dbs[0].description  # imported-from marker
    assert res.tables.count() == 1


def test_import_release_frees_parse_caches(spark):
    """ADVICE r04: parse_events materializes (checkpoint+persist) two
    frames per call; ImportResult.release() must free them, or the
    streaming foreachBatch path (one import per micro-batch, release at
    batch end) accumulates CacheManager entries without bound."""
    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()  # isolate from other tests' scoped caches
    events = spark.createDataFrame(
        [("e1", "database", "111", "b1", '{"name": "d1"}', None, None)],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    res = import_events(spark, events, *empty_catalog(spark))
    res.db_import_audit.count()
    assert not cm.isEmpty()  # the parse cut is cached while plans run
    res.release()
    res.release()  # idempotent
    assert cm.isEmpty()


def test_corrupt_hive_type_routes_to_dlq(spark):
    """SURVEY §1.2: a table whose column list carries a malformed Hive
    type string must dead-letter (DLQ + failure-audit row) instead of
    replicating garbage types silently; sibling messages still apply."""
    sd_ok = '{"columns": [{"name": "id", "type": "string"}], "location": "s3://x"}'
    sd_bad = (
        '{"columns": [{"name": "id", "type": "string"}, '
        '{"name": "payload", "type": "aray<string>"}], "location": "s3://x"}'
    )
    mk = lambda name, sd: (
        f'{{"table": {{"database_name": "d1", "name": "{name}", "owner": "o", '
        '"retention": 0, "table_type": "EXTERNAL_TABLE", "parameters": {}, '
        f'"partition_keys": [], "storage_descriptor": {sd}}}, '
        '"partition_list": []}'
    )
    events = spark.createDataFrame(
        [
            ("e1", "table", "111", "b1", mk("t_ok", sd_ok), None, None),
            ("e2", "table", "111", "b1", mk("t_bad", sd_bad), None, None),
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p)
    # sibling applied; bad-typed table NOT replicated
    assert {r.name for r in res.tables.collect()} == {"t_ok"}
    dlq = res.dlq.collect()
    assert len(dlq) == 1
    assert dlq[0].event_id == "e2" and dlq[0].schema_type == "Table"
    ta = {r.table_id: r for r in res.table_import_audit.collect()}
    assert ta["t_bad|d1"].error == "invalid Hive type string in table schema"
    assert ta["t_bad|d1"].table_created is False
    assert ta["t_ok|d1"].table_created is True and ta["t_ok|d1"].error is None


def test_deep_valid_hive_type_replicates(spark):
    """The reference fixture's deep array<struct<...>> nesting
    (sample_table_schema.json:29) must PASS validation — the DLQ lane is
    for malformed strings, not deep ones."""
    deep = (
        "array<struct<sha:string,author:struct<name:string,email:string>,"
        "distinct:boolean,added:array<string>>>"
    )
    sd = (
        f'{{"columns": [{{"name": "payload", "type": "{deep}"}}], '
        '"location": "s3://x"}'
    )
    payload = (
        f'{{"table": {{"database_name": "d1", "name": "t_deep", "owner": "o", '
        '"retention": 0, "table_type": "EXTERNAL_TABLE", "parameters": {}, '
        f'"partition_keys": [{{"name": "year", "type": "string"}}], '
        f'"storage_descriptor": {sd}}}, "partition_list": []}}'
    )
    events = spark.createDataFrame(
        [("e1", "table", "111", "b1", payload, None, None)],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, region_name string",
    )
    res = import_events(spark, events, *empty_catalog(spark))
    assert {r.name for r in res.tables.collect()} == {"t_deep"}
    assert res.dlq.count() == 0


def test_multi_target_fanout(spark, tmp_path):
    """One export -> two target catalogs in ONE run (cross-account SNS
    shape, reference README.md:173-188): both targets converge to the
    source scope, audits are distinguishable by target_glue_catalog_id,
    and re-running the fanout is a per-target no-op (idempotent)."""
    from aws_glue_data_catalog_replication_utility_spark.plans.importer import (
        fanout_db_audit,
        fanout_table_audit,
        import_events_fanout,
    )

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="b1"
    )
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    results = import_events_fanout(
        spark,
        events,
        {
            "111111111111": empty_catalog(spark),
            "222222222222": empty_catalog(spark),
        },
        side_channel_path=side,
    )
    assert set(results) == {"111111111111", "222222222222"}
    expected_tables = src_tables.where(
        F.col("database_name").isin("raw_data_db0", "processed_data_db1")
    ).count()
    for tid, res in results.items():
        assert res.tables.count() == expected_tables
        assert res.databases.count() == 2
        assert res.partitions.count() == 2 * (0 + 3 + 10 + 11 + 31)
        # every audit row carries ITS target's id
        assert res.table_import_audit.where(
            F.col("target_glue_catalog_id") != tid
        ).count() == 0
    # combined planes distinguish targets and cover both
    ta = fanout_table_audit(results)
    per_target = {
        r.target_glue_catalog_id: r.n
        for r in ta.groupBy("target_glue_catalog_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_target == {
        "111111111111": expected_tables,
        "222222222222": expected_tables,
    }
    assert fanout_db_audit(results).count() == 4  # 2 dbs x 2 targets
    # idempotence per target: re-import into the converged snapshots
    again = import_events_fanout(
        spark,
        events,
        {
            tid: (r.databases, r.tables, r.partitions)
            for tid, r in results.items()
        },
        side_channel_path=side,
    )
    for tid, res2 in again.items():
        assert res2.tables.count() == expected_tables
        created = res2.table_import_audit.where(F.col("table_created")).count()
        updated = res2.table_import_audit.where(F.col("table_updated")).count()
        assert created == 0 and updated == 0


def test_fanout_target_failure_semantics(spark, tmp_path):
    """Per-target independence under failure (VERDICT r06 #7): a target
    whose snapshot cannot build its towers (merge key column missing)
    (a) on_error='raise' propagates and NO partial result dict escapes,
    (b) on_error='continue' returns the healthy targets — which then
    execute and audit normally — and records the broken target in
    errors_out; the combined audit shows exactly which targets
    committed (the reference's cross-account contract: one account
    failing never blocks another, README.md:173-188)."""
    import pytest

    from aws_glue_data_catalog_replication_utility_spark.plans.importer import (
        fanout_table_audit,
        import_events_fanout,
    )

    side = str(tmp_path / "side")
    src_dbs, src_tables, src_parts = sample_catalog(spark)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="b1"
    )
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="b1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)

    d_ok, t_ok, p_ok = empty_catalog(spark)
    d2, t2, p2 = empty_catalog(spark)
    broken = (d2, t2.drop("name"), p2)  # no merge key -> tower build fails

    with pytest.raises(Exception):
        import_events_fanout(
            spark, events,
            {"111111111111": (d_ok, t_ok, p_ok), "222222222222": broken},
            side_channel_path=side,
        )

    errors: dict = {}
    results = import_events_fanout(
        spark, events,
        {"111111111111": (d_ok, t_ok, p_ok), "222222222222": broken},
        side_channel_path=side, on_error="continue", errors_out=errors,
    )
    assert set(results) == {"111111111111"}
    assert set(errors) == {"222222222222"}
    expected_tables = src_tables.where(
        F.col("database_name").isin("raw_data_db0", "processed_data_db1")
    ).count()
    # the healthy target applies and audits normally
    assert results["111111111111"].tables.count() == expected_tables
    audit = fanout_table_audit(results)
    per_target = {
        r.target_glue_catalog_id
        for r in audit.select("target_glue_catalog_id").distinct().collect()
    }
    assert per_target == {"111111111111"}
    # invalid on_error rejected
    with pytest.raises(ValueError, match="on_error"):
        import_events_fanout(
            spark, events, {"1": (d_ok, t_ok, p_ok)},
            side_channel_path=side, on_error="rollback",
        )


def test_winner_relation_parallelism_scales_with_input_slices(spark):
    """The enriched winner relation's slice count derives from the
    event relation's own input splits (floor 4), not a constant: a
    metadata-sized batch funnels to 4 slices; a batch arriving as many
    splits (the million-table-catalog shape) keeps proportional
    parallelism through every downstream consumer."""
    from aws_glue_data_catalog_replication_utility_spark.plans.importer import (
        parse_events,
    )

    payload = (
        '{"table": {"database_name": "d1", "name": "t%d", "owner": "o", '
        '"retention": 0, "table_type": "EXTERNAL_TABLE", "parameters": {}, '
        '"partition_keys": [], '
        '"storage_descriptor": {"location": "s3://x"}}, "partition_list": []}'
    )
    schema = (
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, "
        "region_name string"
    )
    rows = [
        (f"e{i}", "table", "111", "b1", payload % i, None, None)
        for i in range(64)
    ]

    # the derived slice count is applied via coalesce (never a second
    # shuffle), so it is additionally capped by shuffle.partitions —
    # raise it past the derived counts for the duration so the scaling
    # itself is observable (any real deployment runs with far more)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        small = parse_events(
            spark, spark.createDataFrame(rows, schema).coalesce(2)
        )
        try:
            assert small.incoming_tables.rdd.getNumPartitions() == 4
        finally:
            for m in small.materialized:
                m.unpersist()

        wide = parse_events(
            spark, spark.createDataFrame(rows, schema).repartition(64)
        )
        try:
            assert wide.incoming_tables.rdd.getNumPartitions() == 8
        finally:
            for m in wide.materialized:
                m.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
