"""Phase profiler for q34/q55 (VERDICT r12 #2): split the replication
towers' wall time into generator / plan / export-build / parse /
apply-build / exec, with per-phase Spark job counts, so the driver-
constant claims stay measurable.

Usage: PYTHONPATH=/root/repo python tools/profile_replication.py
           [--cpus N] [--n N] [--query q34|q55]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(spark) -> int:
    t = spark.sparkContext.statusTracker()
    return len(t.getJobIdsForGroup(None) or [])


def profile_q34(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.concurrency import (
        run_overlapped,
    )
    from aws_glue_data_catalog_replication_utility_spark.model import (
        empty_catalog,
        synthetic_catalog,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.export import (
        export_catalog,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.importer import (
        import_events,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.planner import (
        plan_replication,
    )

    out: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name: str) -> None:
        nonlocal t
        now = time.perf_counter()
        out[name] = round(now - t, 3)
        t = now

    side = tempfile.mkdtemp(prefix="prof34_side_")
    src_dbs, src_tables, src_parts = synthetic_catalog(spark, n_dbs=24)
    lap("gen")
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="bench"
    )
    lap("plan")
    mats: list = []
    writers: list = []
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="bench",
        side_channel_path=side, materialized_out=mats,
        side_channel_writer_out=writers,
    )
    lap("export_build")
    th = run_overlapped(writers[0])
    events = msgs.unionByName(tbl_msgs).coalesce(4)
    d, tt, p = empty_catalog(spark)
    lap("pre_import")
    res = import_events(
        spark, events, d, tt, p, side_channel_path=side,
        side_channel_ready=th.join, enriched_fill="async",
    )
    lap("import_build")
    df = (
        res.table_import_audit.groupBy("table_created", "table_updated")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("table_created", "table_updated")
    )
    lap("audit_build")
    df.write.format("noop").mode("overwrite").save()
    lap("exec")
    for m in mats + list(res.materialized):
        m.unpersist()
    if res.fill_thread is not None:
        res.fill_thread.join()
    return out


def profile_q55(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.concurrency import (
        run_overlapped,
    )
    from aws_glue_data_catalog_replication_utility_spark.model import (
        empty_catalog,
        synthetic_catalog,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.export import (
        export_catalog,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.importer import (
        fanout_table_audit,
        import_events,
        import_events_fanout,
        parse_events,
    )
    from aws_glue_data_catalog_replication_utility_spark.plans.planner import (
        plan_replication,
    )

    out: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name: str) -> None:
        nonlocal t
        now = time.perf_counter()
        out[name] = round(now - t, 3)
        t = now

    side = tempfile.mkdtemp(prefix="prof55_side_")
    src_dbs, src_tables, src_parts = synthetic_catalog(spark, n_dbs=4)
    lap("gen")
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="bench"
    )
    mats: list = []
    writers: list = []
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="bench",
        side_channel_path=side, materialized_out=mats,
        side_channel_writer_out=writers,
    )
    lap("export_build")
    th = run_overlapped(writers[0])
    events = msgs.unionByName(tbl_msgs).coalesce(4)
    parsed = parse_events(
        spark, events, side, side_channel_ready=th.join, enriched_fill="async"
    )
    lap("parse")
    base = import_events(
        spark, events, *empty_catalog(spark), side_channel_path=side,
        parsed=parsed,
    )
    lap("base_apply_build")
    drift = F.when(
        (F.col("database_name") == "raw_data_db0") & (F.col("name") == "table_0"),
        F.lit("stale description"),
    ).otherwise(F.col("description"))
    results = import_events_fanout(
        spark,
        events,
        {
            "111111111111": empty_catalog(spark),
            "222222222222": (
                base.databases,
                base.tables.withColumn("description", drift),
                base.partitions,
            ),
        },
        side_channel_path=side,
        parsed=parsed,
    )
    lap("fanout_build")
    df = (
        fanout_table_audit(results)
        .groupBy("target_glue_catalog_id", "table_created", "table_updated")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("target_glue_catalog_id", "table_created", "table_updated")
    )
    lap("audit_build")
    df.write.format("noop").mode("overwrite").save()
    lap("exec")
    for m in mats + list(parsed.materialized):
        m.unpersist()
    if parsed.fill_thread is not None:
        parsed.fill_thread.join()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--query", default="q34")
    args = ap.parse_args()

    from aws_glue_data_catalog_replication_utility_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_repl", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fn = profile_q34 if args.query == "q34" else profile_q55

    # warm-up run (uncounted: JVM/codegen/Py4J warm state)
    fn(spark, sf_dir)
    rows: list[dict] = []
    for _ in range(args.n):
        spark.catalog.clearCache()
        rows.append(fn(spark, sf_dir))
    phases = list(rows[0])
    med = {ph: statistics.median(r[ph] for r in rows) for ph in phases}
    print(f"--- {args.query} medians of n={args.n} (cpus={args.cpus}) ---")
    for ph in phases:
        print(f"{ph:16s} {med[ph]:7.3f}   raw={[round(r[ph], 2) for r in rows]}")
    print(f"{'TOTAL':16s} {sum(med.values()):7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
