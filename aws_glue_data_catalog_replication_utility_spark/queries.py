"""Declared query registry: the correctness + bench surface.

Every SURVEY.md §2B operator appears here as a (spark_fn, oracle_sql)
pair. The spark_fn takes (spark, sf_dir) and returns a DataFrame; the
oracle is ANSI SQL DuckDB runs over the same parquet views. The driver
hash-compares values column-name-sorted and order-insensitively, so:

- every computed column is aliased IDENTICALLY on both sides;
- numeric rules for bit-exact cross-engine equality (verified empirically):
  * sums of doubles go through DECIMAL (order-independent exact adds),
    final CAST AS DOUBLE;
  * per-row double arithmetic (x*y, a/b) is IEEE-identical — used raw;
  * array dot products are left-to-right double folds on both sides;
  * NO round() on hash-checked doubles (round impls could differ);
- counts are bigint on both sides (DuckDB SUM(int)->HUGEINT is cast);
- top-k queries carry a total tie-break ordering so the selected SET is
  deterministic even though row order doesn't matter for the hash.

Reference-parity queries cite the reference behavior they generalize
(file:line into /root/reference).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .concurrency import run_overlapped
from .session import load_tables
from .operators import (
    exists_semi,
    full_refresh_sync,
    latest_by,
    merge_outcomes,
    missing_anti,
    prefix_semi_join,
    threshold_route,
)
from .functions.dedup import (
    MINHASH_AB,
    MINHASH_P,
    ensure_min_parallelism,
    exact_dedup,
    jaccard_pairs,
    minhash_band_pairs,
    minhash_signature,
    minhash_signature_arrays,
    simhash,
    simhash_pairs,
    word_shingles,
)
from .functions.multimodal import attach_blob, blob_features
from .functions.similarity import cosine_topk
from .functions import text as TX
from .streaming.rollup import windowed_rollup

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


# multi-consumer subplans persist()ed by queries, still cached for the
# caller's collect of the LAST query's result; evicted (scoped — never
# spark.catalog.clearCache(), which would also drop caches an embedding
# application owns) when the NEXT registry query starts, so a 50-query
# sweep in one session doesn't accumulate cached relations
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    """Materialize a shared subplan once (Spark does NOT reuse
    non-exchange subplans across plan branches) and register it for
    scoped eviction at the next registry call."""
    df = df.persist()
    df.count()
    _PERSISTED.append(df)
    return df


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            while _PERSISTED:
                _PERSISTED.pop().unpersist()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = wrapped
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def registry() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLE)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, list(names))
    return [tabs[n] for n in names]


def _dec(col, scale: int = 2):
    """Order-independent exact double sum: cast to decimal pre-sum."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(
        f"decimal(18,{scale})"
    )


# side-effecting queries (q12 versioned store, q13 skip-index store)
# build scratch stores the caller's later collect still reads: each
# invocation retires the PREVIOUS invocation's directory (its result
# was collected before the registry moved on — the same lifetime
# contract _persist relies on) and atexit sweeps the last one, so a
# 3x bench run leaves nothing under /tmp
_SCRATCH_DIRS: dict[str, str] = {}
_SCRATCH_SWEEP_REGISTERED = False


def _scratch_dir(tag: str) -> str:
    import atexit
    import shutil
    import tempfile

    global _SCRATCH_SWEEP_REGISTERED
    old = _SCRATCH_DIRS.pop(tag, None)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=f"{tag}_")
    if not _SCRATCH_SWEEP_REGISTERED:
        # one sweeper per process (ADVICE r09: keying on dict
        # emptiness after the pop re-registered a lambda every time a
        # single tag cycled — unbounded handler growth in bench loops)
        _SCRATCH_SWEEP_REGISTERED = True
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True)
                for p in _SCRATCH_DIRS.values()
            ]
        )
    _SCRATCH_DIRS[tag] = d
    return d


# read-only derived stores (q13's range-laid orders) are a pure
# function of sf_dir: build once per (tag, key) per process, reuse on
# repeated invocations (bench runs each query 3x), swept by the same
# atexit hook
_SCRATCH_STORES: dict[tuple, str] = {}


def _cached_scratch_store(tag: str, key: str, build) -> str:
    k = (tag, key)
    path = _SCRATCH_STORES.get(k)
    if path is not None and os.path.isdir(path):
        return path
    path = _scratch_dir(tag) + "/store"
    build(path)
    _SCRATCH_STORES[k] = path
    return path


# ---------------------------------------------------------------------------
# 1. aggregation core (hash agg, SURVEY §2A #22-23)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the hash-aggregation workhorse.
    Map-side partial aggregation; one shuffle on a 6-value group key.
    The split-guard repartition fires only when the scan has fewer
    splits than cores (the local single-row-group file, which parquet
    cannot split) — with real multi-file input it is a no-op and the
    partial agg runs straight off the scan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    li = ensure_min_parallelism(li, keys=["l_orderkey", "l_linenumber"])
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                _dec(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax")),
                    6,
                )
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 2. scan / filter / projection (SURVEY §2A #1-3, #13-14)
# ---------------------------------------------------------------------------


@register(
    "q02_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice*(1-l_discount) AS revenue
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def q02_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down filter + pruned projection — the snapshot scan
    (GlueUtil.java:84-105 pagination becomes a partitioned scan;
    predicate + column pruning reach the parquet reader)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# 3. prefix theta-semi-join (planner filter, GDCReplicationPlanner.java:124-137)
# ---------------------------------------------------------------------------


@register(
    "q03_prefix_filter",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE lower(n_name) LIKE 'nation_1%' OR lower(n_name) LIKE 'nation_2%'
    """,
)
def q03_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-planner prefix filter: keep entities whose lowercased
    name starts with any configured prefix
    (GDCReplicationPlanner.java:109-137, empty-config bypass :70-81)."""
    (nation,) = _t(spark, sf_dir, "nation")
    return prefix_semi_join(
        nation.select("n_nationkey", "n_name"), ["NATION_1", "NATION_2"], col="n_name"
    )


# ---------------------------------------------------------------------------
# 4-5. existence semi/anti joins (GlueUtil.java:63-75, create-if-absent)
# ---------------------------------------------------------------------------


@register(
    "q04_exists_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def q04_exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-form existence probe (replaces per-entity GetTable lookups,
    GlueUtil.java:240-253): orders having a qualifying lineitem."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    big = li.where(F.col("l_quantity") >= 49).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return exists_semi(
        orders.select("o_orderkey", "o_totalprice"), big, ["o_orderkey"]
    )


@register(
    "q05_anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q05_anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The to-create diff (create-if-EntityNotFound, GlueUtil.java:142-167):
    customers with no urgent orders."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return missing_anti(
        cust.select("c_custkey", "c_name"),
        orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        ["c_custkey"],
    )


# ---------------------------------------------------------------------------
# 6. threshold routing (ExportDatabaseWithTables.java:73,172-216)
# ---------------------------------------------------------------------------


@register(
    "q06_threshold_route",
    oracle="""
    SELECT c.c_custkey, COALESCE(n.n, 0) AS n_children,
           CASE WHEN COALESCE(n.n, 0) <= 10 THEN 'inline' ELSE 'large' END AS route
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) n
      ON n.o_custkey = c.c_custkey
    """,
)
def q06_threshold_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small/large routing at the reference's threshold 10
    (ExportDatabaseWithTables.java:73): inline payload vs side-channel.
    Zero children routes inline (empty partitionList is published)."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    routed = threshold_route(
        cust.select("c_custkey"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        on=["c_custkey"],
        threshold=10,
    )
    return routed.select("c_custkey", "n_children", "route")


# ---------------------------------------------------------------------------
# 7. window latest-run dedup (audit tables keyed (id, run_id))
# ---------------------------------------------------------------------------


@register(
    "q07_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def q07_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Current status' per entity over an append-only audit stream —
    the (id, run_id) key design of the DDB audit tables
    (template.yaml:39-45) as a window rank."""
    (events,) = _t(spark, sf_dir, "events")
    return latest_by(
        events.select("user_id", "event_id", "ts", "event_type"),
        keys=["user_id"],
        order_col="ts",
        tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# 8. MERGE outcome flags (GlueUtil.java:264-350 createOrUpdateTable)
# ---------------------------------------------------------------------------


@register(
    "q08_merge_outcomes",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_totalprice AS value, o_orderstatus AS status
               FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
         s AS (SELECT o_orderkey,
                      CASE WHEN o_orderpriority = '1-URGENT'
                           THEN o_totalprice + 10 ELSE o_totalprice END AS value,
                      o_orderstatus AS status
               FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.value ELSE t.value END AS value,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.status ELSE t.status END AS status,
           CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NULL THEN 'create'
                WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                     AND (s.value IS DISTINCT FROM t.value
                          OR s.status IS DISTINCT FROM t.status) THEN 'update'
                WHEN s.o_orderkey IS NOT NULL THEN 'skip'
                ELSE 'keep' END AS merge_action
    FROM s FULL OUTER JOIN t ON s.o_orderkey = t.o_orderkey
    """,
)
def q08_merge_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE with created/updated/skipped flags — the set form of
    TableReplicationStatus (GlueUtil.java:264-350): target snapshot =
    pre-1998 orders, source snapshot = post-1996 orders with urgent
    orders 'modified'; one full-outer join decides every outcome."""
    (orders,) = _t(spark, sf_dir, "orders")
    target = orders.where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    ).select(
        "o_orderkey",
        F.col("o_totalprice").alias("value"),
        F.col("o_orderstatus").alias("status"),
    )
    source = orders.where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ).select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") + 10
        )
        .otherwise(F.col("o_totalprice"))
        .alias("value"),
        F.col("o_orderstatus").alias("status"),
    )
    return merge_outcomes(source, target, keys=["o_orderkey"])


# ---------------------------------------------------------------------------
# 9. partition full-refresh sync (GDCUtil.java:61-111, README.md:266-273)
# ---------------------------------------------------------------------------


@register(
    "q09_partition_full_refresh",
    oracle="""
    WITH exp_t AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         exp_p AS (SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
                   FROM lineitem l JOIN exp_t ON l.l_orderkey = exp_t.o_orderkey
                   WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'),
         kept AS (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
                  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM exp_t))
    SELECT * FROM kept UNION ALL SELECT * FROM exp_p
    """,
)
def q09_partition_full_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-case partition sync (export-set becomes the whole truth for
    exported tables; delete-all-then-add-all, NOT a minimal diff —
    GDCUtil.java:61-111): orders≙tables, lineitems≙partitions. Urgent
    orders are 'in the export'; only their post-1997 lineitems survive,
    including urgent orders whose exported set is empty (wipe case)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    exported_tables = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    parts = li.select("l_orderkey", "l_linenumber", "l_quantity")
    exported_parts = exists_semi(
        li.where(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")),
        exported_tables,
        ["l_orderkey"],
    ).select("l_orderkey", "l_linenumber", "l_quantity")
    return full_refresh_sync(
        exported_parts, exported_tables, parts, keys=["l_orderkey"]
    )


# ---------------------------------------------------------------------------
# 10. union + audit counters (#23, #26)
# ---------------------------------------------------------------------------


@register(
    "q10_audit_counts",
    oracle="""
    SELECT status, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT 'exported' AS status, event_type, value FROM events WHERE value > 900
      UNION ALL
      SELECT 'skipped' AS status, event_type, value FROM events WHERE value <= 900
    ) GROUP BY status, event_type
    """,
)
def q10_audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of per-run outcomes + counters — the exported/skipped
    statistics the reference tracks with AtomicIntegers and DDB audit
    rows (ExportDatabaseWithTables.java:137,196-222)."""
    (events,) = _t(spark, sf_dir, "events")
    exported = events.where(F.col("value") > 900).select(
        F.lit("exported").alias("status"), "event_type", "value"
    )
    skipped = events.where(F.col("value") <= 900).select(
        F.lit("skipped").alias("status"), "event_type", "value"
    )
    return (
        exported.unionByName(skipped)
        .groupBy("status", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value", 6)).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# 11. JSON codec (#15: Gson toJson/fromJson -> get_json_object)
# ---------------------------------------------------------------------------


@register(
    "q11_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q11_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode (message bodies are JSON documents,
    SNSUtil.java:101-102): extract a field, bucket, aggregate."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("int") % 10),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# 12. vstore as a Spark FORMAT (r11 registry rotation, VERDICT r10 #4: the
# round-10 flagship — the store mounted on spark.read/write.format("vstore")
# — was pytest-only at the driver-oracle plane; this slot pins the format
# END-TO-END: a format write, a pushdown-PRUNED read that provably skips
# files (every stats-excluded live file is physically corrupted, so a scan
# that failed to prune cannot return — the q13 discipline), and a
# timestampAsOf time-travel read, all value-checked against a DuckDB
# reconstruction over the same source rows. The library-API lifecycle that
# held this slot since r08 keeps its oracle running bit-exactly as a
# retired-slot twin in tests/test_versioned.py.)
# ---------------------------------------------------------------------------


@register(
    "q12_vstore_format_read",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT 'asof' AS leg, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           MAX(o_orderkey) AS max_key
    FROM v1 WHERE o_orderkey < 1000
    UNION ALL
    SELECT 'now', COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
           MAX(o_orderkey)
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    WHERE o_orderkey < 1000
    """,
)
def q12_vstore_format_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned store driven entirely through the Spark FORMAT
    surface (sources/vstore_source.py): two df.write.format("vstore")
    appends build a range-laid store (v1 = every 5th order, v2 = every
    10th with doubled price, written ~50ms later), then two format
    READS answer (a) the snapshot AS OF a timestamp between the
    commits and (b) the current snapshot, both under a pushed-down
    `o_orderkey < 1000` predicate. Pruning is PROOF-driven: every live
    file whose log stats exclude the predicate is physically corrupted
    before the reads run, and the query RAISES if the pruner excludes
    nothing — a scan that failed to push filters or to prune cannot
    return the right answer by accident. Reference tie-in: the
    replicated catalog served through the standard reader surface
    (the reference's import side writes targets consumers then query,
    ImportDatabaseOrTable.java:117-128)."""
    import time as _time

    from . import versioned as V
    from .sources.vstore_source import (
        _prune_with_log_stats,
        register_vstore_source,
    )

    register_vstore_source(spark)
    (orders,) = _t(spark, sf_dir, "orders")
    root = _scratch_dir("q12_vstore_fmt") + "/t"
    cut = 1000

    def _laid(df):
        return df.repartitionByRange(4, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        )

    v1 = orders.where("o_orderkey % 5 = 0").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    _laid(v1).write.format("vstore").mode("append").save(root)
    _time.sleep(0.05)
    t_mid = _time.time()
    _time.sleep(0.05)
    v2 = orders.where("o_orderkey % 10 = 0").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    _laid(v2).write.format("vstore").mode("append").save(root)

    # corrupt every live file the log stats EXCLUDE under the pushed
    # predicate: if Spark fails to push the filter into the source, or
    # the source fails to prune, the scan opens garbage and dies
    live, rows, stats, _ = V._replay_stats(root, None)
    kept = set(
        _prune_with_log_stats(
            live, rows, stats, [("o_orderkey", "<", cut)], []
        )
    )
    excluded = set(live) - kept
    if not excluded or not kept:
        raise RuntimeError(
            f"vstore format pruning pin failed: {len(kept)} kept / "
            f"{len(excluded)} excluded of {len(live)} files — the "
            "range layout must make the predicate prune"
        )
    for f in excluded:
        with open(os.path.join(root, f), "wb") as fh:
            fh.write(b"corrupt: a scan that reads this failed to prune")

    def leg(tag: str, reader) -> DataFrame:
        return (
            reader.where(F.col("o_orderkey") < cut)
            .agg(
                F.lit(tag).alias("leg"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )

    # pruneFiles=true: filter-derived pruning is opt-in (r11 — Spark
    # caches planned partitions per relation, so pruned plans are only
    # safe on one-query DataFrames like these fresh load()s)
    asof = leg(
        "asof",
        spark.read.format("vstore")
        .option("timestampAsOf", str(t_mid))
        .option("pruneFiles", "true")
        .load(root),
    )
    now = leg(
        "now",
        spark.read.format("vstore").option("pruneFiles", "true").load(root),
    )
    return asof.unionByName(now)


def q12_vstore_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-store lifecycle (versioned.py — the engine's owned
    table format, standing in for the reference's replicate-then-serve
    target tables): append a base snapshot, MERGE an update batch
    (matched keys replaced + one insert), DELETE by predicate, then
    read EVERY version back by time travel and aggregate each — the
    returned relation is one row per version, value-checked against a
    DuckDB reconstruction of the same lifecycle."""
    from . import versioned as V

    (orders,) = _t(spark, sf_dir, "orders")
    base = orders.where("o_orderkey % 5 = 0").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # the driver may collect the returned frame long after this call:
    # the store directory must outlive the function; _scratch_dir keeps
    # it alive until the NEXT invocation (or process exit) and sweeps
    # it then, so repeated bench runs don't accrete /tmp debris
    root = _scratch_dir("q12_vstore") + "/t"
    V.append(base, root)  # v1
    upd = (
        orders.where("o_orderkey % 10 = 0")
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
        .unionByName(
            orders.sparkSession.createDataFrame(
                [(-1, -1, 42.0)],
                "o_orderkey bigint, o_custkey bigint, o_totalprice double",
            )
        )
    )
    V.merge_into(spark, root, upd, ["o_orderkey"])  # v2
    V.delete_where(spark, root, "o_custkey % 7 = 0")  # v3

    out = None
    for v in (1, 2, 3):
        snap = V.read_versioned(spark, root, v)
        agg = snap.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.when(F.col("o_orderkey") < 0, 1)).alias("n_inserted"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# ---------------------------------------------------------------------------
# 13. file-skipping scan (r09 registry rotation: the skipping layer —
# min/max + bloom file indexes, functions/skipindex.py — had only
# pytest twins; this slot value-checks a PRUNED scan against the
# DuckDB full-scan answer. q58_product_quantization rotated out: its
# PQ-code semantics stay pinned by q59/q60, which consume the same
# codes, plus the bit-exact DuckDB twin kept in tests/test_functions.)
# ---------------------------------------------------------------------------


@register(
    "q13_skipindex_scan",
    oracle="""
    SELECT 'range' AS leg, o_orderpriority AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'point' AS leg, CAST(o_orderkey AS VARCHAR) AS k,
           CAST(1 AS BIGINT) AS n, o_totalprice AS total
    FROM orders
    WHERE o_custkey = 41
    """,
)
def q13_skipindex_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping scan, value-checked end-to-end: orders is laid out
    range-partitioned on o_orderdate (8 files, the layout the min/max
    index exists for), a footer-stats index plus an o_custkey bloom
    index are built, and two pruned scans answer (a) a 12-month range
    aggregate — the scan RAISES if the index failed to prune files,
    so this slot pins pruning power, not just safety — and (b) an
    equality point-lookup on the scattered key through the bloom
    layer. Results are bit-identical to DuckDB's full scans because
    pruning only drops files PROVED empty of matches and the residual
    filter re-applies the predicates (functions/skipindex.py).
    Reference tie-in: the reference's read path narrows work to what a
    message names (S3Util.java:201-236 reads only the keyed object);
    this is the same narrowing at the file-statistics plane."""
    import datetime

    from .functions.skipindex import (
        build_bloom_index,
        build_skip_index,
        scan_with_skip_index,
    )

    (orders,) = _t(spark, sf_dir, "orders")

    def build(path: str) -> None:
        (
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
                "o_orderpriority",
            )
            .repartitionByRange(8, "o_orderdate")
            .sortWithinPartitions("o_orderdate")
            .write.parquet(path)
        )

    # the store is a pure function of sf_dir: built once per process,
    # reused on bench's repeated invocations (the indexes rebuild per
    # call — THEY are part of the measured operator, the store layout
    # is setup)
    store = _cached_scratch_store("q13_skipstore", sf_dir, build)
    idx = build_skip_index(spark, store)
    bloom = build_bloom_index(spark, store, ["o_custkey"], m_bits=1 << 14)

    rng, info = scan_with_skip_index(
        spark,
        idx,
        [
            ("o_orderdate", ">=", datetime.datetime(1995, 1, 1)),
            ("o_orderdate", "<", datetime.datetime(1996, 1, 1)),
        ],
    )
    # 12 months of an ~80-month span over 8 range files: the index
    # must prove most files out — a kept==total scan means the
    # skipping layer silently stopped working
    if not info["files_kept"] < info["files_total"]:
        raise AssertionError(f"skip index failed to prune: {info}")
    leg_range = (
        rng.groupBy(F.col("o_orderpriority").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select(F.lit("range").alias("leg"), "k", "n", "total")
    )
    pt, _ = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", 41)], bloom=bloom
    )
    leg_point = pt.select(
        F.lit("point").alias("leg"),
        F.col("o_orderkey").cast("string").alias("k"),
        F.lit(1).cast("bigint").alias("n"),
        F.col("o_totalprice").alias("total"),
    )
    return leg_range.unionByName(leg_point)


# ---------------------------------------------------------------------------
# 14-15. sort/limit + multi-way joins (deterministic top-k; bench heads)
# (r05 registry consolidation: the driver's correctness artifact caps at
# 50 rows, so single-operator queries subsumed by richer ones were
# folded — standalone top-k (was q13) was pinned by q14's
# TakeOrderedAndProject tail and q38's; the q13 slot was re-used by the
# r09 skip-index rotation above.)
# ---------------------------------------------------------------------------


@register(
    "q14_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
)
def q14_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-way join + agg + top-k. customer is the small
    side (broadcast); lineitem⋈orders shuffles on the order key."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust["c_custkey"] == orders["o_custkey"])
        .where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz"))
        .join(
            li.where(
                F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q15_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q15_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join: dims (region/nation/supplier/customer)
    broadcast; facts shuffle once on the order key."""
    cust, orders, li, sup, nat, reg = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(reg.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# 16-19. dedup extensions (north star)
# ---------------------------------------------------------------------------


@register(
    "q16_dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: one hash aggregation, keeps
    the min doc_id deterministically (vs dropDuplicates' arbitrary row)."""
    (docs,) = _t(spark, sf_dir, "documents")
    # split-guard: md5 fingerprinting is compute-bound and the local
    # single-row-group scan would otherwise run it on one task
    with_fp = ensure_min_parallelism(docs, keys=["doc_id"]).select(
        TX.fingerprint("text").alias("fp"), "doc_id"
    )
    return exact_dedup(with_fp, ["fp"], "doc_id")


_SHINGLE_SQL = """
      SELECT doc_id,
             unnest(list_distinct([array_to_string(list_slice(toks, i, i+4), ' ')
                                   for i in range(1, greatest(len(toks)-3, 1))])) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
"""

# DuckDB mirror of the MinHash universal-hash family (dedup.MINHASH_AB):
# one md5 per shingle -> int64 base hash -> k integer permutations mod P
_MH_BASE_SQL = (
    "SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h FROM sh"
)


def _mh_min_sql(i: int) -> str:
    a, b = MINHASH_AB[i]
    return f"MIN(({a}*h + {b}) % {MINHASH_P})"


# shared Jaccard pair-generation CTEs (assumes a preceding `sh` CTE):
# per-doc set sizes + inverted-index intersection counts. ONE definition
# so the q17 baseline, the q19 recall anchor, and the q53 clustering
# oracle can never silently diverge on the pair semantics.
_JACCARD_CTES = """
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""



# (exact-Jaccard pairs as a standalone query — was q17 — folded in r05:
# the identical pair semantics stay pinned THREE ways — q37 runs
# jaccard_pairs with df-pruning against the same _JACCARD_CTES oracle,
# q19 recomputes the exact pairs inside its recall oracle, and the q53
# clustering oracle builds its edges from them.)


@register(
    "q18_minhash_signatures",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    hs AS ({_MH_BASE_SQL})
    SELECT doc_id,
           {', '.join(f"{_mh_min_sql(i)} AS mh_{i}" for i in range(12))}
    FROM hs GROUP BY doc_id
    """,
)
def q18_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MinHash signatures via the universal-hash family
    (ONE md5 per shingle -> int64 -> k integer permutations (a*h+b)%P,
    the textbook pairwise-independent construction — k/1 cheaper than k
    salted md5 calls): array_min over the per-document shingle array,
    one narrow projection in whole-stage codegen. No aggregation
    shuffle; the only possible exchange is the split-count guard's
    repartition of the compact input (skipped whenever input splits
    already cover the cores — always true at 100 TB; see
    minhash_signature_arrays). Value-identical to the explode+groupBy
    form (the oracle IS that form, in DuckDB, same integer
    arithmetic)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return minhash_signature_arrays(docs, "doc_id", "text", n=5, num_hashes=12)


@register(
    "q19_lsh_candidate_recall",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),{_JACCARD_CTES},
    exact AS (
      SELECT id_a, id_b, inter / (x.sz + y.sz - inter) AS jaccard
      FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
      WHERE inter / (x.sz + y.sz - inter) >= 0.6
    ),
    hs AS ({_MH_BASE_SQL}),
    sig AS (
      SELECT doc_id,
             [{', '.join(f"CAST({_mh_min_sql(i)} AS VARCHAR)" for i in range(12))}] AS mh
      FROM hs GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b, array_to_string(mh[b*3+1 : b*3+3], '|') AS band_key
      FROM sig CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT e.id_a, e.id_b, e.jaccard,
           (c.id_a IS NOT NULL) AS captured
    FROM exact e LEFT JOIN cand c ON e.id_a = c.id_a AND e.id_b = c.id_b
    """,
)
def q19_lsh_candidate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB dedup path, recall-verified: MinHash-LSH banding
    (4 bands x 3 rows) generates candidate pairs via a band-key
    equi-join — never the quadratic all-pairs — and every exact Jaccard
    >= 0.6 pair (the q17 baseline) is annotated with whether the banding
    captured it. The hash check pins recall exactly: both engines
    recompute the same deterministic md5 banding."""
    (docs,) = _t(spark, sf_dir, "documents")
    # three consumers (pair join x2 sides, size agg, signature agg) read
    # the shingle relation: materialize it ONCE instead of re-exploding
    # per branch — measured 3-4x on this query at sf0.1. At cluster
    # scale this is the classic "reuse a partitioning across stages"
    # point; storage level spills to disk if executors are tight.
    # parallelize the explode: the scan is one tiny split locally, and a
    # shuffle-free explode would serialize onto it (see
    # ensure_min_parallelism) — repartitioning the compact docs first
    # spreads the shingle work AND gives the cache that partitioning
    sh = _persist(
        word_shingles(
            ensure_min_parallelism(docs, fraction=0.25, keys=["doc_id"]), "doc_id", "text", n=5
        )
    )  # materialized before branches race the cache
    exact = jaccard_pairs(sh, "doc_id", threshold=0.6)
    # signatures reuse the cached exploded relation (4th consumer): one
    # cheap 12-min agg over cached rows beats recomputing shingles+md5
    # from the raw docs (the standalone array lane is q18's plan)
    sigs = minhash_signature(sh, "doc_id", num_hashes=12)
    cands = minhash_band_pairs(sigs, "doc_id", num_hashes=12, bands=4).withColumn(
        "captured", F.lit(True)
    )
    return exact.join(cands, on=["id_a", "id_b"], how="left").select(
        "id_a",
        "id_b",
        "jaccard",
        F.coalesce("captured", F.lit(False)).alias("captured"),
    )


# ---------------------------------------------------------------------------
# 20. text analysis (north star) — full per-document profile
# (r05 consolidation: absorbed q30_language_quality and
# q36_rolling_fingerprint — all three were per-document column profiles
# over the same scan, so ONE projection now pins the whole text-analysis
# surface: counts/ratios/fp + lang-ID + quality + winnowing sketch.)
# ---------------------------------------------------------------------------


def _sw_sql(lang_words) -> str:
    return "len(list_filter(toks, t -> t IN ({})))".format(
        ", ".join(f"'{w}'" for w in lang_words)
    )


@register(
    "q20_text_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks,
             lower(trim(text)) AS s
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text, toks, s,
             {_sw_sql(TX.STOPWORDS["en"])} AS s_en,
             {_sw_sql(TX.STOPWORDS["de"])} AS s_de,
             {_sw_sql(TX.STOPWORDS["es"])} AS s_es,
             {_sw_sql(TX.STOPWORDS["fr"])} AS s_fr
      FROM base
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS INTEGER) AS n_words,
           CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text)
                ELSE 0.0 END AS punct_ratio,
           len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','for','on')))
             / len(toks) AS stopword_ratio,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang,
           0.5 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
             + 0.5 * least((s_en / len(toks)) * 5.0, 1.0)
             - 0.25 * least(
                 (CASE WHEN length(text) > 0
                       THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                            / length(text)
                       ELSE 0.0 END) * 10.0, 1.0) AS quality,
           array_to_string(
             list_slice(
               list_sort(list_distinct(
                 [md5(substring(s, i, 8))
                  for i in range(1, greatest(length(s) - 7 + 1, 2))])),
               1, 4),
             '|') AS fp_sketch,
           CASE WHEN len(toks) >= 2 THEN
                list_max(list_transform(list_distinct(grams),
                  v -> len(list_filter(grams, x -> x = v)))) * 1.0
                  / (len(toks) - 1)
                ELSE 0.0 END AS top_2gram_frac,
           COALESCE(array_to_string(list_filter([
             CASE WHEN len(toks) < 5 THEN 'too_few_tokens' END,
             CASE WHEN (CASE WHEN length(text) > 0
                        THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                             / length(text) ELSE 0.0 END) > 0.3
                  THEN 'punct_ratio' END,
             CASE WHEN len(list_filter(toks, t -> t IN
                    ('the','a','of','and','to','in','is','it','for','on')))
                    * 1.0 / len(toks) < 0.02 THEN 'stopword_ratio' END,
             CASE WHEN (CASE WHEN len(grams) > 0 THEN
                        list_max(list_transform(list_distinct(grams),
                          v -> len(list_filter(grams, x -> x = v)))) * 1.0
                          / len(grams) ELSE 0.0 END) > 0.20
                  THEN 'top_2gram_frac' END],
             x -> x IS NOT NULL), '|'), '') AS filter_reasons
    FROM (SELECT *,
                 CASE WHEN len(toks) >= 2
                      THEN [array_to_string(list_slice(toks, i, i+1), ' ')
                            for i in range(1, greatest(len(toks)-0, 1))]
                      ELSE [] END AS grams
          FROM scored)
    """,
)
def q20_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text profile, the whole analysis surface in ONE
    narrow projection over one scan (no UDF, no shuffle, no explode):

    - token counts, punctuation density, stopword mass, content
      fingerprint (the quality-filter features);
    - language-ID (stopword-vote heuristic with fixed priority
      tie-break, functions/text.py) and the quality score fold — the
      double arithmetic is bit-exact vs the oracle;
    - winnowing-style rolling-hash sketch: hash every char-8-gram, keep
      the 4 smallest distinct hashes ('|'-joined so downstream
      comparators treat the sketch as one scalar cell) — the
      copy-detection primitive, entirely array expressions."""
    (docs,) = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", F.lower(F.trim(F.col("text"))).alias("__s")
    )
    grams = F.expr(
        "transform(sequence(1, greatest(length(__s) - 7, 1)),"
        " i -> md5(substring(__s, i, 8)))"
    )
    return base.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.regex_token_count("text").alias("n_words"),
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.stopword_ratio("text", "en").alias("stopword_ratio"),
        TX.fingerprint("text").alias("fp"),
        TX.lang_guess("text").alias("lang"),
        TX.quality_score("text", rounded=False).alias("quality"),
        F.concat_ws(
            "|", F.slice(F.array_sort(F.array_distinct(grams)), 1, 4)
        ).alias("fp_sketch"),
        # Gopher repetition rule input (r05): the share of the doc's
        # bigrams taken by its most frequent bigram — integer counts /
        # integer totals, engine-exact; the line-level signals stay
        # pinned by the pytest DuckDB twin (fixture docs are one line)
        TX.repetition_stats("text")["top_ngram_frac"].alias("top_2gram_frac"),
        # the composed keep/drop gate's named reasons, '|'-joined so the
        # hash compare treats them as one scalar; the oracle re-derives
        # the same rule family (dup_line_frac omitted there — one-line
        # fixture docs can never trip it, and Spark's verdict then
        # agrees by construction)
        F.concat_ws(
            "|", TX.quality_filter_verdict("text")["reasons"]
        ).alias("filter_reasons"),
    )


# ---------------------------------------------------------------------------
# 21. similarity search (north star)
# ---------------------------------------------------------------------------


@register(
    "q21_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_inner_product(e.e, q.qe)
               / (sqrt(list_inner_product(e.e, e.e)) * sqrt(list_inner_product(q.qe, q.qe))) AS cosine
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q21_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 5 query vectors: broadcast the
    query set, stream the embeddings once, windowed per-query top-k.
    Dot products are left-to-right double folds — bit-identical to the
    DuckDB oracle's list_inner_product over DOUBLE[]."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# 22. distinct-stats (catalog stats at scale)
# ---------------------------------------------------------------------------


@register(
    "q22_catalog_stats",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           TRUE AS approx_within_10pct
    FROM events GROUP BY event_type
    """,
)
def q22_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-cardinality stats per entity type (the counters the
    reference prints at ExportDatabaseWithTables.java:220-222, as real
    aggregates) — exact AND approximate in one pass (r05: absorbed
    q26_approx_distinct). approx_count_distinct (HLL++) rides the same
    aggregation; the oracle can't reproduce Spark's sketch, so the
    DETERMINISTIC contract checked is the error bound: the hash match
    fails unless the approximation lands within 10% of exact (rsd=0.05
    keeps HLL well inside that). At scale the approx variant replaces
    the exact count's full shuffle of distinct keys with fixed-size
    mergeable sketches."""
    (events,) = _t(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value", 6)).cast("double").alias("total_value"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("__n_approx"),
    )
    return agg.select(
        "event_type",
        "n_users",
        "n_events",
        "total_value",
        (
            F.abs(F.col("__n_approx") - F.col("n_users")) / F.col("n_users")
            <= 0.1
        ).alias("approx_within_10pct"),
    )


# ---------------------------------------------------------------------------
# 24. streaming-native windowed rollup (batch shape of streaming/rollup.py)
# (r05: the date_trunc batch twin — was q23 — folded; q24 computes the
# identical hourly rollup through the F.window operator, which is the
# stronger pin: one plan, batch AND stream.)
# ---------------------------------------------------------------------------


@register(
    "q24_windowed_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q24_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-native tumbling-window operator (F.window), batch
    mode — the IDENTICAL plan runs under readStream with a watermark
    (streaming/rollup.py; proven by tests/test_streaming.py). 1-hour
    tumbling windows make window.start == date_trunc('hour')."""
    (events,) = _t(spark, sf_dir, "events")
    return windowed_rollup(events)


# ---------------------------------------------------------------------------
# 25. audit latest-status rollup (the (id, run_id) audit key design)
# ---------------------------------------------------------------------------


@register(
    "q25_audit_latest_status",
    oracle="""
    SELECT event_type, COUNT(*) AS n_entities FROM (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    GROUP BY event_type
    """,
)
def q25_audit_latest_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'How many entities are currently in status X' — the question the
    reference's DDB audit tables answer via their (id, run_id) key
    (template.yaml:39-45, README.md:259-264 status table): latest row
    per entity, then count per status."""
    (events,) = _t(spark, sf_dir, "events")
    latest = latest_by(
        events.select("user_id", "ts", "event_type", "event_id"),
        keys=["user_id"],
        order_col="ts",
        tiebreak=["event_id"],
    )
    return latest.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_entities"))


# (q26_approx_distinct folded into q22_catalog_stats in r05.)


# ---------------------------------------------------------------------------
# 27. multimodal blob features (north star)
# ---------------------------------------------------------------------------


@register(
    "q27_blob_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
           md5(text) AS content_md5,
           substring(hex(encode(text)), 1, 8) AS magic_hex
    FROM documents
    """,
)
def q27_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing, verified end-to-end: documents gain a
    binary `blob` column (+ typed metadata), then an Arrow-batched
    mapInPandas featurizer extracts byte length, md5, and the 4-byte
    magic prefix — the exact harness an image/audio decoder plugs into
    (functions/multimodal.py; decode itself is stubbed, no codecs here)."""
    (docs,) = _t(spark, sf_dir, "documents")
    # split-guard: mapInPandas parallelism = input partitions; one local
    # split would serialize every Arrow batch through one worker
    with_blob = attach_blob(ensure_min_parallelism(docs, keys=["doc_id"]).select("doc_id", "text"))
    return blob_features(with_blob)


# ---------------------------------------------------------------------------
# 28. MERGE on catalog-shaped rows (map/struct compare via canonicalizer)
# ---------------------------------------------------------------------------


@register(
    "q28_merge_catalog_shapes",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_orderpriority AS pri, o_orderstatus AS clerk
               FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
         s AS (SELECT o_orderkey,
                      CASE WHEN o_orderpriority = '1-URGENT'
                           THEN '1-URGENT*' ELSE o_orderpriority END AS pri,
                      o_orderstatus AS clerk
               FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
    SELECT CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NULL THEN 'create'
                WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                     AND (s.pri IS DISTINCT FROM t.pri
                          OR s.clerk IS DISTINCT FROM t.clerk) THEN 'update'
                WHEN s.o_orderkey IS NOT NULL THEN 'skip'
                ELSE 'keep' END AS merge_action,
           COUNT(*) AS n
    FROM s FULL OUTER JOIN t ON s.o_orderkey = t.o_orderkey
    GROUP BY 1
    """,
)
def q28_merge_catalog_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE over rows shaped like real catalog entities — a
    map<string,string> `parameters` column and a struct nesting another
    map (the storage_descriptor shape) — exercising the canonical
    (key-sorted JSON) comparison `<=>` can't do on maps
    (operators/merge.py). The oracle compares the underlying scalars,
    which is equivalent because the maps are built from them; outcome
    counts must agree exactly."""
    (orders,) = _t(spark, sf_dir, "orders")

    def shaped(df, bump_urgent: bool):
        pri = (
            F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("1-URGENT*"))
            .otherwise(F.col("o_orderpriority"))
            if bump_urgent
            else F.col("o_orderpriority")
        )
        params = F.map_from_arrays(
            F.array(F.lit("priority"), F.lit("clerk")),
            F.array(pri, F.col("o_orderstatus")),
        )
        sd = F.struct(
            F.lit("s3://bucket/orders/").alias("location"),
            F.struct(
                F.lit("json-serde").alias("lib"), params.alias("parameters")
            ).alias("serde"),
        )
        return df.select(
            "o_orderkey", params.alias("parameters"), sd.alias("storage_descriptor")
        )

    target = shaped(
        orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")),
        bump_urgent=False,
    )
    source = shaped(
        orders.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")),
        bump_urgent=True,
    )
    out = merge_outcomes(source, target, keys=["o_orderkey"])
    return out.groupBy("merge_action").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# 29. embedding near-dup with sign-LSH recall (north star)
# ---------------------------------------------------------------------------


@register(
    "q29_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v))
                  * sqrt(list_inner_product(b.v, b.v))) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    t AS (SELECT * FROM p WHERE cosine >= 0.4),
    bands AS (
      SELECT vec_id, b,
        (CASE WHEN v[b*4+1] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN v[b*4+2] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN v[b*4+3] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN v[b*4+4] >= 0 THEN '1' ELSE '0' END) AS band_key
      FROM e CROSS JOIN UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS tt(b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_key = b.band_key AND a.vec_id < b.vec_id
    )
    SELECT t.id_a, t.id_b, t.cosine, (c.id_a IS NOT NULL) AS captured
    FROM t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
    """,
)
def q29_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, scale path pinned:
    exact all-pairs cosine >= 0.4 (the quadratic oracle baseline)
    annotated with whether hyperplane sign-LSH banding (8 bands x 4
    coordinate-sign bits) would have generated the pair as a candidate.
    The banded equi-join is the 100 TB lane; the hash check pins its
    recall exactly (48/59 pairs at sf0.01)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from .functions.similarity import cosine_pairs, sign_lsh_candidates

    exact = cosine_pairs(emb, threshold=0.4)
    cands = sign_lsh_candidates(emb, bands=8, bits=4).withColumn(
        "captured", F.lit(True)
    )
    return exact.join(cands, on=["id_a", "id_b"], how="left").select(
        "id_a",
        "id_b",
        "cosine",
        F.coalesce("captured", F.lit(False)).alias("captured"),
    )


# (q30_language_quality folded into q20_text_stats in r05.)


# ---------------------------------------------------------------------------
# 31-32. SimHash dedup (north star)
# ---------------------------------------------------------------------------

_SIMHASH_SQL = """
      SELECT doc_id,
             {bits_sum} AS simhash
      FROM (
        SELECT doc_id,
               {votes}
        FROM (
          SELECT doc_id,
                 ('0x' || substring(md5(tok), 1, 4))::BIGINT AS v
          FROM (SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\\s+')) AS tok
                FROM documents)
        ) GROUP BY doc_id
      )
""".format(
    votes=", ".join(
        f"SUM(CASE WHEN (v >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(16)
    ),
    bits_sum=" + ".join(
        f"(CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(16)
    ),
)


# (q31_simhash — the standalone signature projection — folded in r05:
# q32's oracle recomputes the identical signatures brute-force and the
# banded pairs must match them, so the signature values stay pinned;
# the simhash() operator is also unit-tested directly.)


@register(
    "q32_simhash_pairs",
    oracle=f"""
    WITH sig AS ({_SIMHASH_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q32_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole banding:
    4-bit chunks equi-join for candidates (LOSSLESS for distance <= 3 —
    recall 1.0 by pigeonhole, unlike probabilistic MinHash banding),
    exact bit_count(xor) re-filter. The oracle brute-forces all pairs;
    identical output proves the banded path exact."""
    (docs,) = _t(spark, sf_dir, "documents")
    # 8 consumers (4 bands x 2 join sides) read the signatures:
    # materialize once rather than re-aggregating per branch
    sigs = _persist(simhash(docs, "doc_id", "text", bits=16))
    return simhash_pairs(sigs, "doc_id", max_hamming=3, bits=16, bands=4).withColumn(
        "hamming", F.col("hamming").cast("int")
    )


# ---------------------------------------------------------------------------
# 33. IVF-bucketed ANN (north star)
# ---------------------------------------------------------------------------


def _kmeans_oracle_ctes(n_clusters: int, n_iters: int) -> str:
    """DuckDB CTE chain reproducing `kmeans_codebook` bit-for-bit (the
    oracle leg of the q33 codebook comparison): int8 quantization (q54's
    formula), first-k init, then per iteration an integer-L2 argmin
    assignment and a FLOOR(sum/count) centroid update. Every quantity is
    exact integer math (double division of exact longs is IEEE-identical
    across engines), so the SQL converges to the same codebook as the
    Spark lane for any n_iters. Assumes a CTE `e(vec_id, v DOUBLE[])`."""
    parts = [
        f"""zs AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
    zq AS (SELECT vec_id,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / scale) AS INT)) END AS qv
           FROM zs),
    cent0 AS (SELECT vec_id AS c, qv AS cv FROM zq WHERE vec_id < {n_clusters})"""
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(
            f"""zassign{i} AS (
      SELECT vec_id, qv, c AS cluster FROM (
        SELECT z.vec_id, z.qv, s.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id ORDER BY
                 list_inner_product(z.qv, z.qv) - 2 * list_inner_product(z.qv, s.cv)
                   + list_inner_product(s.cv, s.cv) ASC, s.c ASC) AS rn
        FROM zq z CROSS JOIN cent{p} s) WHERE rn = 1),
    znew{i} AS (
      SELECT cluster, list(CAST(FLOOR(s / n) AS INT) ORDER BY pos) AS cv FROM (
        SELECT cluster, pos, SUM(val) AS s, COUNT(*) AS n FROM (
          SELECT cluster, unnest(qv) AS val,
                 unnest(range(1, len(qv) + 1)) AS pos
          FROM zassign{i}) GROUP BY cluster, pos) GROUP BY cluster),
    cent{i} AS (SELECT p.c, COALESCE(n.cv, p.cv) AS cv
                FROM cent{p} p LEFT JOIN znew{i} n ON n.cluster = p.c)"""
        )

    def assign_cte(name: str, cent: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, c AS cluster FROM (
        SELECT z.vec_id, s.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id ORDER BY
                 list_inner_product(z.qv, z.qv) - 2 * list_inner_product(z.qv, s.cv)
                   + list_inner_product(s.cv, s.cv) ASC, s.c ASC) AS rn
        FROM zq z CROSS JOIN {cent} s) WHERE rn = 1)"""

    parts.append(assign_cte("zfirst", "cent0"))
    parts.append(assign_cte("zkm", f"cent{n_iters}"))
    return ",\n    ".join(parts)


@register(
    "q33_ivf_topk_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_kmeans_oracle_ctes(n_clusters=8, n_iters=2)},
    seeds AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, seed_id AS cluster FROM (
        SELECT e.vec_id, s.seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_inner_product(e.v, s.sv)
                   / (sqrt(list_inner_product(e.v, e.v))
                      * sqrt(list_inner_product(s.sv, s.sv))) DESC,
                 s.seed_id ASC) AS rn
        FROM e CROSS JOIN seeds s) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_inner_product(e.v, q.qv)
               / (sqrt(list_inner_product(e.v, e.v))
                  * sqrt(list_inner_product(q.qv, q.qv))) AS cosine
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM scored) WHERE rank <= 5
    )
    SELECT t.query_id, t.vec_id, t.cosine, t.rank,
           (qa.cluster = na.cluster) AS found_by_ivf,
           (fq.cluster = fn.cluster) AS found_by_first_l2,
           (kq.cluster = kn.cluster) AS found_by_kmeans_l2
    FROM topk t
    JOIN assign qa ON qa.vec_id = t.query_id
    JOIN assign na ON na.vec_id = t.vec_id
    JOIN zfirst fq ON fq.vec_id = t.query_id
    JOIN zfirst fn ON fn.vec_id = t.vec_id
    JOIN zkm kq ON kq.vec_id = t.query_id
    JOIN zkm kn ON kn.vec_id = t.vec_id
    """,
)
def q33_ivf_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN, recall pinned across THREE codebook/metric
    lanes: the exact top-5 (q21 baseline) is annotated with whether an
    nprobe=1 IVF search — which scans only the query's cluster bucket,
    i.e. partition-pruned at 100 TB — would have found it, under

    - `found_by_ivf`: cosine coarse quantizer over float embeddings,
      first-8-by-id centroids (functions/similarity.py ivf_assignments);
    - `found_by_first_l2`: integer-L2 quantizer over the int8 lane,
      same first-8 seeds (quantized_ivf_assignments seed_source=first);
    - `found_by_kmeans_l2`: integer-L2 quantizer with a Lloyd-trained
      codebook (kmeans_codebook, 2 iterations, VERDICT r04 #9).

    The hash check pins all three recall trades exactly — the k-means
    oracle leg re-runs the identical integer-exact iterations in SQL
    (`_kmeans_oracle_ctes`). On this corpus first-k seeds already sit
    near the true modes, so k-means' measured win is cluster BALANCE
    (max bucket 150 vs 195 of 500 at sf0.01) — the tail-latency/skew
    knob at 100 TB — at recall within one hit of the first-k codebook
    (tests/test_functions.py pins both properties)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from .functions.similarity import ivf_assignments, quantized_ivf_assignments

    assign = _persist(ivf_assignments(emb, n_seeds=8))  # two consumers below
    first_l2 = _persist(quantized_ivf_assignments(emb, 8, "first"))
    km_l2 = _persist(quantized_ivf_assignments(emb, 8, "kmeans", n_iters=2))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(emb, queries, k=5)

    def _q(a: DataFrame, col: str) -> DataFrame:
        return a.select(F.col("vec_id").alias("query_id"), F.col("cluster").alias(col))

    def _n(a: DataFrame, col: str) -> DataFrame:
        return a.select("vec_id", F.col("cluster").alias(col))

    return (
        topk.join(_q(assign, "__qc"), on="query_id")
        .join(_n(assign, "__nc"), on="vec_id")
        .join(_q(first_l2, "__fq"), on="query_id")
        .join(_n(first_l2, "__fn"), on="vec_id")
        .join(_q(km_l2, "__kq"), on="query_id")
        .join(_n(km_l2, "__kn"), on="vec_id")
        .select(
            "query_id",
            "vec_id",
            "cosine",
            "rank",
            (F.col("__qc") == F.col("__nc")).alias("found_by_ivf"),
            (F.col("__fq") == F.col("__fn")).alias("found_by_first_l2"),
            (F.col("__kq") == F.col("__kn")).alias("found_by_kmeans_l2"),
        )
    )


# ---------------------------------------------------------------------------
# 34. full replication round-trip (pipeline e2e; rows-only check)
# ---------------------------------------------------------------------------


@register(
    "q34_replication_roundtrip",
    # the plan->export->import pipeline itself is not SQL-expressible, but
    # its outcome histogram over the deterministic 24-db fixture IS: the
    # prefix scope keeps 12 of 24 dbs (raw_data_/processed_data_ in the
    # 4-prefix cycle), and each of their 5 tables is created (none
    # updated) on an empty target. A VALUES-literal oracle pins
    # rows+schema+hash (VERDICT r02 #3); value-level correctness of the
    # pipeline internals stays pinned by tests/test_replication_e2e.py +
    # the property suite.
    oracle="""
    SELECT TRUE AS table_created, FALSE AS table_updated,
           CAST(60 AS BIGINT) AS n
    """,
)
def q34_replication_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's actual product, timed as one unit: plan (prefix
    scoping) -> export (threshold routing + ndjson side-channel) ->
    import (dispatch, db create, table MERGE with map-canonical compare,
    partition full-refresh, audit) over a deterministic 24-db catalog.
    Returns the import-audit outcome histogram (deterministic).

    Round-4 rework (VERDICT r03 #1): the import/export towers now CUT
    LINEAGE at their parse/route boundaries (localCheckpoint+persist,
    see plans/importer.parse_events + plans/export) — round 3's plan
    re-embedded the wide nested from_json subtree in every one of ~20
    branches (415 exchanges / 212 broadcast joins, ~4s of eager
    per-transformation analysis alone). Measured split at sf-independent
    n_dbs=24 on local[32]: steady-state ~9s total = export+ndjson ~3.0
    + import plan build ~2.8 + compile 0.3 + execute ~2.2; a cold first
    run adds ~8s of JVM/codegen warm-up that the median-of-n bench
    amortizes."""
    import tempfile

    from .model import empty_catalog, synthetic_catalog
    from .plans.export import export_catalog
    from .plans.importer import import_events
    from .plans.planner import plan_replication

    side = tempfile.mkdtemp(prefix="q34_side_")
    # Spark-native generator: the fixture itself is a distributed plan,
    # so this measures the pipeline, not driver-side row materialization
    src_dbs, src_tables, src_parts = synthetic_catalog(spark, n_dbs=24)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="bench"
    )
    mats: list[DataFrame] = []
    writers: list = []
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="bench",
        side_channel_path=side, materialized_out=mats,
        side_channel_writer_out=writers,
    )
    # overlap the side-channel ndjson write (an independent Spark job)
    # with the import tower's parse materialization — the build phase's
    # two costliest serial jobs; parse_events joins the task via
    # side_channel_ready exactly where the files must exist (join
    # re-raises a writer failure instead of letting parse read a
    # missing/partial directory)
    th = run_overlapped(writers[0])
    # no _persist here: import_events cuts (checkpoints) the parsed
    # event set itself, and the message build below the cut is cheap —
    # export_catalog already pinned the routed table set
    # the event set is metadata-sized (bounded by the export fan-out,
    # never table data): coalesce to a few partitions so the ~20
    # downstream branch jobs schedule a handful of tasks each instead
    # of one per upstream shard
    events = msgs.unionByName(tbl_msgs).coalesce(4)
    d, t, p = empty_catalog(spark)
    res = import_events(
        spark, events, d, t, p, side_channel_path=side,
        side_channel_ready=th.join,
        # the enriched cache fill (the parse tower's last serial job)
        # overlaps the apply towers' driver-side plan building
        enriched_fill="async",
    )
    # pipeline-internal persists (routed set + parse cuts) evict at the
    # next registry call like every _persist frame (ADVICE r04)
    _PERSISTED.extend(mats)
    _PERSISTED.extend(res.materialized)
    return (
        res.table_import_audit.groupBy("table_created", "table_updated")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("table_created", "table_updated")
    )


# ---------------------------------------------------------------------------
# 35. gap-based sessionization (stateful windows, batch shape)
# ---------------------------------------------------------------------------


@register(
    "q35_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def q35_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag + conditional running sum assigns session numbers, then one
    aggregation per (user, session). This is the BATCH shape of the
    custom stateful streaming operator (applyInPandasWithState /
    session_window); per-user windows shuffle once on user_id and AQE
    splits a hot user. Ties on ts break by event_id for determinism."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sessions = marked.withColumn("session_no", F.sum("is_start").over(run))
    return sessions.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
    )


# (q36_rolling_fingerprint folded into q20_text_stats in r05.)


# ---------------------------------------------------------------------------
# 37. df-pruned Jaccard (the hot-shingle scale guard, verified)
# ---------------------------------------------------------------------------


@register(
    "q37_jaccard_df_pruned",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    pruned AS (SELECT sh.doc_id, sh.shingle FROM sh
               JOIN dfreq USING (shingle) WHERE dfreq.df <= 20),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM pruned GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM pruned a JOIN pruned b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           inter / (x.sz + y.sz - inter) AS jaccard
    FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
    WHERE inter / (x.sz + y.sz - inter) >= 0.6
    """,
)
def q37_jaccard_df_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard with document-frequency pruning (df <= 20): drops
    stopword-like hot shingles BEFORE the inverted-index self-join,
    bounding every join bucket — the guard that keeps q17's
    Σ(docs-per-shingle)² from exploding at 100 TB. Jaccard is over the
    pruned sets (standard practice; hot shingles carry no signal), and
    the oracle applies the identical pruning."""
    (docs,) = _t(spark, sf_dir, "documents")
    from .functions.dedup import _env_int, prune_hot_shingles

    sh = word_shingles(
        ensure_min_parallelism(docs, fraction=0.25, keys=["doc_id"]), "doc_id", "text", n=5
    )
    # r12 NOTE (measured, guide §1.2/§5): persisting the pruned
    # relation here is a LOSS at bench scale (interleaved A/B at sf0.1:
    # 1.42s unpersisted vs 3.40s persisted median-of-6) even though the
    # plan recomputes the explode->df-count tower per branch — every
    # join in the unpersisted plan is a broadcast (zero shuffle of the
    # shingle relation), and the towers pipeline inside one job, while
    # the persist pays a dedicated fill job + cache scans.
    # r13 (VERDICT r12 #3): that trade flips once the towers stop being
    # broadcast-pipelined — at cluster scale each of the ~6 inlined
    # towers would re-shuffle the exploded relation. The revisit is now
    # CONCRETE: materialize the shingle relation when the document
    # input's estimated bytes clear SPARK_GRAFT_SHINGLE_PERSIST_BYTES
    # (default 8 MiB of docs ~ 64 MiB exploded, the session's broadcast
    # threshold), keep the measured-faster unpersisted form below it.
    est = int(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est > _env_int("SPARK_GRAFT_SHINGLE_PERSIST_BYTES", 8 << 20):
        sh = _persist(sh)
    pruned = prune_hot_shingles(sh, max_df=20)
    return jaccard_pairs(pruned, "doc_id", threshold=0.6)


# ---------------------------------------------------------------------------
# 38. corpus vocabulary top-k (token counting at corpus level)
# ---------------------------------------------------------------------------


@register(
    "q38_vocab_topk",
    oracle="""
    SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS docf
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY tf DESC, tok ASC LIMIT 50
    """,
)
def q38_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term + document frequency, top-50 by tf with a
    total tie order — the vocab-building pass of a tokenizer pipeline.
    explode -> one hash agg (map-side partial) -> TakeOrdered, no full
    sort."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("docf"),
        )
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# 39. exact quantiles (sort-based aggregation)
# ---------------------------------------------------------------------------


@register(
    "q39_value_quantiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           MIN(value) AS vmin, MAX(value) AS vmax,
           TRUE AS approx_within_2pct
    FROM events GROUP BY event_type
    """,
)
def q39_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles per group (verified bit-exact
    vs DuckDB's quantile_cont) PLUS the 100 TB scale path in the same
    pass (r05: absorbed q45_approx_quantiles): approx_percentile
    (t-digest sketch, mergeable map-side, bounded memory — survives
    cardinalities where the exact sort-based percentile would spill)
    rides the same aggregation under a bounded-error contract — the
    hash match fails unless the sketch's p50 lands within 2% of
    exact."""
    (events,) = _t(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.approx_percentile("value", 0.50, 10000).alias("__p50_approx"),
    )
    return agg.select(
        "event_type",
        "p25",
        "p50",
        "p75",
        "vmin",
        "vmax",
        (
            F.abs(F.col("__p50_approx") - F.col("p50"))
            <= F.abs(F.col("p50")) * 0.02
        ).alias("approx_within_2pct"),
    )


# ---------------------------------------------------------------------------
# 40. ROLLUP grouping sets (OLAP subtotals)
# ---------------------------------------------------------------------------


@register(
    "q40_rollup_totals",
    oracle="""
    SELECT event_type, CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, day)
    """,
)
def q40_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per (event_type, day), per event_type, and
    grand total in ONE aggregation pass (Expand + single shuffle) — the
    OLAP subtotal operator; NULL marks the rolled-up level identically
    in both engines."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "value",
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# 41. pivot (wide-format conditional aggregation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q41_pivot_daily_events",
    oracle="""
    SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
           {cols}
    FROM events GROUP BY day
    """.format(
        cols=", ".join(
            f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES
        )
    ),
)
def q41_pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: day x event_type counts in wide format. Explicit pivot
    values keep it a single-pass conditional aggregation (no extra
    distinct-values job, which at 100 TB would be a full scan before
    the real one)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# 42. as-of join (time-series state-at-event-time)
# ---------------------------------------------------------------------------


@register(
    "q42_asof_last_purchase",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1
    )
    SELECT l.user_id, l.ts, l.event_id,
           r.value AS last_purchase_value
    FROM events l
    ASOF LEFT JOIN purchases r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q42_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — 'state at event time': every event gains the value
    of that user's most recent purchase at-or-before it. Implemented as
    the union-sort-carry plan (operators/asof.py): ONE shuffle + one
    window scan instead of a range join's nested loop; DuckDB's native
    ASOF JOIN is the oracle. Right side deduped per (user, ts) so the
    as-of row is unique."""
    from .operators.asof import asof_join

    (events,) = _t(spark, sf_dir, "events")
    purchases = latest_by(
        events.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        ),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).select("user_id", "ts", F.col("value").alias("last_purchase_value"))
    return asof_join(
        events.select("user_id", "ts", "event_id"),
        purchases,
        by=["user_id"],
        ts_col="ts",
        value_cols=["last_purchase_value"],
    )


# ---------------------------------------------------------------------------
# 43. range join (interval containment, bucketed)
# ---------------------------------------------------------------------------


@register(
    "q43_range_join_windows",
    oracle="""
    WITH intervals AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts, event_id AS interval_id
      FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1
    )
    SELECT i.user_id, i.interval_id,
           COUNT(l.event_id) AS n_events,
           CAST(SUM(CAST(l.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM intervals i
    JOIN events l
      ON l.user_id = i.user_id
     AND l.ts >= i.start_ts AND l.ts <= i.end_ts
    GROUP BY i.user_id, i.interval_id
    """,
)
def q43_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: activity inside each user's 2-hour post-purchase
    window. The naive `BETWEEN` theta join is a nested loop; the engine
    buckets both sides to 2-hour grains and equi-joins on (user, bucket)
    with the exact filter after (operators/range_join.py) — candidates-
    then-filter, the time-axis analogue of LSH banding. The oracle runs
    the plain inequality join; identical output proves the bucketing
    lossless."""
    from .operators.range_join import bucketed_range_join

    (events,) = _t(spark, sf_dir, "events")
    intervals = latest_by(
        events.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        ),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("event_id").alias("interval_id"),
    )
    joined = bucketed_range_join(
        events.select("user_id", "ts", "event_id", "value"),
        intervals,
        by=["user_id"],
        width_seconds=7200,
    )
    return joined.groupBy("user_id", "interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
    )


# (q44_promo_revenue — broadcast-dim join + conditional decimal agg —
# folded in r05: the join shape stays pinned by q14/q15 and the
# conditional decimal aggregation by q47/q49.)


# (q45_approx_quantiles folded into q39_value_quantiles in r05.)


# ---------------------------------------------------------------------------
# 46. failure-path audit: exported vs failed per lane
# ---------------------------------------------------------------------------


@register(
    "q46_failure_audit",
    oracle="""
    SELECT lane, CAST(n AS BIGINT) AS n, CAST(n_failed AS BIGINT) AS n_failed
    FROM (VALUES
      ('dlq', 4, 4),
      ('export', 21, 1),
      ('import_db', 5, 1),
      ('import_table', 21, 2),
      ('plan', 5, 1)
    ) AS t(lane, n, n_failed)
    """,
)
def q46_failure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The failure-path audit contract, end to end: every entity that
    cannot be published or applied still appears in its audit plane with
    the failure flag + reason (the reference records failed publishes
    with isExported=false, SNSUtil.java:115-123, and failed imports via
    TableReplicationStatus error flags, DDBUtil.java:150-157) — and
    per-partition failures inside a batch dead-letter row-by-row while
    their siblings apply (GlueUtil.java:425-449). The fixture is a
    deterministic 4-db catalog with one nameless database, one nameless
    table, one unaddressable partition, and three corrupt events; the
    oracle is the exact exported-vs-failed census per lane."""
    import tempfile

    from .model import DATABASE, PARTITION, empty_catalog, sample_catalog
    from .plans.export import export_catalog
    from .plans.importer import import_events
    from .plans.planner import plan_replication

    src_dbs, src_tables, src_parts = sample_catalog(spark)
    bad_db = spark.createDataFrame(
        [("123412341234", None, "nameless", None, None, None)], DATABASE
    )
    bad_tbl = src_tables.where(
        (F.col("database_name") == "raw_data_db0") & (F.col("name") == "table_0")
    ).withColumn("name", F.lit(None).cast("string"))
    bad_part = spark.createDataFrame(
        [
            (
                "123412341234",
                "raw_data_db0",
                "table_1",
                ["2024", None, "99"],
                None,
                None,
                None,
                None,
            )
        ],
        PARTITION,
    )

    # empty prefix = replicate-everything bypass so the nameless db
    # reaches the publish step (GDCReplicationPlanner.java:70-81)
    msgs, plan_audit = plan_replication(
        src_dbs.unionByName(bad_db), prefix_string="", batch_id="b1"
    )
    side = tempfile.mkdtemp(prefix="q46_side_")
    mats: list[DataFrame] = []
    tbl_msgs, export_audit = export_catalog(
        spark,
        msgs,
        src_tables.unionByName(bad_tbl),
        src_parts.unionByName(bad_part),
        threshold=10,
        batch_id="b1",
        side_channel_path=side,
        materialized_out=mats,
    )
    corrupt = spark.createDataFrame(
        [
            ("e1", "database", "111", "b1", "{not json", None, None),
            ("e2", "garbageType", "111", "b1", "{}", None, None),
            ("e3", "table", "111", "b1", '{"table": {"noname": 1}}', None, None),
        ],
        "event_id string, message_type string, source_catalog_id string, "
        "export_batch_id string, payload string, bucket_name string, "
        "region_name string",
    )
    events = msgs.unionByName(tbl_msgs).unionByName(corrupt)
    d, t, p = empty_catalog(spark)
    res = import_events(spark, events, d, t, p, side_channel_path=side)
    _PERSISTED.extend(mats)
    _PERSISTED.extend(res.materialized)

    def lane(df: DataFrame, name: str, failed) -> DataFrame:
        return df.select(F.lit(name).alias("lane"), failed.alias("failed"))

    rows = (
        lane(plan_audit, "plan", ~F.col("is_exported"))
        .unionByName(lane(export_audit, "export", ~F.col("is_exported")))
        .unionByName(lane(res.db_import_audit, "import_db", F.col("error").isNotNull()))
        .unionByName(
            lane(res.table_import_audit, "import_table", F.col("error").isNotNull())
        )
        .unionByName(lane(res.dlq, "dlq", F.lit(True)))
    )
    return rows.groupBy("lane").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("failed"), 1).otherwise(0)).alias("n_failed"),
    )


# ---------------------------------------------------------------------------
# 47. deterministic stratified sampling (corpus construction)
# ---------------------------------------------------------------------------


@register(
    "q47_stratified_sample",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             ('0x' || substring(md5('smp:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket,
             CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 2
                             WHEN 'purchase' THEN 50 ELSE 5 END AS rate
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN bucket < rate
                         THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
             AS sampled_value
    FROM s GROUP BY event_type
    """,
)
def q47_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified corpus sampling: per-stratum Bernoulli
    rates decided by a salted md5 hash of the row id — membership is a
    pure function of the row, stable across partitioning, retries, and
    engines (`df.sample`'s per-partition RNG is none of those). The
    oracle recomputes the identical buckets in DuckDB; counts and the
    sampled-value checksum must match exactly."""
    from .functions.sampling import hash_bucket

    (events,) = _t(spark, sf_dir, "events")
    # single pass: the census (kept vs total per stratum) is conditional
    # aggregation over the same deterministic bucket `stratified_sample`
    # filters on — one scan, no self-join. stratified_sample itself (the
    # materializing filter form) is unit-tested partition-invariant.
    rate = (
        F.when(F.col("event_type") == "click", 10)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 50)
        .otherwise(5)
    )
    keep = hash_bucket("event_id") < rate
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(keep.cast("int")).alias("n_sampled"),
        F.sum(F.when(keep, _dec("value", 6))).cast("double").alias("sampled_value"),
    )


# ---------------------------------------------------------------------------
# 48. greedy sequence packing (concat-and-chunk into token windows)
# ---------------------------------------------------------------------------


@register(
    "q48_sequence_packing",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents),
    p AS (
      SELECT source, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2048) AS BIGINT) AS bin
      FROM d)
    SELECT source, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM p GROUP BY source, bin
    """,
)
def q48_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing, the shape LLM pipelines use to
    fill fixed context windows: per shard (source), documents in doc_id
    order are laid head-to-tail and a document's bin is
    floor(tokens_before_it / 2048). Shard-parallel — the cumsum is a
    window over the shard key, never a global order — so the plan is
    one shuffle on source + one partial agg."""
    from .functions.sampling import pack_sequences
    from .functions.text import token_count

    (docs,) = _t(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, "source", "doc_id", token_count("text"), window_tokens=2048
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# 49. pattern redaction (PII-scrubbing shape) with audit counts
# ---------------------------------------------------------------------------


@register(
    "q49_redaction",
    oracle=r"""
    WITH r AS (
      SELECT source,
             len(regexp_extract_all(text, '\bcustomer\b')) AS n_hits,
             length(regexp_replace(text, '\bcustomer\b', '[MASKED]', 'g'))
               AS len_after
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_hits,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST(SUM(len_after) AS BIGINT) AS total_len_after
    FROM r GROUP BY source
    """,
)
def q49_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Pattern redaction (the PII-scrubbing shape: emails, phone
    numbers, sensitive vocabulary) with the per-batch audit counters a
    scrubbing pipeline reports. Pure regexp column expressions in
    whole-stage codegen; the pattern stays in the Java-regex/RE2 common
    subset so DuckDB computes the identical masks. Verified here against
    the masked-output length checksum, not just the hit counts."""
    from .functions.text import redact, redaction_count

    (docs,) = _t(spark, sf_dir, "documents")
    pat = r"\bcustomer\b"
    return (
        docs.select(
            "source",
            redaction_count("text", pat).alias("n_hits"),
            F.length(redact("text", pat, "[MASKED]")).alias("len_after"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).alias(
                "docs_with_hits"
            ),
            F.sum("n_hits").alias("total_hits"),
            F.sum("len_after").alias("total_len_after"),
        )
    )


# ---------------------------------------------------------------------------
# 50. distinctive terms per document (IDF shape, integer-exact)
# ---------------------------------------------------------------------------


@register(
    "q50_distinctive_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
      FROM documents),
    dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
    ranked AS (
      SELECT t.doc_id, t.term, d.df,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY d.df, t.term) AS rank
      FROM toks t JOIN dfreq d USING (term))
    SELECT doc_id, term, df, rank FROM ranked WHERE rank <= 3
    """,
)
def q50_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rarest-terms-per-document (the IDF idea with integer-only
    outputs): distinct tokens ranked by corpus document frequency, top 3
    per doc. The df aggregation shuffles on the VOCABULARY key (bounded
    by vocab size, not corpus size); the join back is vocab-vs-corpus;
    the top-k is a per-document window. No transcendentals anywhere, so
    the hash check is exact."""
    from .functions.text import distinctive_terms

    (docs,) = _t(spark, sf_dir, "documents")
    return distinctive_terms(
        ensure_min_parallelism(docs, fraction=0.25, keys=["doc_id"]), "doc_id", "text", k=3
    )


# ---------------------------------------------------------------------------
# 51. corpus mixing to an equal token budget
# ---------------------------------------------------------------------------


@register(
    "q51_corpus_mixing",
    oracle=r"""
    WITH d AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\s+')) AS tc
      FROM documents),
    tot AS (SELECT source, SUM(tc) AS toks FROM d GROUP BY source),
    budget AS (SELECT MIN(toks) AS b FROM tot),
    rates AS (
      SELECT source, GREATEST(1, LEAST(100, (100 * b) // toks)) AS rate
      FROM tot CROSS JOIN budget),
    kept AS (
      SELECT d.source, d.tc, r.rate,
             ('0x' || substring(md5('smp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM d JOIN rates r USING (source))
    SELECT source,
           CAST(MAX(rate) AS BIGINT) AS rate_pct,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(tc) AS BIGINT) AS tokens_kept
    FROM kept WHERE bucket < rate GROUP BY source
    """,
)
def q51_corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to an equal token budget: per-source sampling rates
    are derived FROM THE DATA (integer DIV against the smallest source's
    token count — never float division, so the rates themselves are
    engine-reproducible), then rows are kept by the deterministic hash
    bucket. The census per source (rate, docs kept, tokens kept) is the
    mixing report a corpus-construction pipeline logs."""
    from .functions.sampling import mix_corpora
    from .functions.text import token_count

    (docs,) = _t(spark, sf_dir, "documents")
    kept = mix_corpora(docs, "source", "doc_id", token_count("text"))
    return kept.groupBy("source").agg(
        F.max("rate_pct").cast("long").alias("rate_pct"),
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


# ---------------------------------------------------------------------------
# 52. document chunking into overlapping token windows
# ---------------------------------------------------------------------------


@register(
    "q52_document_chunking",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    n AS (
      SELECT doc_id, toks, len(toks) AS sz,
             GREATEST((len(toks) - 16 + 47) // 48, 1) AS nc
      FROM d),
    c AS (SELECT doc_id, toks, sz, unnest(range(0, nc)) AS chunk_idx FROM n)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(toks[chunk_idx*48+1 : LEAST(chunk_idx*48+64, sz)]) AS INT)
             AS chunk_len,
           md5(array_to_string(
             toks[chunk_idx*48+1 : LEAST(chunk_idx*48+64, sz)], ' '))
             AS chunk_md5
    FROM c
    """,
)
def q52_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16-token
    overlap — the passage shape retrieval/pretraining pipelines emit):
    tokenize once, posexplode a chunk-index sequence, slice per chunk.
    Shuffle-free; chunk boundaries are exact-integer arithmetic and the
    chunk md5 fingerprints are engine-portable, so every chunk of every
    document hash-checks."""
    from .functions.text import chunk_documents

    (docs,) = _t(spark, sf_dir, "documents")
    return chunk_documents(
        ensure_min_parallelism(docs, fraction=0.25, keys=["doc_id"]),
        "doc_id",
        "text",
        chunk_tokens=64,
        overlap=16,
    )


# ---------------------------------------------------------------------------
# 53. duplicate-cluster resolution (connected components over pairs)
# ---------------------------------------------------------------------------


# the connected-components oracle (recursive CTE over the exact Jaccard
# pairs). q53 runs BOTH engine algorithms — min-label propagation and
# large-star/small-star — and emits each one's label, so the oracle
# repeats its label column: the hash match enforces that the two
# algorithms agree with the oracle AND with each other, label-for-label
_CC_ORACLE = f"""
    WITH RECURSIVE
    sh AS ({_SHINGLE_SQL}),{_JACCARD_CTES},
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
      WHERE inter / (x.sz + y.sz - inter) >= 0.6
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS lab FROM documents
      UNION
      SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    lab AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    csz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
    SELECT l.id AS doc_id, l.cluster_id, c.cluster_size,
           l.id = l.cluster_id AS is_keeper,
           l.cluster_id AS star_cluster_id
    FROM lab l JOIN csz c USING (cluster_id)
    """


@register("q53_dedup_clusters", oracle=_CC_ORACLE)
def q53_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution — the step after pair generation
    that real dedup pipelines need (keep ONE document per duplicate
    cluster, not per pair): connected components over the exact Jaccard
    >= 0.6 pairs, computed by BOTH engine algorithms in one query (r05:
    absorbed q57_dedup_clusters_star):

    - iterative min-label propagation (each round one equi-join + one
      min-agg; optimal when component diameters are small);
    - alternating large-star/small-star (Kiveris et al.) — the lane
      that stays O(log n) rounds on adversarial chains.

    The output carries each algorithm's label (cluster_id /
    star_cluster_id); the oracle computes the components once with a
    recursive CTE and repeats its label column, so the hash check
    enforces three-way agreement: min-label == oracle == star,
    label-for-label, plus sizes and keeper flags. Docs in no pair are
    singleton keepers."""
    from .functions.dedup import connected_components, connected_components_star

    (docs,) = _t(spark, sf_dir, "documents")
    # r12 (measured, guide §1.2/§5): the shingle relation is NO LONGER
    # persisted — its only consumer is the pair-set fill below, whose
    # plan keeps every join a broadcast, so the towers pipeline inside
    # the one fill job; the dedicated cache-fill job cost more than the
    # recompute it saved (interleaved A/B at sf0.1: 4.71s -> 4.37s
    # median-of-5 for the whole query)
    sh = word_shingles(
        ensure_min_parallelism(docs, fraction=0.25, keys=["doc_id"]), "doc_id", "text", n=5
    )
    # both algorithms seed from the SAME pair set — materialize it once
    # (the jaccard self-join is the expensive subplan here)
    pairs = _persist(
        jaccard_pairs(sh, "doc_id", threshold=0.6).select("id_a", "id_b")
    )
    # the two algorithms depend only on the MATERIALIZED pair set and
    # are each stage-latency-bound iterative towers — run them on
    # concurrent threads so their per-round jobs interleave (r05; the
    # scheduler handles concurrent job submission, and neither touches
    # the other's state)
    ids = docs.select("doc_id")
    star_task = run_overlapped(
        lambda: connected_components_star(pairs, ids, "doc_id")
    )
    labels = connected_components(pairs, ids, "doc_id")
    star = star_task.join()
    _PERSISTED.extend([labels, star])  # scoped eviction at the next call
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, on="label")
        .join(
            star.select("id", F.col("label").alias("star_cluster_id")),
            on="id",
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("label")).alias("is_keeper"),
            "star_cluster_id",
        )
    )


# ---------------------------------------------------------------------------
# 54. schema-evolution read path (r10 rotation: int8 quantization left
# the registry — its scalar lane stays pinned by q59/q60's consuming
# slots plus the retired-slot DuckDB twin in tests/test_functions.py —
# and the "years of parquet" union-by-name read took the slot)
# ---------------------------------------------------------------------------


@register(
    "q54_schema_evolution_read",
    # reconstruct the three producer generations with the same casts in
    # DuckDB and rebuild the union with its NATIVE union-by-name; the
    # Spark side reads real parquet files with three different footers
    oracle="""
    WITH g1 AS (
      SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey, o_custkey,
             CAST(o_totalprice AS FLOAT) AS o_totalprice,
             1 AS gen
      FROM orders WHERE o_orderkey % 3 = 0),
    g2 AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS FLOAT) AS o_totalprice,
             o_orderpriority, 2 AS gen
      FROM orders WHERE o_orderkey % 3 = 1),
    g3 AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             o_orderpriority, o_orderstatus, 3 AS gen
      FROM orders WHERE o_orderkey % 3 = 2)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(gen AS INT) AS gen,
           o_orderpriority, o_orderstatus
    FROM (SELECT * FROM g1
          UNION ALL BY NAME SELECT * FROM g2
          UNION ALL BY NAME SELECT * FROM g3)
    """,
)
def q54_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "years of parquet" read path (SURVEY §2B evolve row): a
    store whose files were written by THREE producer generations —
    gen1 (o_orderkey int32, o_totalprice float32), gen2 (o_orderkey
    widened to int64, o_orderpriority added), gen3 (o_totalprice
    widened to float64, o_orderstatus added) — is read back as ONE
    relation via `union_evolved` (functions/evolve.py): least-upper-
    bound schema across the footers, typed-NULL padding for columns a
    generation predates, casts only along the lossless widening
    lattice. The slot RAISES if the LUB is not the expected widened
    schema, so it pins the lattice itself, not just the row values;
    every row of every generation is value-checked against DuckDB's
    native UNION ALL BY NAME over the same reconstruction. All
    per-row projections — zero shuffles, whole-stage codegen.
    Reference tie-in: the reference evolves metadata schemas by
    overwrite (GlueUtil.java:175-192) and never touches the data
    plane; at 100 TB the data plane itself drifts, which is exactly
    what this slot exercises."""
    from .functions.evolve import union_evolved

    (orders,) = _t(spark, sf_dir, "orders")

    def build(path: str) -> None:
        k = F.col("o_orderkey")
        (
            orders.where(k % 3 == 0)
            .select(
                k.cast("int").alias("o_orderkey"),
                "o_custkey",
                F.col("o_totalprice").cast("float").alias("o_totalprice"),
            )
            .write.parquet(f"{path}/gen1")
        )
        (
            orders.where(k % 3 == 1)
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("o_totalprice").cast("float").alias("o_totalprice"),
                "o_orderpriority",
            )
            .write.parquet(f"{path}/gen2")
        )
        (
            orders.where(k % 3 == 2)
            .select(
                "o_orderkey", "o_custkey", "o_totalprice",
                "o_orderpriority", "o_orderstatus",
            )
            .write.parquet(f"{path}/gen3")
        )

    # the mixed-schema store is a pure function of sf_dir: built once
    # per process (fixture), while the measured operator is the
    # evolved READ over its three footers
    store = _cached_scratch_store("q54_evostore", sf_dir, build)
    gens = [
        spark.read.parquet(f"{store}/gen{i}").withColumn(
            "gen", F.lit(i).cast("int")
        )
        for i in (1, 2, 3)
    ]
    out = union_evolved(gens)
    got = out.schema.simpleString()
    want = (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double,"
        "gen:int,o_orderpriority:string,o_orderstatus:string>"
    )
    if got != want:
        raise AssertionError(
            f"schema-evolution LUB drifted: {got} (expected {want})"
        )
    return out


def q54_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    storage-compression lane in front of IVF/LSH search (4x fewer bytes
    per vector). Map-only array expressions, no shuffle; floor (never
    round — rounding modes differ across engines) keeps every quantized
    value engine-exact, verified here via per-vector checksums (sum /
    min / max of the int codes) plus the scale itself."""
    from .functions.similarity import quantize_embeddings

    (emb,) = _t(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb)
    return qz.select(
        "vec_id",
        "n_dims",
        "scale",
        F.aggregate(
            "quantized", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.array_min("quantized").alias("q_min"),
        F.array_max("quantized").alias("q_max"),
    )


# ---------------------------------------------------------------------------
# 55. multi-target import fan-out (one export -> N target catalogs)
# ---------------------------------------------------------------------------


@register(
    "q55_multi_target_fanout",
    # one deterministic 4-db export applied to two targets in one run:
    # target A is empty (every in-scope table created: 2 dbs x 5 = 10);
    # target B is already converged except one table whose description
    # was changed (1 update, 19 skips). The cross-target audit census is
    # fully determined by the fixture, so a VALUES-literal oracle pins
    # rows+schema+hash; value-level convergence of both targets is
    # pinned by tests/test_replication_e2e.py::test_multi_target_fanout.
    oracle="""
    SELECT * FROM (VALUES
      ('111111111111', TRUE,  FALSE, CAST(10 AS BIGINT)),
      ('222222222222', FALSE, FALSE, CAST(9 AS BIGINT)),
      ('222222222222', FALSE, TRUE,  CAST(1 AS BIGINT))
    ) t(target_glue_catalog_id, table_created, table_updated, n)
    """,
)
def q55_multi_target_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core deployment shape, Spark-native: ONE event
    set fans out to N target catalogs in ONE run (cross-account SNS
    subscription, reference README.md:173-188) — the event set is
    parsed/validated once (shared lineage cut), each target gets its
    own audit plane keyed by target_glue_catalog_id, and the combined
    census distinguishes per-target outcomes (fresh target: all
    creates; stale target: exactly the drifted table updates)."""
    import tempfile

    from .model import empty_catalog, synthetic_catalog
    from .plans.export import export_catalog
    from .plans.importer import fanout_table_audit, import_events, import_events_fanout
    from .plans.planner import plan_replication

    side = tempfile.mkdtemp(prefix="q55_side_")
    src_dbs, src_tables, src_parts = synthetic_catalog(spark, n_dbs=4)
    msgs, _ = plan_replication(
        src_dbs, prefix_string="raw_data_,processed_data_", batch_id="bench"
    )
    mats: list[DataFrame] = []
    writers: list = []
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="bench",
        side_channel_path=side, materialized_out=mats,
        side_channel_writer_out=writers,
    )
    # overlap the ndjson write with the first import's parse cut (the
    # q34 pattern); the barrier joins — re-raising writer failures —
    # before the side channel is read
    th = run_overlapped(writers[0])
    events = msgs.unionByName(tbl_msgs).coalesce(4)
    # ONE parse serves the bootstrap import AND the fan-out below (r05:
    # the previous form ran the parse towers twice over the same events)
    from .plans.importer import parse_events

    parsed = parse_events(
        spark, events, side, side_channel_ready=th.join, enriched_fill="async"
    )
    # target B = converged state (one prior import) with one table's
    # description drifted -> the re-import must flag exactly that table
    base = import_events(
        spark, events, *empty_catalog(spark), side_channel_path=side,
        parsed=parsed,
    )
    drift = F.when(
        (F.col("database_name") == "raw_data_db0") & (F.col("name") == "table_0"),
        F.lit("stale description"),
    ).otherwise(F.col("description"))
    # target B's planes stay LAZY on purpose: they hang off the first
    # import's materialized parse/enrich cuts already, and the fan-out
    # executes only the slices it needs — eager checkpoints of the
    # three planes measured strictly slower (9.2s lazy vs 12.4s all-
    # checkpointed at sf-independent n_dbs=4)
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
    _PERSISTED.extend(mats)
    _PERSISTED.extend(base.materialized)
    _PERSISTED.extend(next(iter(results.values())).materialized)
    return (
        fanout_table_audit(results)
        .groupBy("target_glue_catalog_id", "table_created", "table_updated")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("target_glue_catalog_id", "table_created", "table_updated")
    )


# ---------------------------------------------------------------------------
# 56. Hive type-grammar validation (SURVEY §1.2 data-plane types)
# ---------------------------------------------------------------------------

_TYPE_CASES = [
    "string",
    "int",
    "bigint",
    "boolean",
    "decimal(10,2)",
    "varchar(255)",
    "double precision",
    "array<string>",
    "map<string,int>",
    "struct<name:string,age:int>",
    "array<struct<sha:string,author:struct<name:string,email:string>,"
    "distinct:boolean>>",  # sample_table_schema.json:29 shape
    "uniontype<int,string>",
    "map<string,array<struct<k:string,v:map<string,string>>>>",
    "aray<string>",            # typo'd composite
    "struct<name:string",      # unbalanced bracket
    "array<>",                 # empty element type
    "map<string>",             # missing value type
    "struct<:int>",            # empty field name
    "int; drop table x",       # trailing garbage
    "",                        # empty
    "!",                       # forged reduction marker (ADVICE r04)
    "array<!>",                # forged reduced subtree
    "map<!,!>",                # forged reduced subtree
]


def _q56_oracle() -> str:
    from .functions.hive_types import hive_type_valid_sql

    vals = ", ".join("(%s)" % ("'" + c.replace("'", "''") + "'") for c in _TYPE_CASES)
    return f"""
    SELECT type_str, {hive_type_valid_sql('type_str')} AS is_valid
    FROM (VALUES {vals}) t(type_str)
    """


@register("q56_hive_type_validation", oracle=_q56_oracle())
def q56_hive_type_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-plane type validator behind the import's DLQ lane
    (SURVEY §1.2): Hive type-grammar strings checked by an
    engine-portable pure column expression (primitives collapse to a
    marker, K unrolled rewrite rounds collapse one composite nesting
    level each — RE2-safe regexes only, so the DuckDB oracle runs the
    IDENTICAL algorithm via hive_type_valid_sql). Cases cover the
    reference fixture's deep array<struct<...>> nesting plus malformed
    shapes (typos, unbalanced brackets, empty members, garbage)."""
    from .functions.hive_types import hive_type_valid

    cases = spark.createDataFrame([(c,) for c in _TYPE_CASES], "type_str string")
    return cases.select("type_str", hive_type_valid("type_str").alias("is_valid"))


# (q57_dedup_clusters_star folded into q53_dedup_clusters in r05: one
# query now runs both CC algorithms and the oracle enforces label-for-
# label agreement between them.)


# ---------------------------------------------------------------------------
# 58. product quantization (PQ codes over the int8 lane)
# ---------------------------------------------------------------------------


# the int8-quantization + PQ-code CTEs (q54's scalar lane composed with
# the m=4 x k=8 codebook assignment) — shared verbatim by the q58 code
# check, the q59 ADC search, and the q60 composed IVF+ADC recall pin so
# the three oracles can never diverge on the code semantics
_PQ_CTES = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS scale
          FROM e),
    q AS (SELECT vec_id, len(v) AS nd,
                 CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                      ELSE list_transform(v,
                             x -> CAST(FLOOR(x * 127.0 / scale) AS INT)) END AS qv
          FROM s),
    sb AS (SELECT MAX(nd) // 4 AS sub FROM q),
    seeds AS (SELECT vec_id AS c, qv AS sv FROM q WHERE vec_id < 8),
    pairs AS (
      SELECT q.vec_id, j.j, seeds.c,
             list_sum(list_transform(range(1, sb.sub + 1),
               i -> (q.qv[j.j * sb.sub + i] - seeds.sv[j.j * sb.sub + i])
                  * (q.qv[j.j * sb.sub + i] - seeds.sv[j.j * sb.sub + i])))
               AS dist
      FROM q CROSS JOIN sb CROSS JOIN seeds
           CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
    ),
    bd AS (SELECT vec_id, j, MIN(dist) AS d FROM pairs GROUP BY vec_id, j),
    bc AS (
      SELECT p.vec_id, p.j, MIN(p.c) AS code
      FROM pairs p JOIN bd ON p.vec_id = bd.vec_id AND p.j = bd.j
                         AND p.dist = bd.d
      GROUP BY p.vec_id, p.j
    )"""

# full-table ADC distances for the first-5 query set, over the shared
# PQ CTEs (q59's search relation, reused by q60)
_ADC_CTE = """
    ad AS (
      SELECT l.vec_id AS query_id, b.vec_id, SUM(l.dist) AS adist
      FROM bc b JOIN pairs l ON l.j = b.j AND l.c = b.code AND l.vec_id < 5
      WHERE b.vec_id != l.vec_id
      GROUP BY l.vec_id, b.vec_id
    )"""


# r09 registry rotation: q58 left the 50-slot registry (the skipping
# layer took the slot, q13); its code-level PQ semantics remain pinned
# three ways — q59/q60 consume these exact codes under the driver
# oracle, and tests/test_functions.py runs THIS function against THIS
# oracle bit-exactly at sf0.01 (the retired-slot parity discipline).
RETIRED_ORACLES: dict[str, str] = {
    # r11 rotation: the vstore FORMAT read path took the q12 slot; the
    # library-API lifecycle (append -> MERGE -> DELETE -> per-version
    # time travel) keeps this oracle running bit-exactly in
    # tests/test_versioned.py, and its operators stay independently
    # pinned by q12's format writes + test_versioned/test_replace_where
    "q12_vstore_lifecycle": """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL SELECT -1, -1, 42.0
    ),
    v1 AS (SELECT * FROM base),
    v2 AS (
      SELECT * FROM v1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL SELECT * FROM upd
    ),
    v3 AS (SELECT * FROM v2 WHERE o_custkey % 7 <> 0)
    SELECT 1 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(CASE WHEN o_orderkey < 0 THEN 1 END) AS n_inserted
    FROM v1
    UNION ALL
    SELECT 2, COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
           COUNT(CASE WHEN o_orderkey < 0 THEN 1 END)
    FROM v2
    UNION ALL
    SELECT 3, COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
           COUNT(CASE WHEN o_orderkey < 0 THEN 1 END)
    FROM v3
    """,
    "q58_product_quantization": f"""
    WITH {_PQ_CTES}
    SELECT vec_id, CAST(4 AS INT) AS m,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY j) AS code_str
    FROM bc GROUP BY vec_id
    """,
    # r10 rotation: the schema-evolution read took the q54 slot; the
    # int8 scalar-quantization semantics stay pinned by q59/q60 (which
    # consume the same quantized lane) plus this bit-exact twin
    "q54_embedding_quantization": """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS scale
          FROM e),
    q AS (SELECT vec_id, len(v) AS n_dims, scale,
                 CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                      ELSE list_transform(v,
                             x -> CAST(FLOOR(x * 127.0 / scale) AS INT)) END AS qv
          FROM s)
    SELECT vec_id, CAST(n_dims AS INT) AS n_dims, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max
    FROM q
    """,
}


def q58_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes — the compression step PAST scalar
    quantization an ANN index stores (m=4 subspaces x k=8 codewords =
    4 bytes/vector here): computed over the int8-quantized vectors so
    every subspace distance is INTEGER arithmetic, exact under any
    summation order — which is what makes a PQ assignment verifiable
    bit-for-bit across engines (float-L2 PQ would hinge on fold order).
    The Spark plan is one narrow projection with the codebook folded in
    as literals (map-side argmin, zero exchanges — same shape as the
    IVF assignment); the oracle recomputes codes via an explicit
    (vector x subspace x codeword) distance relation."""
    from .functions.similarity import pq_codes

    (emb,) = _t(spark, sf_dir, "embeddings")
    codes = pq_codes(emb, m=4, k=8)
    return codes.select(
        "vec_id",
        "m",
        F.concat_ws(
            ",", F.transform("codes", lambda c: c.cast("string"))
        ).alias("code_str"),
    )


# ---------------------------------------------------------------------------
# 59. PQ asymmetric-distance search (the ADC query side of the PQ index)
# ---------------------------------------------------------------------------


@register(
    "q59_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_CTES},{_ADC_CTE},
    rk AS (SELECT query_id, vec_id, adist,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adist, vec_id) AS rank
           FROM ad)
    SELECT query_id, vec_id, CAST(adist AS BIGINT) AS adist,
           CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 5
    """,
)
def q59_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query side of the PQ index: asymmetric-distance (ADC) top-5
    per query — each query precomputes an m x k integer lookup table
    against the codebook, and every stored vector's approximate
    distance is m table lookups over its PQ code (never a d-dim
    distance). With q58 (codes), q54 (int8 SQ), and q33 (IVF pruning)
    this completes the standard ANN index stack, every stage
    oracle-checked exactly: the int8 lane makes all distances integer
    arithmetic, so both engines agree bit-for-bit. One code projection
    + posexplode + ONE window shuffle on query_id."""
    from .functions.similarity import pq_adc_topk

    (emb,) = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, m=4, k=8, n_queries=5, topk=5)


# ---------------------------------------------------------------------------
# 60. composed IVF+ADC search, recall pinned at nprobe in {1,2,4,full}
# ---------------------------------------------------------------------------


def _ivf_lane_cte(name: str, nprobe: int) -> str:
    return f"""
    {name} AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, vec_id) AS rn
        FROM scored WHERE probe_rank <= {nprobe}) WHERE rn <= 5
    )"""


@register(
    "q60_ivf_adc_recall",
    oracle=f"""
    WITH {_PQ_CTES},{_ADC_CTE},
    fseeds AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, seed_id AS cluster FROM (
        SELECT e.vec_id, fs.seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_inner_product(e.v, fs.sv)
                   / (sqrt(list_inner_product(e.v, e.v))
                      * sqrt(list_inner_product(fs.sv, fs.sv))) DESC,
                 fs.seed_id ASC) AS rn
        FROM e CROSS JOIN fseeds fs) WHERE rn = 1
    ),
    qv5 AS (SELECT vec_id AS query_id, v AS qvec FROM e WHERE vec_id < 5),
    qprobe AS (
      SELECT query_id, seed_id AS cluster,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               list_inner_product(qvec, sv)
                 / (sqrt(list_inner_product(qvec, qvec))
                    * sqrt(list_inner_product(sv, sv))) DESC,
               seed_id ASC) AS probe_rank
      FROM qv5 CROSS JOIN fseeds
    ),
    scored AS (
      SELECT ad.query_id, ad.vec_id, ad.adist, qp.probe_rank
      FROM ad
      JOIN assign a ON a.vec_id = ad.vec_id
      JOIN qprobe qp ON qp.query_id = ad.query_id AND qp.cluster = a.cluster
    ),
    adc_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, vec_id) AS rn
        FROM scored) WHERE rn <= 5
    ),{_ivf_lane_cte("ivf1", 1)},{_ivf_lane_cte("ivf2", 2)},{_ivf_lane_cte("ivf4", 4)},
    cs AS (
      SELECT qq.query_id, e.vec_id,
             list_inner_product(e.v, qq.qvec)
               / (sqrt(list_inner_product(e.v, e.v))
                  * sqrt(list_inner_product(qq.qvec, qq.qvec))) AS cosine
      FROM e JOIN qv5 qq ON e.vec_id <> qq.query_id
    ),
    topk AS (
      SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM cs) WHERE rank <= 5
    )
    SELECT t.query_id, t.vec_id, t.cosine, t.rank,
           (a.vec_id IS NOT NULL) AS in_adc,
           (i1.vec_id IS NOT NULL) AS in_ivf1,
           (i2.vec_id IS NOT NULL) AS in_ivf2,
           (i4.vec_id IS NOT NULL) AS in_ivf4
    FROM topk t
    LEFT JOIN adc_top a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
    LEFT JOIN ivf1 i1 ON i1.query_id = t.query_id AND i1.vec_id = t.vec_id
    LEFT JOIN ivf2 i2 ON i2.query_id = t.query_id AND i2.vec_id = t.vec_id
    LEFT JOIN ivf4 i4 ON i4.query_id = t.query_id AND i4.vec_id = t.vec_id
    """,
)
def q60_ivf_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN query, composed and recall-pinned (VERDICT r04
    #2/#3/#4): IVF-pruned ADC search — prune each query's search space
    to its nprobe nearest clusters (ivf_pq_scores.probe_rank), rank the
    survivors by asymmetric PQ distance — run at nprobe 1, 2, 4, AND
    the full-table ADC lane (the nprobe=nlist degenerate, q59's
    search). Every exact cosine top-5 row (the q21 ground truth,
    recomputed here) is annotated with whether each lane's top-5 found
    it — so the output IS the recall table of the whole PQ index stack:
    in_adc pins the pure-ADC recall (the one approximate lane VERDICT
    r04 flagged as unpinned), in_ivf{{1,2,4}} pin the nprobe
    recall/cost trade on top of it.

    Plan: ONE zero-exchange projection computes cluster + PQ code +
    per-query (adist, probe_rank); the four lanes are windows over that
    materialized relation; exact top-5 is the broadcast-query scan.
    At 100 TB only the probed lanes run, and the partitionBy(cluster)
    layout turns probe_rank filtering into directory pruning (q33).

    Note recall-vs-exact need NOT be monotone in nprobe (measured
    7/7/6 of 25 at nprobe 1/2/4, sf0.01): growing the candidate set
    can only improve agreement with the FULL-ADC ranking, but an extra
    probed cluster may contribute ADC-favored spoilers that push a true
    neighbor out of top-5. The hash check pins whatever the trade is —
    which is exactly what a 100 TB user needs to read off."""
    from .functions.similarity import ivf_pq_scores

    (emb,) = _t(spark, sf_dir, "embeddings")
    scores = ivf_pq_scores(emb, n_seeds=8, m=4, k=8, n_queries=5)

    # r12 (guide §2.4): ALL FOUR lanes in ONE window pass. The lanes
    # share one global ordering (adist asc, vec_id asc); a row's rank
    # within the probe_rank<=n subset equals the RUNNING COUNT of
    # subset rows up to it under that ordering, so one Window operator
    # (same partition/order/frame -> Spark fuses the expressions)
    # computes row_number + three running membership counts where the
    # previous form ran FOUR separate window shuffles over the scored
    # relation and FOUR broadcast-hash joins against the exact-cosine
    # ground truth (plan diff: 4 Exchange/Sort/Window towers -> 1, four
    # BroadcastExchange builds -> 1; the _persist of the scored
    # relation — only needed because four consumers raced it — is gone
    # too, saving its cache-fill job). Flag values are bit-identical:
    # same ordering, same tie-break, same <=5 cut per lane.
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _run_count(nprobe: int):
        return F.sum(
            F.when(F.col("probe_rank") <= nprobe, 1).otherwise(0)
        ).over(run)

    flags = (
        scores.select(
            "query_id",
            "vec_id",
            "probe_rank",
            F.row_number().over(w).alias("__rn"),
            _run_count(1).alias("__c1"),
            _run_count(2).alias("__c2"),
            _run_count(4).alias("__c4"),
        )
        .select(
            "query_id",
            "vec_id",
            (F.col("__rn") <= 5).alias("in_adc"),
            ((F.col("probe_rank") <= 1) & (F.col("__c1") <= 5)).alias("in_ivf1"),
            ((F.col("probe_rank") <= 2) & (F.col("__c2") <= 5)).alias("in_ivf2"),
            ((F.col("probe_rank") <= 4) & (F.col("__c4") <= 5)).alias("in_ivf4"),
        )
        .where(
            F.col("in_adc")
            | F.col("in_ivf1")
            | F.col("in_ivf2")
            | F.col("in_ivf4")
        )
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=5).join(
        F.broadcast(flags), on=["query_id", "vec_id"], how="left"
    )
    return out.select(
        "query_id",
        "vec_id",
        "cosine",
        "rank",
        *[
            F.coalesce(flag, F.lit(False)).alias(flag)
            for flag in ("in_adc", "in_ivf1", "in_ivf2", "in_ivf4")
        ],
    )


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

FLAGSHIP = "q15_local_supplier_volume"
