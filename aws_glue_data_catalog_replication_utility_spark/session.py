"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen for the 100 TB / 1000-executor target:

- AQE on (runtime coalescing, skew-join splitting, broadcast demotion);
- shuffle partitions sized for the local box but overridable — at cluster
  scale set ``SPARK_GRAFT_INITIAL_PARTITIONS`` (wired to
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``) high and
  let AQE shrink rather than hand-tuning per query; locally it stays
  unset so the bench plans match the driver's;
- Arrow enabled for the Pandas-UDF paths (similarity / multimodal);
- timestamps kept NTZ to match the parquet testdata and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "glue-catalog-replication-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` defaults to 2x cores locally; on a real cluster
    AQE's initialPartitionNum dominates and coalescing picks the runtime
    number, so the static setting only bounds tiny local runs.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(2 * cpus, 8)
    # cluster deploys point SPARK_GRAFT_MASTER at the real master (yarn,
    # k8s://..., spark://...); the local default is for the sandbox only
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- adaptive execution: the scale story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
    )
    # Cluster-scale knob (guide §2.2): start shuffles from a high
    # partition count and let AQE coalesce down to the data's real
    # size. Unset locally: the sandbox bench must keep the same plans
    # at every SPARK_GRAFT_CPUS the driver probes, and a high initial
    # count only pays off when map outputs are large enough to coalesce.
    initial = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    if initial:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(int(initial)),
        )
    builder = (
        builder
        # --- broadcast: dims (region/nation/prefixes) must broadcast -----
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python/arrow: fast lane for the few pandas-UDF operators ----
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: keep partitions within executor memory ---------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark
        # has no native type for: read as long, convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- driver constants (r13, guide §5) -----------------------------
        # PySpark 4's DataFrame-debugging layer captures a Python call
        # site and ships it to the JVM on EVERY DataFrame method call
        # (a conf.get round-trip + a PySparkCurrentOrigin.set round-trip
        # + a Python stack walk per op). The replication towers build
        # hundreds of ops per batch — cProfile measured ~0.4s of q34's
        # driver wall in this wrapper alone. Plan- and result-neutral:
        # only error messages lose the Python call-site line.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # --- misc: quiet + deterministic ----------------------------------
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Read the driver's parquet tables and register them as temp views.

    Returns {name: DataFrame}. Views let both the DataFrame API and
    ``spark.sql`` express each operator over the same scan.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    # the driver hands us ITS session — make nano-timestamp parquet
    # readable regardless of how the session was built (runtime-settable)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        # nano-precision timestamps arrive as long (nanosAsLong): convert
        # to micros by truncation, matching DuckDB's nanos->micros cast
        for f in df.schema.fields:
            if f.name == "ts" and f.dataType.simpleString() == "bigint":
                df = df.withColumn(
                    "ts",
                    F.expr("timestamp_micros(ts DIV 1000)").cast("timestamp_ntz"),
                )
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
