"""Structured Streaming event plane: the SNS/SQS flow as a stream job.

Reference semantics being reproduced (SURVEY.md §2A #8-10, #21, #32-33):
- SNS/SQS consumption with at-least-once redelivery — a failed Lambda
  throws and the message comes back (SQSUtil.java:17-134,
  ExportLargeTable.java:136-141, ImportLargeTable.java:78-81);
- per-message dispatch on `message_type` (ImportDatabaseOrTable.java:117-145);
- idempotent apply so redelivery converges (the reference relies on
  create-if-absent + update-in-place; we rely on the join+overwrite MERGE).

Spark-native shape: `readStream` over the events directory (file source —
each dropped file is a batch of messages), `foreachBatch` running the SAME
`import_events` plan the batch job runs. Checkpointing makes batch replay
at-least-once; the idempotent MERGE + per-batch overwrites make it
effectively-once.

State layout under `state_root` (local FS in tests; object store in prod —
version discovery would move to a manifest file there, the write protocol
is already last-version-wins):

    state_root/v=<N>/{databases,tables}/              parquet snapshots
    state_root/partitions/database_name=*/table_name=*/   partition-scoped
    state_root/audit/db_import/batch_id=<B>/          parquet, per-batch
    state_root/audit/table_import/batch_id=<B>/
    state_root/dlq/batch_id=<B>/

The dbs/tables planes are catalog-metadata-small and stay whole-copy
versioned (the version history doubles as the reference's table-version
archive, GlueUtil.java:264-350 `skipArchive`). The partitions plane is the
big one — at 100 TB of catalog metadata a whole-copy write per micro-batch
is a full-table rewrite — so it is stored hive-partitioned by
(database_name, table_name) and committed with dynamic partition
overwrite: a micro-batch rewrites ONLY the table directories in its sync
scope, exactly the reference's delete-then-add on the affected table
(GDCUtil.java:76-99), and untouched tables' files are never opened.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..model import DATABASE, PARTITION, TABLE
from ..operators.sync import DEFAULT_SYNC_KEYS
from ..plans.importer import import_events

_V_RE = re.compile(r"^v=(\d+)$")

# Hive/Spark partition-directory escaping (ExternalCatalogUtils
# .escapePathName): these characters are %XX-encoded in directory names
# by partitionBy() writers; the delete-all lane must target the SAME
# escaped path or the wipe silently misses (worse, a '/' in a name
# would address the wrong subtree)
_ESCAPE_CHARS = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}
_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def escape_dir_name(value: str | None) -> str:
    """A partition value as Spark's partitioned writer encodes it on
    disk (null -> __HIVE_DEFAULT_PARTITION__, special chars -> %XX)."""
    if value is None:
        return _DEFAULT_PARTITION
    return "".join(
        f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS else ch for ch in value
    )


def latest_version(state_root: str) -> int | None:
    """Highest committed dbs/tables state version, or None when
    uninitialized."""
    if not os.path.isdir(state_root):
        return None
    versions = [
        int(m.group(1))
        for d in os.listdir(state_root)
        if (m := _V_RE.match(d)) and os.path.exists(os.path.join(state_root, d, "_DONE"))
    ]
    return max(versions, default=None)


def read_partitions(
    spark: SparkSession, state_root: str, backend: str = "parquet"
) -> DataFrame:
    """The partitions plane from its partition-scoped store. The explicit
    schema pins partition-column types (no directory-name inference — a
    table named '123' must stay a string) and restores the canonical
    PARTITION column order. `backend` must match the one used by
    `commit_partitions` for this state_root."""
    root = f"{state_root}/partitions"
    if not os.path.isdir(root):
        return spark.createDataFrame([], PARTITION)
    cols = [f.name for f in PARTITION.fields]
    if backend == "delta":
        return spark.read.format("delta").load(root).select(*cols)
    return (
        spark.read.schema(PARTITION)
        .option("basePath", root)
        .parquet(root)
        .select(*cols)
    )


def read_state(
    spark: SparkSession, state_root: str, backend: str = "parquet"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(databases, tables, partitions) at the latest version; empty
    snapshots when no version exists yet."""
    v = latest_version(state_root)
    if v is None:
        return (
            spark.createDataFrame([], DATABASE),
            spark.createDataFrame([], TABLE),
            read_partitions(spark, state_root, backend),
        )
    base = f"{state_root}/v={v}"
    return (
        spark.read.parquet(f"{base}/databases"),
        spark.read.parquet(f"{base}/tables"),
        read_partitions(spark, state_root, backend),
    )


def write_small_planes(
    dbs: DataFrame,
    tables: DataFrame,
    state_root: str,
    retain_versions: int | None = None,
) -> int:
    """Commit a new version of the two metadata-small planes (write both,
    then the _DONE marker — readers only see fully-written versions). The
    retained v=N history is the engine's analogue of Glue's table-version
    archive (GlueUtil.java:264-350: UpdateTable archives the previous
    table version unless `skipArchive=true`), at snapshot granularity:

    - retain_versions=None (default) keeps every committed version —
      `skipArchive=false`: any prior state is recoverable;
    - retain_versions=N prunes to the newest N after each commit, so
      retain_versions=1 is `skipArchive=true`: only the current state
      survives, no archive accrues.

    Pruning happens strictly after the new version's _DONE marker is
    written — but CAUTION with laziness: any still-unexecuted plan that
    reads the old version (e.g. an audit projection built against the
    pre-batch snapshots) must be materialized BEFORE pruning runs. The
    stream therefore prunes via `prune_versions` at the END of its
    batch, after every write; only pass retain_versions here when no
    such plan is pending. An EXTERNAL reader racing a pruning writer
    should use retain_versions >= 2 so the version it resolved stays on
    disk for at least one more commit cycle."""
    v = (latest_version(state_root) or 0) + 1
    base = f"{state_root}/v={v}"
    dbs.write.mode("overwrite").parquet(f"{base}/databases")
    tables.write.mode("overwrite").parquet(f"{base}/tables")
    with open(f"{base}/_DONE", "w") as fh:
        fh.write("")
    if retain_versions is not None:
        prune_versions(state_root, v, retain_versions)
    return v


def prune_versions(state_root: str, latest: int, retain: int) -> None:
    """Remove committed versions older than the newest `retain` (the
    skipArchive lane). Callers must ensure no pending lazy plan still
    reads the pruned versions."""
    if retain < 1:
        return
    for d in os.listdir(state_root):
        if (m := _V_RE.match(d)) and int(m.group(1)) <= latest - retain:
            shutil.rmtree(os.path.join(state_root, d), ignore_errors=True)


def delta_backend_available() -> bool:
    """True when the delta-spark package (and so the Delta Lake commit
    lane) is importable in this environment. The sandbox ships plain
    pyspark only, so tests gate the delta matrix leg on this."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def _scope_predicate(sync_scope: DataFrame, keys: list[str], max_tables: int = 10_000) -> str:
    """The batch's sync scope as a SQL predicate over (database_name,
    table_name) for `replaceWhere`. Collect is metadata-bounded (number
    of TABLES in the batch's messages, never partition rows) with an
    explicit overflow guard, same policy as every driver-side collect in
    this repo."""
    rows = sync_scope.select(*keys).dropDuplicates(keys).limit(max_tables + 1).collect()
    if len(rows) > max_tables:
        raise ValueError(
            f"sync scope exceeds {max_tables} tables; split the batch or raise max_tables"
        )
    if not rows:
        return "false"  # empty scope: replace nothing

    def q(v: str | None) -> str:
        # Spark's default expression parser (escapedStringLiterals=false)
        # treats backslash as an escape inside string literals, so a name
        # ending in '\' would swallow the closing quote: escape
        # backslashes FIRST, then double quotes (ADVICE r05)
        if v is None:
            return "NULL"
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"

    return " OR ".join(
        "(" + " AND ".join(
            f"{k} <=> {q(getattr(r, k))}" for k in keys
        ) + ")"
        for r in rows
    )


def replace_where_equivalent(
    existing: DataFrame, partitions_delta: DataFrame, sync_scope: DataFrame
) -> DataFrame:
    """The Delta commit lane as a logical plan: exactly what the
    partitions plane equals after `_commit_partitions_delta`'s single
    `replaceWhere` overwrite — rows NOT matching the scope predicate
    survive, the batch's rows are inserted (Delta's documented
    overwrite-with-replaceWhere = delete-matching + insert, one
    commit). The predicate built by `_scope_predicate` uses `<=>`
    only, so it is never NULL and `~pred` is an exact complement.

    This is how the 4-case sync matrix EXECUTES the delta lane's
    predicate and set semantics in environments without delta-spark
    (the sandbox has no network to fetch the jar): the same predicate
    string goes through Spark's expression parser here as the Delta
    writer would hand it, and `test_delta_replace_where_semantics`
    pins the resulting state bit-for-bit against the parquet backend's
    on-disk state across all four cases. The real-writer leg of the
    matrix still runs wherever delta-spark is importable."""
    from pyspark.sql import functions as F

    pred = _scope_predicate(sync_scope, list(DEFAULT_SYNC_KEYS))
    cols = [f.name for f in PARTITION.fields]
    return existing.where(~F.expr(pred)).select(*cols).unionByName(
        partitions_delta.select(*cols)
    )


def _commit_partitions_delta(
    partitions_delta: DataFrame, sync_scope: DataFrame, state_root: str
) -> None:
    """The transactional commit lane: the same 4-case sync expressed as
    ONE Delta `replaceWhere` overwrite — delete every row matching the
    scope predicate, insert the batch's rows, in a single Delta commit.
    Unlike the parquet lane this is atomic ACROSS tables and holds on
    object stores (Delta's log protocol doesn't rely on rename
    atomicity). The delete-all case (in scope, zero delta rows) needs no
    explicit wipe: the predicate deletes the table's rows and nothing is
    re-inserted."""
    keys = list(DEFAULT_SYNC_KEYS)
    root = f"{state_root}/partitions"
    pred = _scope_predicate(sync_scope, keys)
    (
        partitions_delta.write.format("delta")
        .mode("overwrite")
        .option("replaceWhere", pred)
        .partitionBy(*keys)
        .save(root)
    )


def commit_partitions(
    spark: SparkSession,
    partitions_delta: DataFrame,
    sync_scope: DataFrame,
    state_root: str,
    backend: str = "parquet",
) -> None:
    """Partition-scoped commit of one batch's partition sync — the
    storage-level form of `full_refresh_sync`'s 4-case semantics
    (GDCUtil.java:61-111 / README.md:266-273):

    - table in scope, delta rows exist  -> dynamic partition overwrite
      rewrites exactly that table's directory (delete-all-then-add-all);
    - table in scope, zero delta rows   -> its directory is removed
      (the delete-all case — dynamic overwrite never touches a partition
      absent from the data, so the wipe is explicit);
    - table not in scope                -> its files are never opened.

    The scope collect is metadata-scale (bounded by the number of TABLES
    in the batch's messages, not by partition rows).

    Two storage backends behind the same seam (VERDICT r04 #8):
    - `parquet` (sandbox default): dynamic partition overwrite — atomic
      per table directory (rename), not across tables; same per-message
      granularity as the reference's Lambda, and checkpoint replay +
      idempotent overwrite recovers a mid-batch crash.
    - `delta` (production, gated on delta-spark being importable): one
      `replaceWhere` overwrite of exactly the scope's tables — a single
      transactional commit across ALL tables in the batch, valid on
      object stores. See `_commit_partitions_delta`.
    """
    if backend == "delta":
        _commit_partitions_delta(partitions_delta, sync_scope, state_root)
        return
    if backend != "parquet":
        raise ValueError(f"unknown partition backend: {backend!r}")
    keys = list(DEFAULT_SYNC_KEYS)
    root = f"{state_root}/partitions"
    # delete-all lane: in-scope tables with no incoming partition rows
    empties = (
        sync_scope.select(*keys)
        .dropDuplicates(keys)
        .join(partitions_delta.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        .collect()
    )
    for r in empties:
        shutil.rmtree(
            f"{root}/database_name={escape_dir_name(r.database_name)}"
            f"/table_name={escape_dir_name(r.table_name)}",
            ignore_errors=True,
        )
    # inside foreachBatch the batch DataFrame belongs to a CLONED session
    # with isolated conf — the overwrite-mode flag must be set on the
    # session that will execute the write, not the outer one
    sess = partitions_delta.sparkSession
    prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        partitions_delta.write.mode("overwrite").partitionBy(*keys).parquet(root)
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _append_batch(df: DataFrame, root: str, batch_id: int) -> None:
    """Idempotent per-batch append: a replayed micro-batch overwrites its
    own batch_id directory instead of duplicating rows (the streaming
    analogue of the reference's (id, run_id) audit keys)."""
    df.write.mode("overwrite").parquet(f"{root}/batch_id={batch_id}")


def start_event_stream(
    spark: SparkSession,
    events_path: str | None = None,
    state_root: str = "",
    checkpoint_path: str = "",
    target_catalog_id: str = "999999999999",
    side_channel_path: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    retain_versions: int | None = None,
    source=None,
    partition_backend: str = "parquet",
):
    """Start the streaming import. The event bus is a pluggable SOURCE
    ADAPTER (sources/streams.py): pass `source` (anything with
    `load(spark) -> streaming DataFrame[MESSAGE]` — FileEventSource,
    KafkaEventSource, ...), or `events_path` as shorthand for the
    sandbox default FileEventSource (a directory of ndjson message
    files — the SNS topic equivalent; drop a file, it becomes a
    micro-batch). Returns the StreamingQuery; callers awaitTermination().

    available_now=True drains everything currently present then stops —
    the test/batch-catchup mode; False runs continuously.

    retain_versions maps Glue's `skipArchive` (GlueUtil.java:264-350) to
    snapshot retention: None archives every committed state
    (skipArchive=false), 1 keeps only the current one (skipArchive=true).
    """
    from ..sources.streams import FileEventSource

    if source is None:
        if events_path is None:
            raise ValueError("pass either events_path or a source adapter")
        source = FileEventSource(events_path, max_files_per_trigger)
    stream = source.load(spark)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        tgt_dbs, tgt_tables, tgt_parts = read_state(spark, state_root, partition_backend)
        result = import_events(
            spark,
            batch_df,
            tgt_dbs,
            tgt_tables,
            tgt_parts,
            target_catalog_id=target_catalog_id,
            side_channel_path=side_channel_path,
            run_id=batch_id,
        )
        v = write_small_planes(result.databases, result.tables, state_root)
        # result.partitions (the full logical plane) is never executed
        # here: the partition-scoped commit realizes the same 4-case
        # semantics at the storage layer, touching only this batch's
        # sync scope (test_stream_state_matches_batch_import pins the
        # equivalence against the batch plan)
        commit_partitions(
            spark, result.partitions_delta, result.sync_scope, state_root,
            backend=partition_backend,
        )
        _append_batch(result.db_import_audit, f"{state_root}/audit/db_import", batch_id)
        _append_batch(
            result.table_import_audit, f"{state_root}/audit/table_import", batch_id
        )
        _append_batch(result.dlq, f"{state_root}/dlq", batch_id)
        # retention LAST: the audit/dlq/partition plans above lazily read
        # the PRE-batch snapshot (the merge compares against it) — prune
        # only after every plan of this batch has executed
        if retain_versions is not None:
            prune_versions(state_root, v, retain_versions)
        # release the batch's parse-time materializations (checkpoint +
        # persist frames): a continuously-running stream otherwise
        # accumulates one CacheManager entry + checkpoint blocks per
        # micro-batch, without bound (ADVICE r04)
        result.release()

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_audit(spark: SparkSession, state_root: str, which: str) -> DataFrame:
    """Read a persisted audit table ('db_import' | 'table_import') or the
    'dlq' across all batches."""
    root = f"{state_root}/dlq" if which == "dlq" else f"{state_root}/audit/{which}"
    return spark.read.option("basePath", root).parquet(root)
