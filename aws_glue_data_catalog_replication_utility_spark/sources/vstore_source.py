"""The versioned store as a first-class Spark FORMAT (PySpark 4
Python Data Source API): ``spark.read.format("vstore")`` /
``df.write.format("vstore")`` / ``spark.readStream.format("vstore")``.

Why this exists. ``versioned.py`` gives the engine a transactional
table format (immutable data files + an ordered manifest log — the
engine-native answer to the reference's delete-all-then-add catalog
sync, ``GDCUtil.java:61-111``, without its inconsistency window), but
until now it was a *library*: users called ``read_versioned(spark,
root)``. This module makes the store a *format*, so the whole Spark
surface — SQL via ``CREATE TEMPORARY VIEW ... USING``, ``.load()``,
``.save()``, Structured Streaming — speaks to it directly:

- **Batch read** (``spark.read.format("vstore").load(root)``): the
  snapshot at ``version`` (time travel via ``.option("version", k)``),
  with the same mixed-origin-schema evolution read as
  ``read_versioned`` — each file is decoded under the schema its
  commit wrote and widened to the table LUB, Arrow-batch zero-copy
  into Spark.
- **Filter pushdown file skipping** (OPT-IN via
  ``.option("pruneFiles", "true")``): Spark 4.1 pushes query filters
  into Python data sources (``DataSourceReader.pushFilters``). We
  translate them into the skip-index predicate form and prune the
  live-file list against the PER-FILE COLUMN STATS RECORDED IN THE
  COMMIT LOG (Delta's stats-in-the-log design; written by
  ``versioned._commit`` via the same ``_footer_stat_rows`` extraction
  the footer index uses) — a ``WHERE o_orderkey = k`` against a
  100k-file snapshot plans with ZERO footer I/O and opens only the
  files whose stats cannot refute the predicate. Every filter is
  handed back to Spark for re-evaluation, so pruning affects I/O,
  never results (the proof obligation is one-sided: a dropped file
  provably contains no matching row). Opt-in because Spark caches
  the planned partition list per RELATION
  (``PythonDataSourceV2.readInfo``, refreshed only when
  ``pushFilters`` runs): on a reused DataFrame or temp view, a
  filterless query would silently reuse the last filtered query's
  pruned file set. Enable it under a one-DataFrame-per-query
  discipline (a fresh ``load()`` per query); the default plan bakes
  no filter state, so any reuse pattern stays exact.
- **Partitioned tables**: ``.option("partitionBy", "a,b")`` on the
  writers declares/inherits the store's hive-style partition layout
  (one tuple per file, split executor-side); with
  ``.option("partitionOverwriteMode", "dynamic")`` an overwrite
  replaces exactly the partitions the written data carries —
  metadata-only on the removal side.
- **Batch write** (``df.write.format("vstore").mode("append" |
  "overwrite").save(root)``): tasks stage parquet under
  ``.staging/`` executor-side (Arrow batches straight to disk), and
  the DRIVER commit publishes ONE atomic manifest through the same
  ``_commit`` path as the library API — per-file stats recorded,
  ``VersionConflict`` on a concurrent writer, crash-before-commit
  leaves only vacuum-able orphans. ``abort()`` removes the staging.
- **Streaming write** (``df.writeStream.format("vstore")``): each
  micro-batch commits as one atomic version with the epoch's batchId
  in the manifest meta — the same exactly-once replay guard as
  ``append_stream_batch`` (a re-delivered epoch is recognized in the
  log and its staged files dropped). ``.option("queryId", ...)``
  scopes the guard when several queries share a store.
- **Streaming read** (``spark.readStream.format("vstore")``): the
  commit log IS a change feed; offsets are store versions, so
  exactly-once is the checkpoint replaying ``(start_version,
  end_version]``. Append-family commits stream their added files'
  rows; a commit that REMOVED files raises unless
  ``.option("ignoreChanges", "true")`` (Delta's streaming-source
  contract). ``.option("startingVersion", k)`` replays history from
  version k; the default streams only commits after the query starts.
  Built on the full ``DataSourceStreamReader`` API: the driver plans
  offsets/partitions from manifest JSON alone (each manifest read
  once per stream lifetime, range gaps from ``prune_log`` raise) and
  the admitted files decode EXECUTOR-SIDE as Arrow batches — streamed
  rows never transit the driver, so a commit bigger than driver
  memory is just more tasks, and throughput scales with the cluster.

Scale notes. ``partitions()`` packs the (pruned) live files into
row-budgeted groups (``rowsPerPartition``, default ~1M rows, counted
from the log's recorded per-file rows — zero I/O), so a 100k-small-
file store becomes thousands of tasks, not 100k, while large files
still get a task each; pruning happens BEFORE partition planning, so
skipped files never become tasks. The stats walk is
O(live files x indexed columns) driver-side metadata — the same cost
``snapshot_skip_index`` pays, with no SparkSession needed (the
Python-worker half of the data source has none). Rows move as Arrow
RecordBatches both directions (never per-row Python).

Reference parity: the reference's only storage integration is
DynamoDB audit writes + S3 ndjson side-channels (``DDBUtil.java``,
``S3Util.java:223-233``); this is the Spark-native generalization —
the store the audit/import pipelines already use, now mounted on the
standard reader/writer/stream surface.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

# manifest actions whose added files are pure inserts (safe to
# stream): every append flavor (library append, append_checked,
# append_stream_batch, the format writers) commits action "append"
_APPEND_ACTIONS = {"append"}


def _opt(options, key: str, default=None):
    # DataSource options arrive case-insensitive from SQL paths;
    # normalize so .option("startingVersion", ...) and
    # .option("startingversion", ...) both hit
    for k, v in options.items():
        if k.lower() == key.lower():
            return v
    return default


def _root(options) -> str:
    path = _opt(options, "path")
    if not path:
        raise ValueError(
            "vstore requires a store root: .load(root) or .option('path', root)"
        )
    return path


def _resolve_version(options) -> int | None:
    """The snapshot version a batch read addresses: .option("version",
    k), or .option("timestampAsOf", t) resolved through the commit
    log's recorded timestamps (Delta's TIMESTAMP AS OF; epoch seconds
    or ISO-8601, naive = UTC), or None for latest. Pure Python — runs
    in the session-less data-source worker."""
    v = _opt(options, "version")
    ts = _opt(options, "timestampAsOf")
    if ts is not None:
        if v is not None:
            raise ValueError(
                "options 'version' and 'timestampAsOf' are exclusive"
            )
        from ..versioned import version_at_timestamp

        return version_at_timestamp(_root(options), ts)
    return int(v) if v is not None else None


def _lub_schema(root: str, version: int | None) -> StructType:
    """Table LUB schema at `version` from the log alone (pure Python —
    runs in the data source worker, which has no SparkSession).
    Column-mapping-aware: renamed columns surface under their current
    logical names, dropped columns disappear."""
    from ..versioned import _column_mapping, _replay_full, _table_lub

    _, last, origin = _replay_full(root, version)
    if last is None:
        raise ValueError(f"no versioned table at {root}")
    if not origin:
        return StructType.fromJson(json.loads(last["schema"]))
    return _table_lub(origin, cmap=_column_mapping(root, version))[0]


def _evolve_table(tbl: "pa.Table", target: "pa.Schema") -> "pa.Table":
    """Arrow-side schema evolution: project `tbl` onto `target` —
    missing columns as typed nulls, widened types cast. The lattice
    was enforced at commit time (the LUB came through
    evolve.merge_schemas), so any cast here is a widening by
    construction."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    for field in target:
        if field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                if (
                    pa.types.is_timestamp(field.type)
                    and field.type.tz is not None
                    and pa.types.is_timestamp(col.type)
                    and col.type.tz is None
                ):
                    # naive parquet bytes under a tz-aware LUB: the
                    # store writes session-UTC instants, so the wall
                    # clock IS the instant
                    col = pc.assume_timezone(col, field.type.tz)
                    if col.type != field.type:
                        col = col.cast(field.type)
                else:
                    col = col.cast(field.type)
        else:
            col = pa.nulls(tbl.num_rows, type=field.type)
        cols.append(col)
    return pa.table(dict(zip(target.names, cols)), schema=target)


# ---------------------------------------------------------------------------
# batch read + pushdown pruning
# ---------------------------------------------------------------------------


def _dv_positions(
    root: str, dvs: list[str], paths: list[str]
) -> dict[str, list[int]]:
    """Deleted row positions per REL path, restricted to `paths`
    (absolute), unioned across the snapshot's live deletion-vector
    relations. Executor-side pyarrow reads with a file filter — a task
    loads only the positions of its own files."""
    if not dvs:
        return {}
    import pyarrow.parquet as pq

    rels = [os.path.relpath(p, root) for p in paths]
    out: dict[str, list[int]] = {}
    for d in dvs:
        t = pq.read_table(
            os.path.join(root, d), filters=[("file", "in", rels)]
        )
        for f, pos in zip(
            t.column("file").to_pylist(), t.column("pos").to_pylist()
        ):
            out.setdefault(f, []).append(pos)
    return out


def _drop_positions(tbl: "pa.Table", positions: list[int]) -> "pa.Table":
    """Arrow-side deletion-vector mask: drop the rows at `positions`."""
    import numpy as np
    import pyarrow as pa

    mask = np.ones(tbl.num_rows, dtype=bool)
    mask[np.asarray(positions, dtype=np.int64)] = False
    return tbl.filter(pa.array(mask))


@dataclass
class _FilesPartition(InputPartition):
    # (absolute data-file path, origin schema json) per file: one task
    # reads the whole group sequentially
    files: list


def _translate_filters(
    filters: list["Filter"],
) -> tuple[list[tuple[str, str, object]], list[str], list[tuple[str, list]]]:
    """Supported pushed filters -> (range/equality predicates in
    skip-index form, not-null columns, IN-lists). Unsupported shapes
    are simply not used for pruning (Spark re-applies everything
    anyway). `StringStartsWith(c, p)` compiles to the exact range
    `c >= p AND c < bump(p)` (`_widen_str_upper` — the same bump the
    stats writer uses for truncated maxima, so both sides widen
    identically); an `In` list prunes a file only when EVERY value is
    provably absent."""
    import datetime
    import decimal

    from pyspark.sql.datasource import In, StringStartsWith

    from ..functions.skipindex import _widen_str_upper

    _OPS = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    _LIT = (bool, int, float, str, datetime.date, datetime.datetime)

    def lit(v):
        if isinstance(v, decimal.Decimal):
            v = float(v)
        return v if isinstance(v, _LIT) else None

    preds: list[tuple[str, str, object]] = []
    notnull: list[str] = []
    ins: list[tuple[str, list]] = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:  # nested columns: no stats rows
            continue
        col = attr[0]
        if isinstance(f, IsNotNull):
            notnull.append(col)
            continue
        if isinstance(f, StringStartsWith):
            p = f.value
            if isinstance(p, str) and p:
                preds.append((col, ">=", p))
                upper = _widen_str_upper(p)
                if upper is not None:
                    preds.append((col, "<", upper))
            continue
        if isinstance(f, In):
            vals = [lit(v) for v in f.value]
            if vals and all(v is not None for v in vals):
                ins.append((col, vals))
            continue
        op = _OPS.get(type(f))
        if op is None:
            continue
        v = lit(f.value)
        if v is not None:
            preds.append((col, op, v))
    return preds, notnull, ins


def _prune_with_log_stats(
    live: list[str],
    rows: dict[str, int],
    stats: dict[str, list],
    preds: list[tuple[str, str, object]],
    notnull: list[str],
    ins: list[tuple[str, list]] = (),
) -> list[str]:
    """Pure-Python mirror of ``skipindex.prune_files`` over the log's
    per-file stats (same `_footer_stat_rows` tuples, same proof rules:
    drop only on an all-null column or a literal provably outside
    [min, max] on the matching lane; unknown NEVER drops). Files absent
    from the stats maps (pre-stats manifests) are always kept."""
    from ..functions.skipindex import _pred_value

    norm = [(c, op, *_pred_value(op, raw)) for (c, op, raw) in preds]
    norm_ins = [
        (c, [_pred_value("=", v) for v in vals]) for (c, vals) in ins
    ]
    kept = []
    for f in live:
        st = stats.get(f)
        fr = rows.get(f)
        if st is None or fr is None:
            kept.append(f)
            continue
        by_col: dict[str, list] = {}
        for row in st:
            by_col.setdefault(row[0], []).append(row)
        drop = False
        for col, op, lane, v in norm:
            for (_, kind, nulls, has, mn_n, mx_n, mn_s, mx_s) in by_col.get(
                col, []
            ):
                if nulls == fr:  # all-null: no comparison matches NULL
                    drop = True
                    break
                if not (has and kind == lane):
                    continue
                lo, hi = (mn_n, mx_n) if lane == "num" else (mn_s, mx_s)
                if lo is None or hi is None:
                    continue
                outside = {
                    "=": v < lo or v > hi,
                    "<": lo >= v,
                    "<=": lo > v,
                    ">": hi <= v,
                    ">=": hi < v,
                }[op]
                if outside:
                    drop = True
                    break
            if drop:
                break
        if not drop:
            for col in notnull:
                if any(r[2] == fr for r in by_col.get(col, [])):
                    drop = True
                    break
        if not drop:
            # an IN list drops the file only when EVERY value is
            # provably absent (all-null column proves all at once)
            for col, lanes_vals in norm_ins:
                for (_, kind, nulls, has, mn_n, mx_n, mn_s, mx_s) in (
                    by_col.get(col, [])
                ):
                    if nulls == fr:
                        drop = True
                        break
                    if not has:
                        continue
                    lo, hi = (mn_n, mx_n) if kind == "num" else (mn_s, mx_s)
                    if lo is None or hi is None:
                        continue
                    if all(
                        lane == kind and (v < lo or v > hi)
                        for lane, v in lanes_vals
                    ):
                        drop = True
                        break
                if drop:
                    break
        if not drop:
            kept.append(f)
    return kept


def _changed_files(
    root: str, frm: int, to: int | None
) -> tuple[list[tuple[str, str, str, int, str | None]], int]:
    """File-level change feed: every (rel_path, origin_schema_json,
    change, commit_version, dv_rel) for manifests in [frm, to] — added
    files are 'insert', removed files 'delete' (dv_rel None), and a
    DELETION-VECTOR commit emits one 'delete' entry per covered file
    with dv_rel set: only the rows at that dv's positions for the file
    are deletes (row-level CDC — more precise than the file-level
    delete+reinsert a rewrite produces). Origins are tracked from the
    newest CHECKPOINT below the range (checkpoint compaction may have
    deleted older manifests) so a file removed in the range is read
    under the schema its bytes were written with, even when its adding
    commit predates the range — or the log itself. Raises when the
    range's own manifests were compacted away (those changes are
    genuinely unreconstructable). Returns (entries, resolved_to)."""
    from ..versioned import _checkpoints, _manifests

    ms = _manifests(root)
    cs = _checkpoints(root)
    if not ms and not cs:
        raise ValueError(f"no versioned table at {root}")
    latest = max(ms[-1][0] if ms else 0, cs[-1][0] if cs else 0)
    to = latest if to is None else to
    if frm < 1 or to > latest or frm > to:
        raise ValueError(
            f"invalid change range [{frm}, {to}]; log spans [1, {latest}]"
        )
    # seed file origins from the newest checkpoint BEFORE the range
    # (same encoding _replay_full reads); without one, the manifest
    # chain must reach back to v1
    origin: dict[str, str] = {}
    start_after = 0
    for cv, cp in reversed(cs):
        if cv < frm:
            with open(cp) as fh:
                c = json.load(fh)
            if "file_schema" in c:
                sch = c["schemas"]
                origin = {f: sch[i] for f, i in c["file_schema"].items()}
                origin.update(
                    {f: c["schema"] for f in c["live"] if f not in origin}
                )
            else:
                origin = {f: c["schema"] for f in c["live"]}
            start_after = cv
            break
    have = {v for v, _ in ms}
    # the walk consumes EVERY manifest after the seed (pre-range ones
    # feed origin tracking), so all of them must still exist
    gaps = [v for v in range(start_after + 1, to + 1) if v not in have]
    if gaps:
        raise ValueError(
            f"change range [{frm}, {to}] needs manifests the checkpoint "
            f"compaction deleted (missing versions {gaps[:5]}"
            f"{'...' if len(gaps) > 5 else ''})"
        )
    out: list[tuple[str, str, str, int, str | None]] = []
    for v, p in ms:
        if v <= start_after:
            continue
        if v > to:
            break
        with open(p) as fh:
            m = json.load(fh)
        m_schemas = m.get("schemas") or []
        m_fschema = m.get("file_schema") or {}
        in_range = v >= frm
        for f in m.get("removed", []):
            if in_range and f in origin:
                out.append((f, origin[f], "delete", v, None))
            origin.pop(f, None)
        for f in m.get("added", []):
            s = m_schemas[m_fschema[f]] if f in m_fschema else m["schema"]
            origin[f] = s
            if in_range:
                out.append((f, s, "insert", v, None))
        if in_range and "dv" in m:
            for f in (m.get("dv_rows") or {}):
                if f in origin:
                    out.append((f, origin[f], "delete", v, m["dv"]))
    missing = [
        f
        for f, _, _, _, _ in out
        if not os.path.exists(os.path.join(root, f))
    ]
    if missing:
        raise ValueError(
            f"change feed needs data files vacuum already reclaimed: "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''}; lower "
            "vacuum aggressiveness or narrow the range"
        )
    return out, to


def _cdf_schema(root: str, frm: int, to: int | None) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField

    from ..functions.evolve import merge_schemas

    entries, _ = _changed_files(root, frm, to)
    seen: list[str] = []
    for _, s, _, _, _ in entries:
        if s not in seen:
            seen.append(s)
    if not seen:
        from ..versioned import _replay_full

        _, last, _ = _replay_full(root, to)
        base = StructType.fromJson(json.loads(last["schema"]))
    else:
        base = merge_schemas(
            [StructType.fromJson(json.loads(s)) for s in seen]
        )
    fields = list(base.fields)
    fields.append(StructField("_change", StringType(), False))
    fields.append(StructField("_commit_version", LongType(), False))
    return StructType(fields)


@dataclass
class _ChangePartition(InputPartition):
    path: str
    change: str
    version: int
    # deletion-vector relation (absolute path) when only the rows at
    # its recorded positions for this file are the change; None = the
    # whole file
    dv: str | None = None


@dataclass
class _ChangeFilesPartition(InputPartition):
    files: list  # (path, change, commit_version) triples, row-packed


class _VStoreChangeReader(DataSourceReader):
    """Batch change-feed reader: `.option("changesFrom", v)` [+
    `changesTo`] returns the file-level CDC rows with `_change` /
    `_commit_version` metadata columns — inserts are added files'
    rows, deletes are removed files' rows (an overwrite or delete
    appears as delete+insert). The KEYED minimal diff stays
    `versioned.changes_between`; this mode is for incremental
    consumers that replay row slivers without keys. Filters are not
    used for pruning here (ranges are slivers); Spark applies them
    after the scan as usual."""

    def __init__(self, options, schema: StructType):
        self._root = _root(options)
        self._schema = schema
        frm = int(_opt(options, "changesFrom"))
        to = _opt(options, "changesTo")
        self._entries, _ = _changed_files(
            self._root, frm, int(to) if to is not None else None
        )

    def partitions(self) -> Sequence[InputPartition]:
        from ..versioned import _column_mapping, _origin_clean

        # the change feed decodes files by name: refuse origins that
        # are not clean under an active column mapping (same
        # discipline + OPTIMIZE remedy as the stream readers)
        cmap = _column_mapping(self._root, None)
        if cmap is not None:
            for _f, sj, _c, _v, _dv in self._entries:
                if not _origin_clean(sj, cmap):
                    raise ValueError(
                        "vstore change feed cannot read a column-"
                        "mapped table whose files predate a rename/"
                        "drop; run optimize() to rewrite them to the "
                        "current column names"
                    )
        # see the batch reader: an empty plan must still carry one
        # (empty) task — a change range with no file churn is legal
        return [
            _ChangePartition(
                path=os.path.join(self._root, f), change=c, version=v,
                dv=(os.path.join(self._root, dv) if dv else None),
            )
            for f, _s, c, v, dv in self._entries
        ] or [_ChangePartition(path=None, change=None, version=None, dv=None)]

    def read(self, partition: _ChangePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        from pyspark.sql.types import StructType as _St

        data_fields = [
            f for f in self._schema.fields
            if f.name not in ("_change", "_commit_version")
        ]
        target = to_arrow_schema(_St(data_fields))
        if partition.path is None:
            return  # the empty-plan placeholder task
        tbl = pq.read_table(partition.path)
        if partition.dv is not None:
            # deletion-vector slice: only the rows at the dv's
            # positions for THIS file are the change
            rel = os.path.relpath(partition.path, self._root)
            pos = pq.read_table(
                partition.dv, filters=[("file", "==", rel)]
            ).column("pos").to_pylist()
            tbl = tbl.take(sorted(pos))
        evolved = _evolve_table(tbl, target)
        n = evolved.num_rows
        cols = list(evolved.columns)
        names = list(evolved.column_names)
        cols.append(pa.array([partition.change] * n, type=pa.string()))
        names.append("_change")
        cols.append(pa.array([partition.version] * n, type=pa.int64()))
        names.append("_commit_version")
        yield from pa.table(dict(zip(names, cols))).to_batches()


class _VStoreBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        from ..versioned import _replay_dvs, _replay_full, _replay_stats

        self._root = _root(options)
        self._version = _resolve_version(options)
        self._schema = schema
        live, self._rows, self._stats, last = _replay_stats(
            self._root, self._version
        )
        if last is None:
            raise ValueError(f"no versioned table at {self._root}")
        self._live = live
        _, _, self._origin = _replay_full(self._root, self._version)
        # deletion vectors of this snapshot: applied per file in the
        # executor-side read (positions masked out of the Arrow table)
        self._dvs = _replay_dvs(self._root, self._version)[0]
        self._preds: list[tuple[str, str, object]] = []
        self._notnull: list[str] = []
        self._ins: list[tuple[str, list]] = []
        rpp = _opt(options, "rowsPerPartition")
        # ~the row-count analog of spark.sql.files.maxPartitionBytes;
        # 0 = one partition per file
        self._rows_per_partition = int(rpp) if rpp is not None else 1_048_576
        if self._rows_per_partition <= 0:
            self._rows_per_partition = 1
        # column mapping: per-origin rename maps computed at PLAN time
        # from the log (zero file I/O) — read() renames each decoded
        # table to the current logical names before evolving, so
        # renamed columns surface and dropped/unresolvable fields get
        # sentinel names the target schema excludes (no-resurrection)
        from ..versioned import _column_mapping, _resolve_fields

        self._renames: dict[str, dict[str, str]] = {}
        cmap = _column_mapping(self._root, self._version)
        if cmap is not None:
            for sj in set(self._origin.values()):
                rm = {
                    fn: (
                        cur if cur is not None
                        else f"__vstore_dropped_{i}"
                    )
                    for i, (fn, _id, cur) in enumerate(
                        _resolve_fields(sj, cmap)
                    )
                }
                if any(k != v for k, v in rm.items()):
                    self._renames[sj] = rm
        # Filter-derived file pruning is OPT-IN (r11 correctness fix).
        # Spark caches the planned partition list per RELATION
        # (PythonDataSourceV2.readInfo, refreshed only when pushFilters
        # runs), so on a REUSED DataFrame or temp view a query with no
        # pushable filters silently reuses the LAST filtered query's
        # pruned file set — rows vanish. Until the engine can
        # invalidate that cache, pruning engages only when the caller
        # opts in with .option("pruneFiles", "true") and owns the
        # one-DataFrame-per-query discipline (fresh load() per query).
        # The default never bakes filter state into the plan, so any
        # reuse pattern stays exact; Spark still applies every filter
        # row-wise either way.
        self._prune_enabled = str(
            _opt(options, "pruneFiles", "false")
        ).lower() in ("true", "1")

    def pushFilters(self, filters: list["Filter"]):
        if self._prune_enabled:
            self._preds, self._notnull, self._ins = _translate_filters(
                filters
            )
        # every filter goes back to Spark: pruning is I/O-only, results
        # stay exact no matter what the stats say
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        kept = _prune_with_log_stats(
            self._live,
            self._rows,
            self._stats,
            self._preds,
            self._notnull,
            self._ins,
        )
        # Greedy row-budget packing: a 100k-file store must not become
        # 100k Python tasks. Files pack in live order until the
        # group's RECORDED row count (from the commit log — zero I/O)
        # exceeds the budget; a file with no recorded count closes its
        # own group (conservative). Budget 0 disables packing.
        budget = self._rows_per_partition
        groups: list[list] = []
        cur: list = []
        cur_rows = 0
        for f in kept:
            entry = (os.path.join(self._root, f), self._origin[f])
            n = self._rows.get(f)
            if cur and (n is None or cur_rows + n > budget):
                groups.append(cur)
                cur, cur_rows = [], 0
            cur.append(entry)
            cur_rows += budget if n is None else n
        if cur:
            groups.append(cur)
        # never an EMPTY plan: Spark's python-data-source batch path
        # calls read(None) when partitions() yields nothing (a fully
        # pruned scan — e.g. the predicate excludes every live file),
        # so plan one empty task instead
        return [_FilesPartition(files=g) for g in groups] or [
            _FilesPartition(files=[])
        ]

    def read(self, partition: _FilesPartition):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        deleted = _dv_positions(
            self._root,
            self._dvs,
            [p for p, _o in partition.files],
        )
        for path, origin in partition.files:
            tbl = pq.read_table(path)
            pos = deleted.get(os.path.relpath(path, self._root))
            if pos:
                tbl = _drop_positions(tbl, pos)
            rm = self._renames.get(origin)
            if rm:
                tbl = tbl.rename_columns(
                    [rm.get(n, n) for n in tbl.column_names]
                )
            yield from _evolve_table(tbl, target).to_batches()


# ---------------------------------------------------------------------------
# batch write
# ---------------------------------------------------------------------------


@dataclass
class _StagedFiles(WriterCommitMessage):
    rels: list  # staged file paths relative to the store root
    # aligned per-rel partition-value lists (hive strings, None for
    # NULL) when the write is partition-split; None otherwise
    parts: list | None = None


def _arrow_batch_violations(batch, constraints: dict[str, list]) -> list[str]:
    """The Arrow half of persistent table constraints (versioned.
    add_table_constraint): evaluate each constraint's parsed conjuncts
    against one RecordBatch in the session-less data-source worker.
    Semantics match the Spark enforcer exactly — a row violates only
    when the whole expression IS FALSE, so any single FALSE conjunct
    violates while NULL comparisons pass (a column the batch lacks
    evaluates NULL: comparisons pass, IS NOT NULL fails every row).
    Returns 'name(count)' strings for violated constraints."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ops = {
        "=": pc.equal, "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal,
    }
    names = set(batch.schema.names)
    out = []
    for cname, conjs in constraints.items():
        mask = None  # per-row "some conjunct is FALSE"
        for c in conjs:
            if len(c) == 2:  # ('notnull', col)
                col = c[1]
                m = (
                    pc.is_null(batch.column(col))
                    if col in names
                    else pa.array([True] * batch.num_rows)
                )
            else:
                col, op, val = c
                if col not in names:
                    continue  # NULL comparison is never FALSE
                if op == "in":
                    # pc.is_in yields FALSE (not null) for a NULL
                    # input, so inverting alone would flag NULL rows
                    # as violations; gate on validity so NULLs pass
                    # exactly like every other comparison (and like
                    # the Spark enforcer's ~coalesce(expr, True))
                    m = pc.and_(
                        pc.is_valid(batch.column(col)),
                        pc.invert(
                            pc.is_in(
                                batch.column(col),
                                value_set=pa.array(list(val)),
                            )
                        ),
                    )
                else:
                    m = pc.fill_null(
                        pc.invert(ops[op](batch.column(col), val)), False
                    )
            mask = m if mask is None else pc.or_(mask, m)
        if mask is not None and bool(pc.any(mask).as_py()):
            n_bad = pc.sum(pc.cast(mask, "int64")).as_py()
            out.append(f"{cname}({n_bad})")
    return out


def _stage_task_batches(
    root: str, tag: str, iterator, constraints: dict[str, list] | None = None,
    partition_cols: list[str] | None = None,
) -> "_StagedFiles":
    """Executor-side half of both writers: stream this task's Arrow
    batches into one staged parquet file under `.staging/<tag>/`,
    enforcing the table's persistent constraints per batch (a
    violating batch fails the task before the file is published —
    the commit never happens, same never-a-bad-version contract as
    the library paths). With `partition_cols` (a partitioned table),
    batches split by partition-value tuple into one file per tuple
    per task — the same vectorized split as the library's partitioned
    staging (`versioned._arrow_partition_groups`), so the layout
    invariant and manifest values match byte for byte."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition_cols:
        from ..versioned import _arrow_partition_groups

        writers: dict[str, tuple] = {}  # composite -> (writer, rel, pv)
        try:
            for batch in iterator:
                if constraints:
                    bad = _arrow_batch_violations(batch, constraints)
                    if bad:
                        raise ValueError(
                            "table constraint violations: "
                            + ", ".join(bad)
                        )
                if batch.num_rows == 0:
                    continue
                t = pa.Table.from_batches([batch])
                for key, sub, pv in _arrow_partition_groups(
                    t, partition_cols
                ):
                    if key not in writers:
                        rel = os.path.join(
                            ".staging", tag, f"{uuid.uuid4().hex}.parquet"
                        )
                        full = os.path.join(root, rel)
                        os.makedirs(os.path.dirname(full), exist_ok=True)
                        writers[key] = (
                            pq.ParquetWriter(full, sub.schema), rel, pv
                        )
                    writers[key][0].write_table(sub)
        finally:
            for w, _rel, _pv in writers.values():
                w.close()
        return _StagedFiles(
            rels=[rel for _w, rel, _pv in writers.values()],
            parts=[pv for _w, _rel, pv in writers.values()],
        )
    writer = None
    rel = None
    try:
        for batch in iterator:
            if constraints:
                bad = _arrow_batch_violations(batch, constraints)
                if bad:
                    raise ValueError(
                        "table constraint violations: " + ", ".join(bad)
                    )
            if writer is None:
                rel = os.path.join(
                    ".staging", tag, f"{uuid.uuid4().hex}.parquet"
                )
                full = os.path.join(root, rel)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                writer = pq.ParquetWriter(full, batch.schema)
            writer.write_batch(batch)
    finally:
        if writer is not None:
            writer.close()
    return _StagedFiles(rels=[rel] if rel else [])


def _load_constraints(root: str) -> dict[str, list]:
    """The table's constraints parsed to Arrow-evaluable conjuncts, as
    a snapshot taken when the writer is planned (a constraint added
    mid-query lands on the NEXT writer, same as any snapshot read)."""
    from ..versioned import _parse_constraint, table_constraints

    return {
        n: _parse_constraint(e) for n, e in table_constraints(root).items()
    }


def _publish_staged(
    root: str,
    staged: list[str],
    name_prefix: str,
    overwrite: bool,
    schema_json: str,
    meta: dict | None = None,
    partitioning: list[str] | None = None,
    staged_parts: dict[str, list] | None = None,
    dynamic: bool = False,
) -> None:
    """Driver-side half of both writers: move the staged files under
    data/ and publish ONE atomic manifest. A `VersionConflict`
    propagates and fails the write — the moved files are unreferenced
    orphans vacuum() reclaims, identical to the library API's crash
    story. `staged_parts` maps staged rels to their partition-value
    lists (partitioned writes); the manifest records them under the
    published names so the partition-exact DML fast path covers
    format-written files too. `dynamic` (partitionOverwriteMode):
    an overwrite removes only the files whose recorded tuple matches
    a staged tuple — Spark's dynamic INSERT OVERWRITE, metadata-only
    on the removal side (refuses over a degraded layout)."""
    from ..versioned import (
        _commit,
        _data_dir,
        _partition_extra,
        _partition_state,
        _replay,
    )

    os.makedirs(_data_dir(root), exist_ok=True)
    added = []
    file_parts: dict[str, list] = {}
    for i, rel in enumerate(sorted(staged)):
        dst = os.path.join("data", f"{name_prefix}-{i:05d}.parquet")
        shutil.move(os.path.join(root, rel), os.path.join(root, dst))
        added.append(dst)
        if staged_parts and rel in staged_parts:
            file_parts[dst] = staged_parts[rel]
    if overwrite and dynamic:
        live = _replay(root, None)[0]
        _pc, state = _partition_state(root)
        untracked = [f for f in live if f not in state]
        if untracked:
            raise ValueError(
                f"{len(untracked)} live file(s) carry no recorded "
                "partition values; run optimize() before a dynamic "
                "overwrite"
            )
        touched = {tuple(pv) for pv in file_parts.values()}
        removed = [f for f in live if tuple(state[f]) in touched]
        action = "overwrite_partitions"
    elif overwrite:
        removed = _replay(root, None)[0]
        action = "overwrite"
    else:
        removed = []
        action = "append"
    extra = _partition_extra(partitioning, file_parts) or None
    if partitioning == [] and overwrite:
        from ..versioned import table_partitioning

        if table_partitioning(root):
            # explicit un-partitioning (partitionBy='' on overwrite):
            # record the cleared layout like the library's
            # overwrite(partition_by=[]) — otherwise the old
            # declaration persists while the new live files carry no
            # tuples, permanently refusing partition-exact DML
            extra = {"partitioning": []}
    _commit(
        root,
        action,
        added,
        removed,
        schema_json,
        meta=meta,
        extra=extra,
    )


def _collect_staged_parts(messages) -> dict[str, list] | None:
    """staged rel -> partition values, merged across task messages."""
    out: dict[str, list] = {}
    for m in messages:
        if m is not None and m.parts is not None:
            out.update(dict(zip(m.rels, m.parts)))
    return out or None


def _resolve_write_partitioning(
    options, root: str, schema: StructType, overwrite: bool
) -> list[str] | None:
    """The partition layout a format write must produce — the same
    rules as the library's append/overwrite: appends inherit the
    table's declared layout (an explicit `partitionBy` option may only
    repeat it, except on a brand-new table where it declares it);
    overwrite may declare/re-declare freely ('' clears)."""
    from ..versioned import (
        _check_partition_cols,
        _checkpoints,
        _manifests,
        table_partitioning,
    )

    cur = table_partitioning(root)
    opt = _opt(options, "partitionBy")
    declared = (
        [c.strip() for c in str(opt).split(",") if c.strip()]
        if opt is not None
        else None
    )
    if declared is None:
        cols = cur
    elif overwrite:
        cols = declared
    else:
        if cur is None:
            if _manifests(root) or _checkpoints(root):
                raise ValueError(
                    "cannot declare partitioning on an existing "
                    "unpartitioned table via append; write with "
                    "mode('overwrite') to re-lay it"
                )
            cols = declared
        elif declared != list(cur):
            raise ValueError(
                f"table is partitioned by {cur}; option partitionBy "
                f"{declared} must match (or be omitted)"
            )
        else:
            cols = cur
    if cols:
        _check_partition_cols(schema, cols)
    return cols


class _VStoreWriter(DataSourceArrowWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self._root = _root(options)
        self._schema_json = schema.json()
        self._overwrite = overwrite
        self._tag = uuid.uuid4().hex[:12]
        self._constraints = _load_constraints(self._root)
        self._pcols = _resolve_write_partitioning(
            options, self._root, schema, overwrite
        )
        # Spark's partitionOverwriteMode: "dynamic" scopes an
        # overwrite to the partitions the written data carries
        pom = str(
            _opt(options, "partitionOverwriteMode", "static")
        ).lower()
        if pom not in ("static", "dynamic"):
            raise ValueError(
                f"partitionOverwriteMode must be static|dynamic, "
                f"got {pom!r}"
            )
        self._dynamic = overwrite and pom == "dynamic"
        if pom == "dynamic" and not overwrite:
            raise ValueError(
                "partitionOverwriteMode=dynamic applies to "
                "mode('overwrite') writes"
            )
        if self._dynamic and not self._pcols:
            raise ValueError(
                "partitionOverwriteMode=dynamic needs a partitioned "
                "table (or option partitionBy on first write)"
            )
        # Delta's idempotent-write options: a retried job naming the
        # same (txnAppId, txnVersion) publishes nothing the 2nd time
        app = _opt(options, "txnAppId")
        ver = _opt(options, "txnVersion")
        if (app is None) != (ver is None):
            raise ValueError(
                "pass options txnAppId AND txnVersion, or neither"
            )
        self._txn = (app, int(ver)) if app is not None else None

    def write(self, iterator: Iterator["pa.RecordBatch"]):
        return _stage_task_batches(
            self._root, self._tag, iterator, self._constraints,
            partition_cols=self._pcols,
        )

    def commit(self, messages):
        from ..versioned import txn_already_applied

        staged = [r for m in messages if m is not None for r in m.rels]
        staged_parts = _collect_staged_parts(messages)
        meta = None
        try:
            if self._txn is not None:
                app, ver = self._txn
                # checked at COMMIT time (not plan time): two racing
                # retries serialize on the version chain, and the
                # loser's VersionConflict retry re-reads this state
                if txn_already_applied(self._root, app, ver):
                    return
                meta = {"txn_app_id": app, "txn_version": ver}
            _publish_staged(
                self._root,
                staged,
                self._tag,
                self._overwrite,
                self._schema_json,
                meta=meta,
                partitioning=self._pcols,
                staged_parts=staged_parts,
                dynamic=self._dynamic,
            )
        finally:
            shutil.rmtree(
                os.path.join(self._root, ".staging", self._tag),
                ignore_errors=True,
            )

    def abort(self, messages):
        shutil.rmtree(
            os.path.join(self._root, ".staging", self._tag),
            ignore_errors=True,
        )


class _VStoreStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("vstore")``: each micro-batch commits as
    ONE atomic store version, exactly-once. The epoch's batchId rides
    the manifest meta exactly like `append_stream_batch`'s, and the
    same newest-first replay walk (`_stream_batch_replayed`) skips a
    re-delivered epoch after a crash between sink commit and
    checkpoint write — the staged files of the replay are dropped, the
    version chain carries each batch once. Pass
    ``.option("queryId", <stable string>)`` (the checkpoint path is
    the natural choice) when several queries append to one store;
    unscoped commits follow the one-stream-per-store discipline
    documented on `append_stream_batch`. Append output mode only:
    complete-mode truncation belongs to batch `overwrite`."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "vstore streaming sink supports append mode only; use "
                "batch .write.format('vstore').mode('overwrite') for "
                "snapshot swaps"
            )
        self._root = _root(options)
        self._schema_json = schema.json()
        self._query_id = _opt(options, "queryId")
        self._tag = uuid.uuid4().hex[:12]
        # constraint snapshot at query start; a constraint added while
        # the stream runs lands on the next (re)start
        self._constraints = _load_constraints(self._root)
        # partition layout snapshot at query start, same discipline: a
        # streaming sink into a partitioned store keeps the layout (so
        # the partition-exact DML fast path and compaction-free
        # partition drops stay available on stream-fed tables)
        self._pcols = _resolve_write_partitioning(
            options, self._root, schema, overwrite=False
        )

    def write(self, iterator):
        return _stage_task_batches(
            self._root, self._tag, iterator, self._constraints,
            partition_cols=self._pcols,
        )

    def commit(self, messages, batchId: int):
        from ..versioned import _stream_batch_replayed

        staged = [r for m in messages if m is not None for r in m.rels]
        staged_parts = _collect_staged_parts(messages)
        try:
            if not staged or _stream_batch_replayed(
                self._root, batchId, self._query_id
            ):
                return  # empty batch or replayed epoch: no version
            meta: dict = {"batch_id": int(batchId)}
            if self._query_id is not None:
                meta["query_id"] = self._query_id
            _publish_staged(
                self._root,
                staged,
                f"{self._tag}-b{batchId}",
                False,
                self._schema_json,
                meta=meta,
                partitioning=self._pcols,
                staged_parts=staged_parts,
            )
        finally:
            for rel in staged:
                p = os.path.join(self._root, rel)
                if os.path.exists(p):
                    os.unlink(p)

    def abort(self, messages, batchId: int):
        for m in messages:
            for rel in (m.rels if m is not None else []):
                p = os.path.join(self._root, rel)
                if os.path.exists(p):
                    os.unlink(p)


# ---------------------------------------------------------------------------
# streaming read (commit log as change feed)
# ---------------------------------------------------------------------------


class _VStoreStreamReader(DataSourceStreamReader):
    """``readStream.format("vstore")`` on the FULL (partition-based)
    stream reader API: the driver plans offsets and partitions from
    the COMMIT LOG ALONE (manifest JSON, never a data file — pinned by
    a corrupt-every-data-file planning test), and the admitted files
    are read EXECUTOR-SIDE as Arrow batches through the same per-file
    decode the batch reader uses. Contrast with PySpark's
    SimpleDataSourceStreamReader, whose contract materializes every
    streamed row on the driver via Python objects — at 100x scale that
    caps the stream at one Python process and risks driver OOM on any
    commit bigger than memory; here a 10 GB commit is just N parquet
    tasks.

    Driver-side state: one manifest-summary cache entry per version,
    loaded ONCE per stream lifetime (O(new versions) I/O per trigger,
    not O(backlog)); `commit(end)` drops entries the engine will never
    ask about again. Rate limits (maxVersionsPerTrigger /
    maxRowsPerTrigger) shape `latestOffset` against the last planned
    end, which the engine re-establishes on restart by replaying
    `partitions()` of the last logged batch — so pacing survives
    restarts. Caveat unchanged from the simple reader: under
    trigger(availableNow) the engine snapshots ONE latestOffset as
    "all available", so a capped query drains one capped batch per
    start — caps are for continuously triggered queries.

    A version range whose manifests `prune_log` already deleted raises
    (restart the query from a fresh checkpoint) instead of silently
    skipping the pruned versions — same gap discipline as the change
    feed's `_changed_files`."""

    def __init__(self, options, schema: StructType):
        self._root = _root(options)
        self._schema = schema
        sv = _opt(options, "startingVersion")
        self._starting = int(sv) if sv is not None else None
        self._ignore_changes = str(
            _opt(options, "ignoreChanges", "false")
        ).lower() in ("true", "1")
        # Delta's weaker knob: tolerate DELETE-ONLY commits (removed
        # files, nothing re-added — no duplicate risk) while still
        # failing on rewrites; ignoreChanges implies it
        self._ignore_deletes = self._ignore_changes or str(
            _opt(options, "ignoreDeletes", "false")
        ).lower() in ("true", "1")
        mv = _opt(options, "maxVersionsPerTrigger")
        self._max_versions = int(mv) if mv is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        mr = _opt(options, "maxRowsPerTrigger")
        self._max_rows = int(mr) if mr is not None else None
        if self._max_rows is not None and self._max_rows < 1:
            raise ValueError("maxRowsPerTrigger must be >= 1")
        rpp = _opt(options, "rowsPerPartition")
        # same task-packing budget as the batch reader: a deep backlog
        # of small commits must not become one Python task per file
        self._rows_per_partition = int(rpp) if rpp is not None else 1_048_576
        if self._rows_per_partition <= 0:
            self._rows_per_partition = 1
        # driver-side manifest summary cache: version -> summary dict,
        # each manifest opened ONCE per stream lifetime
        self._minfo: dict[int, dict] = {}
        self._minfo_loads = 0  # test hook: manifest-open counter
        # the end of the last planned/admitted batch — the cursor the
        # rate caps push against; None until initialOffset()/
        # partitions() establishes it
        self._last_end: int | None = None

    # -- driver-side log metadata ---------------------------------

    def _latest(self) -> int:
        from ..versioned import _manifests

        ms = _manifests(self._root)
        return ms[-1][0] if ms else 0

    def _info(self, v: int, paths: dict[int, str] | None = None) -> dict:
        """The manifest summary for version v, loaded once per stream
        lifetime. Raises the pruned-gap error when the manifest no
        longer exists — a lagging reader must fail loudly, not skip
        versions `prune_log` deleted (data loss otherwise)."""
        info = self._minfo.get(v)
        if info is not None:
            return info
        if paths is None:
            from ..versioned import _manifests

            paths = dict(_manifests(self._root))
        p = paths.get(v)
        if p is None:
            raise ValueError(
                f"vstore stream needs the manifest for version {v}, but "
                "it was deleted (prune_log retention); the intervening "
                "changes are unreconstructable — restart the query from "
                "a fresh checkpoint (or a startingVersion the log still "
                "covers)"
            )
        with open(p) as fh:
            m = json.load(fh)
        self._minfo_loads += 1
        fr = m.get("file_rows") or {}
        added = list(m.get("added", []))
        schemas = m.get("schemas") or []
        fschema = m.get("file_schema") or {}
        # per-added-file origin schema (the CDF walk tracks these) and
        # the union of their field names: the mid-stream evolution
        # guard reads names from HERE (the log), so planning never
        # opens a data file
        file_origin: dict[str, str] = {}
        origin_jsons: list[str] = []
        for f in added:
            s = schemas[fschema[f]] if f in fschema else m["schema"]
            file_origin[f] = s
            if s not in origin_jsons:
                origin_jsons.append(s)
        fields: set[str] = set()
        for s in origin_jsons:
            fields.update(
                fld["name"] for fld in json.loads(s).get("fields", [])
            )
        changes_rows = bool(m.get("removed")) or "dv" in m
        info = {
            "action": m["action"],
            "added": added,
            "added_rows": {f: int(fr.get(f, 0)) for f in added},
            "rows_total": sum(int(fr.get(f, 0)) for f in added),
            # a deletion-vector commit removes ROWS without touching
            # files: same data-changing class as removed files
            "removed": changes_rows,
            "removed_files": list(m.get("removed", [])),
            "delete_only": changes_rows and not added,
            "added_fields": fields,
            "file_origin": file_origin,
            "dv": m.get("dv"),
            "dv_rows": {
                k: int(n) for k, n in (m.get("dv_rows") or {}).items()
            },
        }
        self._minfo[v] = info
        return info

    def _infos_between(self, s: int, e: int):
        """Summaries for the dense version range (s, e], gap-checked.
        LAZY: a rate cap that bites early stops the manifest loads
        with it (one listdir per trigger at most, one manifest parse
        per version per stream lifetime)."""
        from ..versioned import _manifests

        paths: dict[int, str] | None = None
        for v in range(s + 1, e + 1):
            if v not in self._minfo and paths is None:
                paths = dict(_manifests(self._root))
            yield v, self._info(v, paths)

    def _stream_origin_schemas(self, s: int, e: int):
        """Distinct origin schema jsons of the files the range (s, e]
        touches — from cached manifest summaries, zero file I/O."""
        seen: set[str] = set()
        for _v, info in self._infos_between(s, e):
            for sj in info["file_origin"].values():
                if sj not in seen:
                    seen.add(sj)
                    yield sj

    # -- offsets ----------------------------------------------------

    def initialOffset(self) -> dict:
        if self._starting is not None:
            off = {"version": self._starting - 1}
        else:
            off = {"version": self._latest()}
        self._last_end = off["version"]
        return off

    def latestOffset(self) -> dict:
        if self._last_end is None:
            # defensive: the engine replays partitions() of the last
            # logged batch on restart (which seeds the cursor) and
            # calls initialOffset() on fresh queries — but never trust
            # call order you don't control
            self.initialOffset()
        s = self._last_end
        latest = self._latest()
        if latest <= s:
            return {"version": s}
        e = self._capped_end(s, latest)
        self._last_end = e
        return {"version": e}

    def _capped_end(self, s: int, end_v: int) -> int:
        """Admit versions (s, end_v] until a trigger cap bites. At
        least ONE version always enters the batch (a single commit
        larger than maxRowsPerTrigger must still drain — Delta's
        maxFilesPerTrigger admits its first file the same way). Added
        files absent from the log's row counts (pre-stats manifests)
        count 0 toward the row cap — the cap is a throttle, never a
        correctness surface."""
        if self._max_versions is None and self._max_rows is None:
            return end_v
        taken = 0
        rows = 0
        capped = s
        for v, info in self._infos_between(s, end_v):
            v_rows = info["rows_total"]
            if (
                taken >= 1
                and self._max_rows is not None
                and rows + v_rows > self._max_rows
            ):
                break
            taken += 1
            rows += v_rows
            capped = v
            if self._max_versions is not None and taken >= self._max_versions:
                break
            if self._max_rows is not None and rows >= self._max_rows:
                break
        return capped

    def commit(self, end: dict) -> None:
        # the engine will never ask below `end` again: drop the cache
        # tail so a long-lived stream's driver state stays O(in-flight)
        e = end.get("version", 0)
        self._minfo = {v: i for v, i in self._minfo.items() if v > e}

    # -- partition planning (driver) / reading (executors) ----------

    def _guard_commit(self, v: int, info: dict) -> None:
        """The Delta streaming-source contract: a commit that removed
        files raises unless ignoreDeletes (delete-only) / ignoreChanges
        (rewrites too) tolerates it."""
        if info["removed"] and info["action"] not in _APPEND_ACTIONS:
            tolerated = self._ignore_changes or (
                info["delete_only"] and self._ignore_deletes
            )
            if not tolerated:
                hint = (
                    "set .option('ignoreDeletes', 'true') to skip "
                    "delete-only commits"
                    if info["delete_only"]
                    else "set .option('ignoreChanges', 'true') to "
                    "stream its re-added rows (downstream may see "
                    "duplicates)"
                )
                raise ValueError(
                    f"vstore stream hit a data-changing commit "
                    f"(version {v}, action {info['action']!r}); {hint}"
                )

    def _guard_schema(self, v: int, info: dict, names: set[str]) -> None:
        """Mid-stream evolution: a commit whose files carry columns the
        planned schema lacks would silently lose data under Arrow
        projection — fail loudly (a restart re-reads the widened LUB).
        Field names come from the manifest, not the data files."""
        extra = sorted(info["added_fields"] - names)
        if extra:
            raise ValueError(
                f"store schema evolved mid-stream (version {v} added "
                f"columns {extra}); restart the query to pick up the "
                "new table schema"
            )

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from ..versioned import _column_mapping, _origin_clean

        s, e = start["version"], end["version"]
        # restart recovery: the engine replays the last logged batch's
        # partitions() before asking for new offsets, so the rate-cap
        # cursor re-seeds itself here
        if self._last_end is None or e > self._last_end:
            self._last_end = e
        if e <= s:
            return []
        # column mapping: the stream decodes files BY NAME, so a table
        # whose files are not clean under the mapping (renamed fields,
        # or a dropped-then-readded name whose old bytes would
        # resurrect) refuses loudly; OPTIMIZE rewrites files to the
        # current names, after which streaming works again
        cmap = _column_mapping(self._root, None)
        if cmap is not None:
            for sj in self._stream_origin_schemas(s, e):
                if not _origin_clean(sj, cmap):
                    raise ValueError(
                        "vstore stream source cannot read a column-"
                        "mapped table whose files predate a rename/"
                        "drop; run optimize() to rewrite them to the "
                        "current column names, then restart the query"
                    )
        names = set(self._schema.fieldNames())
        budget = self._rows_per_partition
        groups: list[list] = []
        cur: list = []
        cur_rows = 0
        for v, info in self._infos_between(s, e):
            self._guard_commit(v, info)
            self._guard_schema(v, info, names)
            for f in info["added"]:
                n = info["added_rows"].get(f) or None
                if cur and (n is None or cur_rows + n > budget):
                    groups.append(cur)
                    cur, cur_rows = [], 0
                cur.append((os.path.join(self._root, f), None))
                cur_rows += budget if n is None else n
        if cur:
            groups.append(cur)
        return [_FilesPartition(files=g) for g in groups]

    def read(self, partition: _FilesPartition):
        # EXECUTOR-side: Arrow batches straight into Spark, never
        # per-row Python. The extra-column check is defense in depth —
        # planning already proved it from the log
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        names = list(self._schema.fieldNames())
        for path, _origin in partition.files:
            tbl = pq.read_table(path)
            extra = [c for c in tbl.column_names if c not in names]
            if extra:
                raise ValueError(
                    f"store schema evolved mid-stream (file {path} "
                    f"carries columns {extra}); restart the query to "
                    "pick up the new table schema"
                )
            yield from _evolve_table(tbl, target).to_batches()


class _VStoreStreamCDFReader(_VStoreStreamReader):
    """``readStream.format("vstore").option("readChangeFeed", "true")``
    — Delta's streaming change data feed: instead of streaming only
    append commits (and failing on rewrites), EVERY commit streams as
    file-level CDC rows with `_change` ('insert'/'delete') and
    `_commit_version` metadata columns. A delete_where appears as
    deletes of the removed files' rows plus re-inserts of their
    survivors; a downstream consumer applying inserts minus deletes
    reconstructs every snapshot transition — the incremental
    replication shape that INCLUDES deletions (the reference's
    replication only ever ships upserts + explicit delete messages,
    GDCUtil.java:61-111 / the SQS delete path; this is both in one
    feed). Offsets, checkpoint replay, startingVersion, rate caps and
    the executor-parallel read all come from the plain stream reader.
    The feed walk is INCREMENTAL: the origin map (live file -> the
    schema its bytes were written under) seeds ONCE from the newest
    checkpoint at-or-below the stream's start and then advances
    version by version as batches are planned — O(new versions)
    driver work per trigger, never a re-walk of table history (the
    batch change reader's `_changed_files` re-walks by design; a
    stream paying that per trigger would be O(history) on a
    20k-manifest/day sink). Gaps (pruned manifests) and vacuumed data
    files raise instead of silently dropping deletes, and the
    mid-stream schema-evolution guard fires at PLANNING from the
    log's recorded schemas — for inserts AND for deletes of
    old-generation files."""

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema)
        # live-file origin schemas + recorded row counts AS OF version
        # `self._origin_at`; advanced incrementally by partitions()
        self._origin: dict[str, str] | None = None
        self._frows: dict[str, int] = {}
        self._origin_at = -1
        self._fields_cache: dict[str, set] = {}

    def _fields(self, schema_json: str) -> set:
        got = self._fields_cache.get(schema_json)
        if got is None:
            got = {
                fld["name"]
                for fld in json.loads(schema_json).get("fields", [])
            }
            self._fields_cache[schema_json] = got
        return got

    def _seed_origin(self, upto: int) -> None:
        """Origins + recorded row counts of the files live at version
        `upto`, seeded from the newest checkpoint at-or-below it
        (checkpoint compaction may have deleted older manifests) and
        rolled forward through the surviving manifests — the same
        tracking `_changed_files` does, paid ONCE per stream life."""
        from ..versioned import _checkpoints, _manifests

        origin: dict[str, str] = {}
        frows: dict[str, int] = {}
        start_after = 0
        for cv, cp in reversed(_checkpoints(self._root)):
            if cv <= upto:
                with open(cp) as fh:
                    c = json.load(fh)
                if "file_schema" in c:
                    sch = c["schemas"]
                    origin = {
                        f: sch[i] for f, i in c["file_schema"].items()
                    }
                    origin.update(
                        {
                            f: c["schema"]
                            for f in c["live"]
                            if f not in origin
                        }
                    )
                else:
                    origin = {f: c["schema"] for f in c["live"]}
                frows = {
                    f: int(n)
                    for f, n in (c.get("file_rows") or {}).items()
                    if f in origin
                }
                start_after = cv
                break
        paths = dict(_manifests(self._root))
        for v in range(start_after + 1, upto + 1):
            info = self._info(v, paths)
            for f in info["removed_files"]:
                origin.pop(f, None)
                frows.pop(f, None)
            origin.update(info["file_origin"])
            frows.update(info["added_rows"])
        self._origin = origin
        self._frows = frows
        self._origin_at = upto

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from ..versioned import _column_mapping, _origin_clean

        s, e = start["version"], end["version"]
        if self._last_end is None or e > self._last_end:
            self._last_end = e
        if e <= s:
            return []
        if self._origin is None or self._origin_at != s:
            # first batch of the stream's life, or an engine replay of
            # an older range: (re)seed the origin map at the range
            # start; steady state advances incrementally below
            self._seed_origin(s)
        # same column-mapping discipline as the plain stream reader:
        # the feed decodes files by name, so non-clean origins refuse
        cmap = _column_mapping(self._root, None)
        if cmap is not None:
            tracked = set(self._origin.values())
            tracked.update(self._stream_origin_schemas(s, e))
            for sj in tracked:
                if not _origin_clean(sj, cmap):
                    raise ValueError(
                        "vstore change feed cannot read a column-"
                        "mapped table whose files predate a rename/"
                        "drop; run optimize() to rewrite them to the "
                        "current column names, then restart the query"
                    )
        data_names = {
            f.name for f in self._schema.fields
            if f.name not in ("_change", "_commit_version")
        }

        def _guard(schema_json: str, v: int) -> None:
            extra = sorted(self._fields(schema_json) - data_names)
            if extra:
                raise ValueError(
                    f"store schema evolved mid-stream (version {v} "
                    f"touched columns {extra}); restart the query to "
                    "pick up the new table schema"
                )

        entries: list[tuple[str, str, int, int, str | None]] = []
        for v, info in self._infos_between(s, e):
            for f in info["removed_files"]:
                oj = self._origin.pop(f, None)
                if oj is not None:
                    _guard(oj, v)
                    entries.append(
                        (f, "delete", v, self._frows.pop(f, 0), None)
                    )
            for f in info["added"]:
                oj = info["file_origin"][f]
                _guard(oj, v)
                self._origin[f] = oj
                self._frows[f] = info["added_rows"].get(f, 0)
                entries.append((f, "insert", v, self._frows[f], None))
            if info["dv"]:
                # deletion-vector commit: row-level deletes — only the
                # dv's positions for each covered file stream
                for f, n in info["dv_rows"].items():
                    oj = self._origin.get(f)
                    if oj is not None:
                        _guard(oj, v)
                        entries.append((f, "delete", v, n, info["dv"]))
                        self._frows[f] = max(
                            0, self._frows.get(f, 0) - n
                        )
        self._origin_at = e
        missing = [
            f
            for f, _c, _v, _n, _d in entries
            if not os.path.exists(os.path.join(self._root, f))
        ]
        if missing:
            raise ValueError(
                f"change feed needs data files vacuum already "
                f"reclaimed: {missing[:3]}"
                f"{'...' if len(missing) > 3 else ''}; lower vacuum "
                "aggressiveness or restart from a fresh checkpoint"
            )
        # same row-budget task packing as the plain reader — a CDC
        # backlog of small commits never plans one task per file
        budget = self._rows_per_partition
        groups: list[list] = []
        cur: list = []
        cur_rows = 0
        for f, change, v, n, dv in entries:
            rows = n or None
            if cur and (rows is None or cur_rows + rows > budget):
                groups.append(cur)
                cur, cur_rows = [], 0
            cur.append(
                (
                    os.path.join(self._root, f),
                    change,
                    v,
                    os.path.join(self._root, dv) if dv else None,
                )
            )
            cur_rows += budget if rows is None else rows
        if cur:
            groups.append(cur)
        return [_ChangeFilesPartition(files=g) for g in groups]

    def read(self, partition: _ChangeFilesPartition):
        # executor-side CDC slivers: data columns evolved to the
        # feed's data schema + constant _change/_commit_version
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        from pyspark.sql.types import StructType as _St

        data_fields = [
            f for f in self._schema.fields
            if f.name not in ("_change", "_commit_version")
        ]
        target = to_arrow_schema(_St(data_fields))
        names = [f.name for f in data_fields]
        for path, change, version, dv in partition.files:
            tbl = pq.read_table(path)
            extra = [c for c in tbl.column_names if c not in names]
            if extra:
                raise ValueError(
                    f"store schema evolved mid-stream (file {path} "
                    f"carries columns {extra}); restart the query to "
                    "pick up the new table schema"
                )
            if dv is not None:
                rel = os.path.relpath(path, self._root)
                pos = pq.read_table(
                    dv, filters=[("file", "==", rel)]
                ).column("pos").to_pylist()
                tbl = tbl.take(sorted(pos))
            evolved = _evolve_table(tbl, target)
            n = evolved.num_rows
            cols = list(evolved.columns)
            out_names = list(evolved.column_names)
            cols.append(pa.array([change] * n, type=pa.string()))
            out_names.append("_change")
            cols.append(pa.array([version] * n, type=pa.int64()))
            out_names.append("_commit_version")
            yield from pa.table(dict(zip(out_names, cols))).to_batches()


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------


class VStoreDataSource(DataSource):
    """``format("vstore")``: batch read (time travel + pushdown file
    skipping + `changesFrom`/`changesTo` file-level change feed),
    batch write (atomic manifest commit), streaming read (version
    offsets), streaming write (exactly-once micro-batch versions).
    See module docstring."""

    @classmethod
    def name(cls) -> str:
        return "vstore"

    def schema(self):
        if self._read_change_feed():
            if _opt(self.options, "changesFrom") is not None or _opt(
                self.options, "version"
            ) is not None or _opt(self.options, "timestampAsOf") is not None:
                raise ValueError(
                    "option 'readChangeFeed' is exclusive with "
                    "'changesFrom'/'version'/'timestampAsOf'"
                )
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
            )

            base = _lub_schema(_root(self.options), None)
            return StructType(
                list(base.fields)
                + [
                    StructField("_change", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        cf = _opt(self.options, "changesFrom")
        if cf is not None:
            if _opt(self.options, "version") is not None or _opt(
                self.options, "timestampAsOf"
            ) is not None:
                raise ValueError(
                    "option 'changesFrom' is exclusive with "
                    "'version'/'timestampAsOf'"
                )
            ct = _opt(self.options, "changesTo")
            return _cdf_schema(
                _root(self.options),
                int(cf),
                int(ct) if ct is not None else None,
            )
        return _lub_schema(_root(self.options), _resolve_version(self.options))

    def _read_change_feed(self) -> bool:
        return str(
            _opt(self.options, "readChangeFeed", "false")
        ).lower() in ("true", "1")

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._read_change_feed():
            raise ValueError(
                "readChangeFeed is a streaming option; batch CDC reads "
                "use .option('changesFrom', v) [+ 'changesTo']"
            )
        if _opt(self.options, "changesFrom") is not None:
            return _VStoreChangeReader(self.options, schema)
        return _VStoreBatchReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return _VStoreWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType):
        if self._read_change_feed():
            return _VStoreStreamCDFReader(self.options, schema)
        return _VStoreStreamReader(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _VStoreStreamWriter(self.options, schema, overwrite)


def register_vstore_source(spark) -> None:
    """Make ``format("vstore")`` available on this session (and turn
    on Python-data-source filter pushdown, off by default in 4.1, so
    the log-stats file skipping actually engages)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VStoreDataSource)
