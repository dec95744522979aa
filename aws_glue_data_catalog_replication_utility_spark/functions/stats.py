"""Store observability: distributed parquet-footer statistics.

Before you query (or maintain) a 100 TB store you read its FOOTERS,
not its pages: row counts, per-column min/max/null-counts, file-size
distribution — everything pruning and planning feed on is already
sitting in O(files) metadata. The failure mode at scale is doing that
read on the driver (100k serial footer fetches); here the file list is
parallelized into a DataFrame and each task reads its own footers with
pyarrow inside `mapInPandas` — driver traffic is the file listing in
and the aggregated stats out, never page data.

Outputs:
- `store_stats(spark, path)` — one row per (file, column):
  file, file_bytes, file_rows, n_row_groups, column, nulls, min_s /
  max_s (stringified footer stats; None when the writer skipped them).
  Column-level rows are pinned bit-exact against DuckDB's
  `parquet_metadata()` in tests.
- `store_summary(spark, path, target_file_bytes)` — the maintenance
  dashboard: file/row/byte totals, file-size histogram anchors
  (min/p50/max), and `advice` flags the layout ops answer —
  'compact' when the small-file tail dominates (median file under half
  target), 'collect_stats' when footers lack min/max (no pruning
  possible).

Reference tie-in: the reference reports replication health by audit
row counts (DDBUtil.java status items); this is the same observability
posture pointed at the data plane's physical layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_STATS_SCHEMA = (
    "file string, file_bytes long, file_rows long, n_row_groups int, "
    "column string, nulls long, min_s string, max_s string"
)


def _file_list(path: str) -> list[tuple[str, int]]:
    import os

    out = []
    for base, _, files in os.walk(path):
        for n in files:
            if n.startswith((".", "_")):
                continue
            p = os.path.join(base, n)
            out.append((p, os.path.getsize(p)))
    if not out:
        raise ValueError(f"no data files under {path}")
    return sorted(out)


def store_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-(file, column) footer statistics, read DISTRIBUTED: the file
    list becomes a DataFrame, each task opens its own footers with
    pyarrow. min/max arrive stringified (type-faithful rendering of
    what the footer stores); nulls is the summed null count across row
    groups; None min/max = the writer wrote no stats for that column
    (exactly what `store_summary` flags)."""
    files = _file_list(path)
    n_slices = min(len(files), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame(
        files, "file string, file_bytes long"
    ).repartition(n_slices)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f, fb in zip(pdf["file"], pdf["file_bytes"]):
                md = pq.read_metadata(f)
                names = md.schema.names
                agg: dict[str, list] = {
                    n: [0, None, None, False] for n in names
                }  # nulls, min, max, has_stats
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if name not in agg:  # nested leaves
                            agg[name] = [0, None, None, False]
                        st = c.statistics
                        if st is None:
                            continue
                        a = agg[name]
                        a[3] = True
                        if st.null_count is not None:
                            a[0] += st.null_count
                        if st.has_min_max:
                            mn, mx = st.min, st.max
                            a[1] = mn if a[1] is None else min(a[1], mn)
                            a[2] = mx if a[2] is None else max(a[2], mx)
                for name, (nulls, mn, mx, has) in agg.items():
                    rows.append((
                        f, int(fb), md.num_rows, md.num_row_groups, name,
                        int(nulls) if has else None,
                        None if mn is None else str(mn),
                        None if mx is None else str(mx),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "file_bytes", "file_rows", "n_row_groups",
                    "column", "nulls", "min_s", "max_s",
                ],
            )

    return fdf.mapInPandas(read_footers, _STATS_SCHEMA)


def store_summary(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    dv_purge_fraction: float = 0.05,
) -> dict:
    """Maintenance dashboard over `store_stats`: totals, file-size
    spread, per-column null totals and stats coverage, and `advice` —
    'compact' (median file under target/2: the small-file tail),
    'no_minmax:<col>' per column whose footers carry no min/max
    (nothing for pruning to read), and — when `path` is a VERSIONED
    store root — 'purge_dvs' when deletion-vector masks cover at
    least `dv_purge_fraction` of the live rows (the read-side
    anti-join debt the maintenance loop should retire with
    `optimize(purge_dvs=True)`, the same way the small-file median
    flags 'compact'). Driver receives O(files + columns) aggregated
    rows only; the dv fraction comes from the commit log's metadata
    alone."""
    import os as _os

    dv_deleted = dv_fraction = None
    stats_path = path
    if _os.path.isdir(_os.path.join(path, "_txlog")):
        # versioned store root: footers live under data/ (walking the
        # root would read manifests and dv relations as data), and the
        # dv debt is answered from the log without opening a file
        from .. import versioned as _V

        live, rows, _, last = _V._replay_stats(path, None)
        if last is not None:
            _dvl, cnt = _V._replay_dvs(path, None)
            live_set = set(live)
            dv_deleted = int(
                sum(c for f, c in cnt.items() if f in live_set)
            )
            known = sum(rows[f] for f in live if f in rows)
            dv_fraction = dv_deleted / known if known else 0.0
        stats_path = _os.path.join(path, "data")
    st = store_stats(spark, stats_path)
    per_file = st.groupBy("file").agg(
        F.first("file_bytes").alias("bytes"),
        F.first("file_rows").alias("rows"),
    )
    fagg = per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.sum("rows").alias("total_rows"),
        F.min("bytes").alias("min_file_bytes"),
        F.expr("percentile_approx(bytes, 0.5)").alias("p50_file_bytes"),
        F.max("bytes").alias("max_file_bytes"),
    ).collect()[0]
    cols = st.groupBy("column").agg(
        F.sum("nulls").alias("nulls"),
        F.sum(
            (F.col("min_s").isNotNull()).cast("long")
        ).alias("files_with_minmax"),
        F.count(F.lit(1)).alias("files"),
    ).collect()

    advice = []
    if (
        fagg["n_files"] > 1
        and fagg["p50_file_bytes"] < target_file_bytes / 2
    ):
        advice.append("compact")
    for c in sorted(cols, key=lambda r: r["column"]):
        if c["files_with_minmax"] == 0:
            advice.append(f"no_minmax:{c['column']}")
    if dv_deleted and dv_fraction >= dv_purge_fraction:
        advice.append("purge_dvs")

    out_dv = (
        {"dv_deleted_rows": dv_deleted, "dv_fraction": dv_fraction}
        if dv_deleted is not None
        else {}
    )
    return {
        **out_dv,
        "n_files": fagg["n_files"],
        "total_bytes": int(fagg["total_bytes"]),
        "total_rows": int(fagg["total_rows"]),
        "min_file_bytes": int(fagg["min_file_bytes"]),
        "p50_file_bytes": int(fagg["p50_file_bytes"]),
        "max_file_bytes": int(fagg["max_file_bytes"]),
        "columns": {
            c["column"]: {
                "nulls": int(c["nulls"]) if c["nulls"] is not None else None,
                "files_with_minmax": int(c["files_with_minmax"]),
                "files": int(c["files"]),
            }
            for c in cols
        },
        "advice": advice,
    }
