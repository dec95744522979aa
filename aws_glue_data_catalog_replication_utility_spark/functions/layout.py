"""Multi-dimensional data layout: Z-order clustering for file pruning.

A 100 TB store is read through its parquet footers first: a filter
prunes a file when the predicate cannot intersect the file's column
[min, max]. A single-column sort gives perfect pruning on that column
and NONE on any other; Z-ORDERING (the lakehouse `OPTIMIZE ZORDER BY`
maintenance op, same family as our ANN `compact` and dedup-state
compaction) interleaves the bits of several columns' rank-bucket ids so
that files end up rectangular in ALL the z-ordered dimensions — every
z-ordered column gets usable min/max locality, at the price of none of
them being perfectly sorted.

Recipe (the standard one):
1. bucket each column into 2^bits quantile buckets — boundaries come
   from one driver-side `approxQuantile` (bounded: 2^bits-1 doubles per
   column, never data-sized); rank-bucketing makes the interleave
   robust to skew and scale differences between columns;
2. build the z-value by bit-interleaving the bucket ids (pure integer
   expressions, whole-stage codegen — the bucket lookup is a balanced
   nested-CASE binary search, `bits` comparisons per row per column);
3. `repartitionByRange` on the z-value into the target file count and
   sort within partitions — one range shuffle, then each output file
   covers one compact z-range.

Everything is deterministic given the boundaries, so the whole chain
has a DuckDB twin (pinned bit-for-bit in tests), and the pruning claim
itself is asserted from the written files' parquet footers, not from
trust: a range predicate on EITHER column intersects a strict subset of
a z-ordered layout's files, while a single-column sort is all-files on
the other column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_bucket(col: Column, boundaries: list[float]) -> Column:
    """Rank-bucket id in [0, len(boundaries)]: the count of boundaries
    <= value, computed as a BALANCED nested-CASE binary search — log2
    comparisons per row, whole-stage codegen. (The first cut was a
    literal-array `aggregate` fold; higher-order functions run
    interpreted per element, and 2x255 lambda steps per row measured
    ~19s over sf0.1 lineitem vs well under a second for this tree.)
    NULLs take every ELSE branch down to bucket 0 — they cluster
    together, the useful default for pruning IS NULL probes."""
    v = col.cast("double")
    bnds = [float(b) for b in boundaries]

    def rec(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(v >= F.lit(bnds[mid - 1]), rec(mid, hi)).otherwise(
            rec(lo, mid - 1)
        )

    return rec(0, len(bnds))


def zorder_value(bucket_cols: list[Column], bits: int) -> Column:
    """Bit-interleave the bucket ids (each in [0, 2^bits)) into one
    long: column j contributes its bit i at output position
    i * n_cols + (n_cols - 1 - j) — the classic Morton / Z-curve,
    earlier-listed columns in the higher lanes."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        lc = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(lc, i).bitwiseAND(F.lit(1)), i * n + (n - 1 - j)
            )
    return z


def _zvalue_udf(boundaries: list[list[float]], bits: int):
    """Vectorized z-value: per column, bucket = count of boundaries
    <= value (numpy searchsorted side='right' — identical to
    `zorder_bucket`'s balanced-CASE count), then the Morton
    bit-interleave of `zorder_value`. Bit-equality to the expression
    lane is pinned in tests. Callers must pre-map NULL -> -inf and
    NaN -> +inf JVM-side (`_z_sanitize`): the CASE tree sends NULL to
    bucket 0 (comparisons yield NULL -> every ELSE branch) but NaN to
    the TOP bucket (Spark orders NaN greater than any double), and a
    float64 pandas Series cannot tell the two apart after Arrow
    transfer — the +/-inf encoding reproduces both exactly
    (searchsorted: -inf -> 0, +inf -> len(boundaries)).

    Why a pandas UDF here (r12, guide §4.2): the expression form
    generates a 2 x 511-node CASE tree at bits=8 whose Janino
    compilation costs ~2s PER PLAN (measured: constant in row count —
    60k rows and 600k rows both ~2.5s) and the range exchange pays it
    twice (sampling pass + shuffle pass). The UDF needs no codegen and
    evaluates the same 600k rows in milliseconds of numpy; only the
    cast-to-double key columns cross the Arrow boundary — the payload
    row stays in the JVM (guide §4.1)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bnds = [np.asarray(b, dtype=np.float64) for b in boundaries]
    n = len(bnds)

    def zval(*key_cols):
        out = np.zeros(len(key_cols[0]), dtype=np.int64)
        for j, (s, b) in enumerate(zip(key_cols, bnds)):
            v = s.to_numpy(dtype=np.float64)  # sanitized: no NULL/NaN
            bk = np.searchsorted(b, v, side="right").astype(np.int64)
            for i in range(bits):
                out |= ((bk >> i) & 1) << (i * n + (n - 1 - j))
        return pd.Series(out)

    # no type hints: the *cols variadic signature predates the hinted
    # API (hint inference rejects it); the explicit form is SCALAR
    return pandas_udf(zval, returnType="long")


def _z_sanitize(c: Column) -> Column:
    """Encode NULL/NaN for `_zvalue_udf` (see its docstring): NULL ->
    -inf (bucket 0, the CASE tree's every-ELSE path), NaN -> +inf (top
    bucket, Spark's NaN-is-greatest ordering); real +/-inf values
    already land on those buckets in both lanes."""
    d = c.cast("double")
    return (
        F.when(d.isNull(), F.lit(float("-inf")))
        .when(F.isnan(d), F.lit(float("inf")))
        .otherwise(d)
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    rel_err: float | None = None,
    z_col: str | None = None,
) -> DataFrame:
    """Return `df` re-laid-out along the Z-curve of `cols` (numeric
    columns), ready to `.write.parquet(...)` into ~`n_files` files each
    covering a compact z-range. Pass `z_col` to keep the computed
    z-value as a named output column (for tests/inspection); default
    drops it.

    One `approxQuantile` per call (driver-bounded), one range-exchange;
    the bucket/interleave math is map-side codegen. Quantile boundaries
    are approximate — that skews BUCKET POPULATIONS, never correctness:
    any boundary set yields a valid layout, and the written files'
    footer min/max (what pruning actually reads) reflect the true
    values."""
    if not cols:
        raise ValueError("zorder_layout needs at least one column")
    if bits < 1 or bits > 16:
        raise ValueError("bits must be in [1, 16]")
    for c in cols:
        if df.schema[c].dataType.simpleString() in ("string", "binary"):
            raise ValueError(
                f"zorder column {c!r} must be numeric/temporal; hash "
                f"string keys to a numeric column first (string z-order "
                f"clusters by hash and prunes only exact matches)"
            )
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    if rel_err is None:
        # must resolve FINER than the bucket spacing 1/2^bits, or
        # adjacent quantiles collapse to one sketch value and the upper
        # z bits go dark (measured: rel_err=0.01 at bits=8 halves the
        # distinct-boundary count and folds 8 cells into 2)
        rel_err = 1.0 / (4 * (1 << bits))
    cast_df = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    bnds = cast_df.stat.approxQuantile(cols, probs, rel_err)
    # vectorized z (bit-identical to the zorder_value/zorder_bucket
    # expression lane, which stays the documented/SQL-twinned form and
    # is pinned equal in tests) — see _zvalue_udf for why
    zf = _zvalue_udf([sorted(set(b)) for b in bnds], bits)
    z = zf(*[_z_sanitize(F.col(c)) for c in cols])
    name = z_col or "__z"
    # range-partition on the TOP log2(n_files) z bits (the Morton cell
    # id), not the raw z: the range sampler then places file boundaries
    # AT cell boundaries, so each file is a clean hyper-rectangle in
    # bucket space — straddle-free pruning. Rank-bucketing already
    # equalizes mass across cells, so files stay size-balanced; sorting
    # within partitions still uses the full z for row-group locality.
    import math

    k = max(1, math.ceil(math.log2(max(n_files, 2))))
    shift = max(len(cols) * bits - k, 0)
    out = (
        df.withColumn(name, z)
        .repartitionByRange(n_files, F.shiftright(F.col(name), shift))
        .sortWithinPartitions(name)
    )
    return out if z_col else out.drop(name)


def _list_data_files(d: str) -> list[str]:
    """Data files directly inside `d` (no recursion): skip dotfiles,
    `_SUCCESS`-style markers, and Hadoop `.crc` sidecars."""
    import os

    out = []
    for n in sorted(os.listdir(d)):
        p = f"{d}/{n}"
        if os.path.isfile(p) and not n.startswith((".", "_")):
            out.append(p)
    return out


def _partition_dirs(root: str) -> list[str]:
    """Leaf hive-partition dirs (`k=v[/k=v...]`) under `root`, or []
    when the store is unpartitioned (data files directly at root)."""
    import os

    leaves: list[str] = []

    def rec(d: str) -> None:
        subs = [
            n
            for n in sorted(os.listdir(d))
            if os.path.isdir(f"{d}/{n}") and "=" in n and not n.startswith(".")
        ]
        if not subs:
            if d != root:
                leaves.append(d)
            return
        for n in subs:
            rec(f"{d}/{n}")

    rec(root)
    return leaves


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_filter: str | None = None,
    sort_cols: list[str] | None = None,
    max_parallel: int = 4,
) -> dict:
    """Bin-pack a parquet store's small files — the third layout
    maintenance op (zorder = range-filter pruning, bucket = join
    co-location, compact = file-count hygiene). Streaming ingest and
    dynamic partition overwrite leave a long tail of small files; at
    100 TB that tail dominates scan planning (one task + one open per
    file) and crushes footer-pruning win rates. Compaction rewrites
    each affected partition to ceil(bytes / target_file_bytes) files.

    Scale shape: per-partition `coalesce` — a file-merge with ZERO
    shuffle exchanges (plan-asserted in tests); partitions compact
    concurrently on driver threads (Spark accepts multi-threaded job
    submission; bounded by `max_parallel`). A partition already at or
    below its target file count is SKIPPED untouched — re-running
    converges to a fixpoint (a pass's compression gains can shrink the
    byte total enough to justify one further merge) after which runs
    are no-ops and files stay byte-identical (pinned in tests).

    `partition_filter` (SQL over the hive partition columns) scopes the
    rewrite; selection uses `input_file_name()` through the reader's
    own partition pruning, so value formatting/typing in dir names is
    never re-parsed here. `sort_cols` re-sorts rows within each output
    file (compose with a prior `zorder_layout` pass to refresh z-range
    locality). Swap discipline per directory: write to a `__compact_tmp`
    sibling, then replace — same crash-safety story as
    `compact_ann_index` (tmp leftovers are ignored by readers: dotfile).

    Local-FS paths here; production would route the listing/moves
    through the object store's API — the Spark plan is unchanged.

    Returns {"compacted": {dir: (files_before, files_after)},
             "skipped": [dir, ...]}."""
    import math
    import os
    import shutil
    import threading

    from ..concurrency import run_overlapped

    if not os.path.isdir(path):
        raise ValueError(f"not a directory: {path}")
    root = os.path.abspath(path)
    pdirs = _partition_dirs(root)
    targets = pdirs if pdirs else [root]

    if partition_filter is not None:
        if not pdirs:
            raise ValueError("partition_filter on an unpartitioned store")
        sel = (
            spark.read.parquet(root)
            .where(partition_filter)
            .select(F.input_file_name())
            .distinct()
            .collect()
        )
        from urllib.parse import unquote, urlparse

        sel_dirs = {
            os.path.dirname(unquote(urlparse(r[0]).path)) for r in sel
        }
        targets = [d for d in targets if d in sel_dirs]

    compacted: dict[str, tuple[int, int]] = {}
    skipped: list[str] = []
    gate = threading.Semaphore(max(1, max_parallel))

    def compact_dir(d: str) -> None:
        files = _list_data_files(d)
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if len(files) <= n_out:
            skipped.append(os.path.relpath(d, root))
            return
        with gate:
            tmp = f"{os.path.dirname(d)}/.__compact_tmp_{os.path.basename(d)}"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            out = spark.read.parquet(d).coalesce(n_out)
            if sort_cols:
                out = out.sortWithinPartitions(*sort_cols)
            out.write.mode("overwrite").parquet(tmp)
            for f in files:
                os.remove(f)
                crc = f"{os.path.dirname(f)}/.{os.path.basename(f)}.crc"
                if os.path.exists(crc):
                    os.remove(crc)
            moved = 0
            for n in sorted(os.listdir(tmp)):
                is_data = not n.startswith((".", "_"))
                is_sidecar = n.startswith(".part") and n.endswith(".crc")
                if is_data or is_sidecar:
                    os.rename(f"{tmp}/{n}", f"{d}/{n}")
                    moved += is_data
            shutil.rmtree(tmp)
            compacted[os.path.relpath(d, root)] = (len(files), moved)

    tasks = [run_overlapped(lambda d=d: compact_dir(d)) for d in targets]
    errs = []
    for t in tasks:
        try:
            t.join()
        except Exception as e:  # noqa: BLE001 — re-raised after drain
            errs.append(e)
    if errs:
        raise errs[0]
    return {"compacted": compacted, "skipped": sorted(skipped)}


def delete_rows(
    spark,
    path: str,
    predicate: str,
    max_parallel: int = 4,
) -> dict:
    """Targeted row deletion from a parquet store — the right-to-be-
    forgotten / retention-purge maintenance op (DELETE FROM for a
    format with no transaction log). Only the FILES that actually
    contain matching rows are rewritten; every other file stays
    byte-identical (pinned in tests) — at 100 TB a delete touching one
    user's rows rewrites megabytes, not the store.

    Shape: one pruned scan finds the affected files
    (`input_file_name()` under the predicate — partition pruning and
    footer min/max skipping both apply, so a predicate on a partition
    or z-ordered column prunes the search itself); each affected file
    is rewritten in place as (its rows) MINUS (predicate rows), one
    file in -> one file out (`coalesce(1)`), concurrent across files on
    bounded driver threads. A file whose every row matches is removed
    outright. Re-running is a no-op (no file matches anymore).

    Completes the parquet maintenance suite: `snapshot_changeset`
    ships diffs, `compact_small_files` heals file counts, `delete_rows`
    retracts data. Local-FS moves here; production routes them through
    the object store's API — the Spark plan is unchanged.

    Returns {"files_rewritten": n, "files_removed": m,
             "rows_deleted": k}."""
    import os
    import shutil
    import threading
    from urllib.parse import unquote, urlparse

    from ..concurrency import run_overlapped

    root = os.path.abspath(path)
    store = spark.read.parquet(root)
    hits = (
        store.where(predicate)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return {"files_rewritten": 0, "files_removed": 0, "rows_deleted": 0}

    rewritten, removed, deleted = [], [], []
    gate = threading.Semaphore(max(1, max_parallel))

    def rewrite(uri: str, n_hit: int) -> None:
        f = unquote(urlparse(uri).path)
        with gate:
            # basePath keeps hive-partition columns visible to the
            # predicate; they live in the dir name, so drop them again
            # before writing the replacement file
            full = spark.read.option("basePath", root).parquet(f)
            part_cols = [
                c for c in full.columns
                if c not in spark.read.parquet(f).columns
            ]
            keep = full.where(
                ~F.coalesce(F.expr(predicate), F.lit(False))
            ).drop(*part_cols)
            d = os.path.dirname(f)
            tmp = f"{d}/.__delete_tmp_{os.path.basename(f)}"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            keep.coalesce(1).write.parquet(tmp)
            new = [
                n for n in os.listdir(tmp)
                if not n.startswith((".", "_"))
            ]
            os.remove(f)
            crc = f"{d}/.{os.path.basename(f)}.crc"
            if os.path.exists(crc):
                os.remove(crc)
            if new:
                kept_rows = spark.read.parquet(f"{tmp}/{new[0]}").count()
            else:
                kept_rows = 0
            if kept_rows:
                os.rename(f"{tmp}/{new[0]}", f)
                ncrc = f"{tmp}/.{new[0]}.crc"
                if os.path.exists(ncrc):
                    os.rename(ncrc, crc)
                rewritten.append(f)
            else:
                removed.append(f)
            shutil.rmtree(tmp)
            deleted.append(n_hit)

    tasks = [run_overlapped(lambda r=r: rewrite(r["f"], r["n"])) for r in hits]
    errs = []
    for t in tasks:
        try:
            t.join()
        except Exception as e:  # noqa: BLE001 — re-raised after drain
            errs.append(e)
    if errs:
        raise errs[0]
    return {
        "files_rewritten": len(rewritten),
        "files_removed": len(removed),
        "rows_deleted": int(sum(deleted)),
    }


def bucketed_layout(
    df,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
):
    """Write `df` as a hash-BUCKETED (and per-bucket sorted) parquet
    table — the shuffle-once-join-forever layout. Two tables bucketed
    on the same keys into the same bucket count sort-merge-join with
    ZERO shuffle exchanges (plan-asserted in tests): the bucket id IS
    the partitioning both sides already agree on, so a 100 TB fact
    table pays its join shuffle once at write time and never again
    across the analytics that join on that key. Equality predicates on
    the bucket column additionally prune to a single bucket's files at
    scan time (SelectedBucketsCount in the plan).

    Complements `zorder_layout`: z-order optimizes FILTER pruning
    across several range dimensions; bucketing optimizes repeated
    equi-JOINs/aggregations on one key set. path=... makes the table
    external (data at the given location); the catalog entry is what
    carries the bucket spec — Spark only trusts bucketing recorded
    there (metastore-backed in production, the session catalog here).

    Operational caveat (SPARK-32859): with the default
    autoBucketedScan rule, plans with no bucketing-aware operator read
    the table UN-bucketed and silently forfeit bucket pruning — set
    spark.sql.sources.bucketing.autoBucketedScan.enabled=false for
    filter-only workloads that want the pruning.

    Returns the re-read table DataFrame."""
    spark = df.sparkSession
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return spark.table(table)
