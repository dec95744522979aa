"""File-skipping index: prune the FILE LIST before the scan opens a file.

Spark's parquet reader already prunes ROW GROUPS from footer min/max —
but it still lists, opens, and footer-reads every file of the store on
every query. At 100 TB / 100k files that is 100k opens to answer a
predicate that touches three files. The lakehouse answer (Delta/Iceberg
data-skipping stats, Hudi col-stats index) is to persist the footer
min/max ONCE as an index relation and intersect predicates against it
at plan time; this module is that answer for the plain-parquet store:

- `build_skip_index(spark, path)` — one distributed footer pass
  (pyarrow inside `mapInPandas`, same shape as `functions/stats.py`:
  the file list is a DataFrame, tasks read their own footers, driver
  traffic is O(files x columns) index rows, never page data). TYPED
  min/max: numeric/temporal/bool land in a double lane (ints wider
  than 2^53 are widened OUTWARD with nextafter so float rounding can
  only keep extra files, never wrongly drop one), strings in a string
  lane truncated to a bounded prefix (again: truncation widens the
  max, keeps extra files, never drops).
- `prune_files(index, predicates)` — the kept-file relation for an
  AND-list of (column, op, literal) predicates, op in
  < <= = >= > . A file is dropped only when the index PROVES no row
  can match: literal outside [min, max], or the column is all-null in
  that file (comparisons never match NULL). Missing stats keep the
  file. Pure DataFrame ops over the index.
- `scan_with_skip_index(spark, index, predicates, ...)` — reads ONLY
  the kept files and re-applies the predicates as a residual filter,
  so the result is bit-identical to full-scan-plus-filter by
  construction (pruning is an optimization, the filter is the truth).

The kept file list is collected to the driver — O(files) metadata,
exactly what Spark's own FileIndex materializes on every scan; the
index turns that from "open every footer" into "one filter on an
already-built relation".

Reference tie-in: the reference's own read path narrows work by
catalog partition listing (GDCUtil partition batches); this is the
same narrowing applied one level lower, at the file/statistics plane.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

_INDEX_SCHEMA = (
    "file string, file_rows long, column string, kind string, "
    "nulls long, has_minmax boolean, "
    "min_num double, max_num double, min_str string, max_str string"
)

_OPS = ("<", "<=", "=", ">=", ">")

# string-lane stats keep a bounded prefix; the max prefix is bumped so
# truncation can only WIDEN the range (parquet writers do the same)
_STR_PREFIX = 64


def _widen_down(x: float) -> float:
    return math.nextafter(x, -math.inf)


def _widen_up(x: float) -> float:
    return math.nextafter(x, math.inf)


def _num_bounds(mn, mx) -> tuple[float, float]:
    """Convert typed footer min/max to a double interval that CONTAINS
    the true values: exact when the double conversion is exact, widened
    one ulp outward when it cannot be (int > 2^53, Decimal)."""
    lo, hi = float(mn), float(mx)
    if not isinstance(mn, float) and mn != lo:
        lo = _widen_down(lo)
    if not isinstance(mx, float) and mx != hi:
        hi = _widen_up(hi)
    return lo, hi


def build_skip_index(spark: SparkSession, path: str) -> DataFrame:
    """One row per (file, column) with typed pruning stats. Kinds:
    'num' (ints, floats, decimals, bools, timestamps/dates -> epoch
    micros/days as double, conservatively widened), 'str' (bounded
    prefix), 'none' (binary/nested: present for null accounting only).
    `has_minmax` false = writer wrote no stats = never prune on it.

    The returned index is MATERIALIZED (localCheckpoint) — a VALUE,
    not a recompute recipe: later storage mutations (a file deleted
    after this build) can never invalidate it mid-action. The footer
    pass runs exactly once, at build time, which is what an index
    build means anyway."""
    from .stats import _file_list

    return _materialize(_index_files(spark, [f for f, _ in _file_list(path)]))


def _materialize(index: DataFrame) -> DataFrame:
    """Pin an index relation as a value: the footer-pass leg must never
    re-execute on a later action (the files it read may be gone by
    then). localCheckpoint(eager) computes it NOW and leaves a
    LogicalRDD leaf that carries real size stats (joins against it
    still broadcast on Spark 4)."""
    return index.localCheckpoint(eager=True)


def _widen_str_upper(s: str) -> str | None:
    """A string strictly greater than every string with prefix `s`:
    bump the last bump-able char, drop the tail (parquet writers'
    truncate-and-increment). Bumping skips the UTF-16 surrogate gap —
    U+D7FF increments to U+E000, never to the lone surrogate U+D800,
    which Arrow/UTF-8 cannot encode (the build would crash on valid
    data, the exact failure this widening path exists to avoid). None
    when every char is U+10FFFF — no finite upper bound exists at this
    prefix length."""
    for i in range(len(s) - 1, -1, -1):
        c = ord(s[i])
        if c == 0xD7FF:
            return s[:i] + chr(0xE000)
        if c < 0x10FFFF:
            return s[:i] + chr(c + 1)
    return None


def _footer_stat_rows(path: str) -> tuple[int, list[tuple]]:
    """Per-file footer statistics — the ONE code path shared by the
    distributed index build (mapInPandas worker) and the versioned
    store's commit-time stats recording (Delta-style stats in the
    log), so a log-sourced index relation is value-identical to a
    footer-sourced one by construction. Returns (num_rows, [(column,
    kind, nulls, has_minmax, min_num, max_num, min_str, max_str),
    ...]) with the same widening discipline as always: numeric bounds
    widened OUTWARD, truncated string maxima bumped past the surrogate
    gap — may keep extra files, can never wrongly drop."""
    import datetime
    import decimal

    import pyarrow.parquet as pq

    def classify(v):
        if isinstance(v, bool):
            return "num", float(v)
        if isinstance(v, int):
            return "num", None  # exactness handled via _num_bounds
        if isinstance(v, float):
            return "num", v
        if isinstance(v, decimal.Decimal):
            return "num", None
        if isinstance(v, datetime.datetime):
            return "ts", None
        if isinstance(v, datetime.date):
            return "date", None
        if isinstance(v, str):
            return "str", None
        return "none", None

    def to_micros(v: datetime.datetime) -> int:
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        epoch = datetime.datetime(1970, 1, 1)
        return round((v - epoch).total_seconds() * 1_000_000)

    md = pq.read_metadata(path)
    agg: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            a = agg.setdefault(name, [0, None, None, False])
            st = c.statistics
            if st is None:
                continue
            if st.null_count is not None:
                a[0] += st.null_count
            if st.has_min_max:
                a[3] = True
                mn, mx = st.min, st.max
                a[1] = mn if a[1] is None else min(a[1], mn)
                a[2] = mx if a[2] is None else max(a[2], mx)
    out: list[tuple] = []
    for name, (nulls, mn, mx, has) in agg.items():
        kind, _ = classify(mn) if has else ("none", None)
        min_num = max_num = min_str = max_str = None
        if has and kind == "ts":
            kind = "num"
            min_num = float(to_micros(mn))
            max_num = float(to_micros(mx))
        elif has and kind == "date":
            kind = "num"
            epoch = datetime.date(1970, 1, 1)
            min_num = float((mn - epoch).days)
            max_num = float((mx - epoch).days)
        elif has and kind == "num":
            min_num, max_num = _num_bounds(mn, mx)
        elif has and kind == "str":
            min_str = mn[:_STR_PREFIX]
            max_str = mx[:_STR_PREFIX]
            if len(mx) > _STR_PREFIX:
                # widen: truncated max must stay an upper bound -> bump
                # the last bump-able char and drop the tail; if EVERY
                # prefix char is U+10FFFF no finite bound exists —
                # record no min/max (nulls stay) instead of failing the
                # whole build on adversarial data
                widened = _widen_str_upper(max_str)
                if widened is None:
                    kind, has = "none", False
                    min_str = max_str = None
                else:
                    max_str = widened
        elif has:
            kind = "none"
            has = False
        out.append((
            name, kind if has else "none", int(nulls), bool(has),
            min_num, max_num, min_str, max_str,
        ))
    return int(md.num_rows), out


def _index_files(spark: SparkSession, files: list[str]) -> DataFrame:
    """The distributed footer pass over an explicit file list — shared
    by full build and incremental update."""
    if not files:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    n_slices = min(len(files), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(n_slices)

    def read_footers(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                n_rows, stats = _footer_stat_rows(f)
                rows.extend((f, n_rows, *s) for s in stats)
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "file_rows", "column", "kind", "nulls",
                    "has_minmax", "min_num", "max_num", "min_str",
                    "max_str",
                ],
            )

    return fdf.mapInPandas(read_footers, _INDEX_SCHEMA)


def _pred_value(op: str, v):
    import datetime

    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    if isinstance(v, bool):
        return "num", float(v)
    if isinstance(v, (int, float)):
        return "num", v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return "num", (v - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6
    if isinstance(v, datetime.date):
        return "num", float((v - datetime.date(1970, 1, 1)).days)
    if isinstance(v, str):
        return "str", v
    raise ValueError(f"unsupported predicate literal type: {type(v)}")


def _per_file_drop_flags(
    index: DataFrame, predicates: list[tuple[str, str, object]]
) -> DataFrame:
    """One row per indexed file with a __d<i> flag per predicate (1 =
    that predicate PROVABLY excludes the file). ONE hash aggregation
    computes every predicate's flag (r12, guide §2.4 — the previous
    form ran one groupBy per predicate and intersected survivors with
    a join chain: p exchanges + p-1 joins for the same decision).
    Drop is proof-driven per predicate: all-null file (nulls ==
    file_rows: no comparison matches NULL), or the literal falls
    outside the file's [min, max] on the matching lane. A predicate
    over a column with kind mismatch / absent stats / absent column
    keeps the file (unknown never drops)."""
    aggs = [F.first("file_rows").alias("file_rows")]
    for i, (col, op, raw) in enumerate(predicates):
        if op == "in":
            # IN-list: drop only when EVERY value is provably outside
            # the file's bounds (the row matches if ANY value does);
            # mixed-lane lists raise — they cannot all be provable on
            # one lane and a silent partial proof would be a lie
            vals = list(raw)
            if not vals:
                raise ValueError(f"empty IN list for column {col!r}")
            lanes_vs = [_pred_value("=", v) for v in vals]
            lanes = {la for la, _ in lanes_vs}
            if len(lanes) > 1:
                raise ValueError(
                    f"IN list for {col!r} mixes value lanes {sorted(lanes)}"
                )
            lane = next(iter(lanes))
        else:
            lane, v = _pred_value(op, raw)
        is_col = F.col("column") == col
        all_null = F.col("nulls") == F.col("file_rows")
        lo = F.col("min_num") if lane == "num" else F.col("min_str")
        hi = F.col("max_num") if lane == "num" else F.col("max_str")
        if op == "in":
            outside = None
            for _, vv in lanes_vs:
                o = (F.lit(vv) < lo) | (F.lit(vv) > hi)
                outside = o if outside is None else outside & o
        else:
            lit = F.lit(v)
            if op == "=":
                outside = (lit < lo) | (lit > hi)
            elif op == "<":
                outside = lo >= lit
            elif op == "<=":
                outside = lo > lit
            elif op == ">":
                outside = hi <= lit
            else:  # >=
                outside = hi < lit
        provable = all_null | (
            F.col("has_minmax")
            & (F.col("kind") == lane)
            & lo.isNotNull()
            & hi.isNotNull()
            & outside
        )
        # a file is dropped iff SOME index row of this column proves it
        aggs.append(
            F.max(F.when(is_col & provable, 1).otherwise(0)).alias(f"__d{i}")
        )
    return index.groupBy("file").agg(*aggs)


def _keep_condition(n_predicates: int) -> F.Column:
    cond = F.lit(True)
    for i in range(n_predicates):
        cond = cond & (F.col(f"__d{i}") == 0)
    return cond


def prune_files(
    index: DataFrame, predicates: list[tuple[str, str, object]]
) -> DataFrame:
    """Kept-file relation (file, file_rows) for AND-ed predicates —
    the survivors of every predicate's proof-driven drop, intersected
    (see _per_file_drop_flags). One hash aggregation total."""
    if not predicates:
        return index.select("file", "file_rows").distinct()
    return (
        _per_file_drop_flags(index, predicates)
        .where(_keep_condition(len(predicates)))
        .select("file", "file_rows")
    )


def _residual(predicates: list[tuple[str, str, object]]) -> F.Column | None:
    cond = None
    for col, op, v in predicates:
        c = F.col(col)
        if op == "in":
            e = c.isin(list(v))
        else:
            lit = F.lit(v)
            e = {
                "<": c < lit,
                "<=": c <= lit,
                "=": c == lit,
                ">=": c >= lit,
                ">": c > lit,
            }[op]
        cond = e if cond is None else cond & e
    return cond


def _schema_from_index(spark: SparkSession, index: DataFrame):
    """Recover the store schema from any indexed file, for the
    all-pruned empty-result path. An EMPTY index (fresh store, no
    files) has no schema to recover — raise a descriptive error
    instead of the bare AttributeError `.first().file` used to throw
    (ADVICE r09)."""
    row = index.select("file").first()
    if row is None:
        raise ValueError(
            "skip index covers no files; pass schema= explicitly to "
            "scan an empty store"
        )
    return spark.read.parquet(row.file).schema


def scan_with_skip_index(
    spark: SparkSession,
    index: DataFrame,
    predicates: list[tuple[str, str, object]],
    schema=None,
    bloom: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Read ONLY the files the index cannot rule out, then re-apply the
    predicates as a residual filter — bit-identical to full-scan-plus-
    filter by construction. Returns (df, info) with info = files kept /
    total. When every file is pruned an empty DataFrame with the
    store's schema is returned (pass `schema` to skip the one-footer
    schema read).

    `bloom` (a build_bloom_index relation) additionally prunes on the
    `=` predicates' VALUES — the lane for scattered high-cardinality
    columns whose min/max prove nothing; both layers intersect."""
    # ONE collect serves both the total and the kept set (r12, guide
    # §5/§2.4: the previous form ran a distinct-count job for the total
    # plus a separate collect over a per-predicate groupBy+join chain);
    # the per-file relation is O(files) rows — already the driver
    # footprint the kept list implied.
    if predicates:
        flagged = _per_file_drop_flags(index, predicates).collect()
        total = len(flagged)
        kc = [r.file for r in flagged if all(
            r[f"__d{i}"] == 0 for i in range(len(predicates))
        )]
    else:
        kc = [r.file for r in index.select("file", "file_rows").distinct().collect()]
        total = len(kc)
    if bloom is not None:
        eqs = [(c, v) for (c, op, v) in predicates if op == "="]
        if eqs:
            dropped = {
                r.file for r in bloom_dropped_files(bloom, eqs).collect()
            }
            kc = [f for f in kc if f not in dropped]
        for c, op, vals in predicates:
            if op != "in":
                continue
            # IN through the bloom = the join-probe semantics with a
            # literal value relation: drop a file only when EVERY
            # listed value is provably absent (a row matches if ANY
            # value does) — exactly bloom_dropped_files_for_join
            probes = spark.createDataFrame([(v,) for v in vals], ["v"])
            dropped = {
                r.file
                for r in bloom_dropped_files_for_join(
                    bloom, c, probes, "v"
                ).collect()
            }
            kc = [f for f in kc if f not in dropped]
    kept = kc
    info = {"files_total": int(total), "files_kept": len(kept)}
    if not kept:
        if schema is None:
            schema = _schema_from_index(spark, index)
        df = spark.createDataFrame([], schema)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*kept)
    cond = _residual(predicates)
    return (df if cond is None else df.where(cond)), info


def update_skip_index(
    spark: SparkSession, path: str, index: DataFrame
) -> tuple[DataFrame, dict]:
    """Incremental index maintenance: refresh `index` against the
    store's CURRENT file list — footer-read ONLY the new files, drop
    rows of deleted files, keep everything else untouched (their
    footers are immutable once written; parquet files never change in
    place in this engine's write discipline). Returns (new_index,
    {"added": n, "removed": n, "kept": n}).

    The file-list diff is O(files) driver metadata — the same listing
    every build does; the update's footer I/O is O(new files), which
    is the point: a daily append to a 100k-file store re-reads dozens
    of footers, not 100k. Result proven bit-identical to a fresh
    rebuild in tests.

    The returned index is MATERIALIZED (localCheckpoint, eager): the
    new files' footers are read exactly once, HERE, and the result is
    a value. Returning the lazy union instead was a real defect — the
    footer-pass leg re-executed on every downstream action, so a file
    deleted later (the exact lifecycle this function maintains)
    crashed any action on a PREVIOUSLY returned index, including the
    next update's own file-list collect."""
    from .stats import _file_list

    now = {f for f, _ in _file_list(path)}
    have = {r.file for r in index.select("file").distinct().collect()}
    added = sorted(now - have)
    removed = sorted(have - now)
    kept = index
    if removed:
        rm = spark.createDataFrame([(f,) for f in removed], "file string")
        kept = index.join(rm, on="file", how="left_anti")
    out = _materialize(kept.unionByName(_index_files(spark, added)))
    return out, {
        "added": len(added),
        "removed": len(removed),
        "kept": len(have) - len(removed),
    }


# ---------------------------------------------------------------------------
# Bloom file index: equality skipping for SCATTERED columns. Footer
# min/max prunes range-laid data; a high-cardinality column whose values
# spray across every file (user ids, hashes) has min/max spanning the
# whole domain in every file — the index above can prove nothing. A
# per-(file, column) Bloom filter answers "is value v definitely absent
# from this file" for `=` predicates: the Iceberg/Hudi bloom-index idea
# for the plain-parquet store. Build cost reads the indexed COLUMNS
# (column-pruned pyarrow reads, not whole rows) once; ~m_bits/8 bytes
# per (file, column) of index. False positives only ever KEEP a file —
# the residual filter keeps results exact by construction.
# ---------------------------------------------------------------------------

_BLOOM_SCHEMA = (
    "file string, column string, lane string, m_bits int, k int, "
    "n_values long, bits array<long>"
)


def _bloom_canon(value) -> tuple[str, str]:
    """(lane, canonical-repr) of a value for bloom hashing. The
    contract a bloom filter's DROP verdict rests on: two values that
    Spark's `=` (with its implicit numeric/temporal coercions) could
    consider equal MUST canonicalize identically — otherwise the index
    falsely proves absence and prunes a file that holds matches (the
    silent-wrong-results failure str(value) had: build hashed
    pyarrow's `100.0` float repr while the probe hashed the literal
    `100`). Values that merely COLLIDE only ever keep extra files.

    Lanes: 'num' (bool/int/float/decimal, one shared repr: integral
    values within 2^53 print as exact ints, everything else as the
    float shortest-round-trip — large ints collide at float precision,
    mirroring Spark's own bigint<->double comparison cast), 'tme'
    (timestamps AND dates on one exact epoch-micros line, because
    Spark coerces date = timestamp), 'str', 'bin'."""
    import datetime
    import decimal

    if isinstance(value, bool):
        return "num", "1" if value else "0"
    if isinstance(value, (int, float, decimal.Decimal)):
        try:
            f = float(value)
        except OverflowError:
            f = math.inf if value > 0 else -math.inf
        if not math.isfinite(f) and not isinstance(value, float):
            # beyond double range (int raises OverflowError above;
            # Decimal.__float__ silently returns ±inf): exact decimal
            # repr, so equal exact values canonicalize identically and
            # distinct huge values don't all collide on 'inf'. Route
            # ints through Decimal — format(int, 'f') converts through
            # float and re-raises the OverflowError this branch exists
            # to handle (ADVICE r09). A double literal can never equal
            # these, so no cross-type lane unification is lost.
            dec = (
                value
                if isinstance(value, decimal.Decimal)
                else decimal.Decimal(value)
            )
            # format(…, 'f') is exact (normalize() would ROUND to the
            # 28-digit context precision, colliding distinct ints);
            # strip fractional trailing zeros so 1E+400 == 10**400
            s = format(dec, "f")
            if "." in s:
                s = s.rstrip("0").rstrip(".")
            return "num", s
        if math.isfinite(f) and f == int(f) and abs(f) <= 2.0**53:
            return "num", repr(int(f))
        return "num", repr(f)
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        td = value - datetime.datetime(1970, 1, 1)
        micros = (
            td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
        )
        return "tme", repr(micros)
    if isinstance(value, datetime.date):
        days = (value - datetime.date(1970, 1, 1)).days
        return "tme", repr(days * 86_400_000_000)
    if isinstance(value, str):
        return "str", value
    if isinstance(value, (bytes, bytearray)):
        return "bin", bytes(value).hex()
    raise ValueError(f"unsupported bloom value type: {type(value)}")


def _bloom_positions(canon: str, m_bits: int, k: int) -> list[int]:
    """k bit positions via double hashing over the md5 of the
    CANONICAL utf-8 repr (`_bloom_canon`). The SAME Python runs at
    build (executors) and probe (driver), so cross-engine hash
    reproducibility never enters the contract."""
    import hashlib

    h = hashlib.md5(canon.encode("utf-8")).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:16], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def build_bloom_index(
    spark: SparkSession,
    path: str,
    columns: list[str],
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """One Bloom filter per (file, column): distributed column-pruned
    reads (each task pyarrow-reads ONLY the indexed columns of its own
    files), bitset packed into int64 words. Columns absent from a file
    produce no row (unknown never prunes). NULLs are skipped (a NULL
    never matches `=`). Materialized like the min/max index — a value,
    not a recompute recipe."""
    from .stats import _file_list

    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    files = [f for f, _ in _file_list(path)]
    return _materialize(_bloom_files(spark, files, columns, m_bits, k))


def _bloom_files(
    spark: SparkSession,
    files: list[str],
    columns: list[str],
    m_bits: int,
    k: int,
) -> DataFrame:
    """The distributed hash pass over an explicit file list — shared by
    full build and incremental update."""
    if not files:
        return spark.createDataFrame([], _BLOOM_SCHEMA)
    cols = list(columns)
    mb, kk = int(m_bits), int(k)
    n_slices = min(len(files), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(n_slices)

    def build(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        # the build hashes the SAME canonical repr the probe side does
        # (_bloom_canon/_bloom_positions are module functions pickled
        # by reference — one code path, no drift)
        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                schema_names = set(pq.read_schema(f).names)
                want = [c for c in cols if c in schema_names]
                if not want:
                    continue
                t = pq.read_table(f, columns=want)
                for c in want:
                    vals = {
                        v for v in t.column(c).to_pylist() if v is not None
                    }
                    lane = None
                    words = [0] * (mb // 64)
                    for v in vals:
                        vl, canon = _bloom_canon(v)
                        if lane is None:
                            lane = vl
                        elif lane != vl:
                            raise ValueError(
                                f"mixed value lanes in {f}:{c}: "
                                f"{lane} vs {vl}"
                            )
                        for p in _bloom_positions(canon, mb, kk):
                            words[p // 64] |= 1 << (p % 64)
                    signed = [
                        w - (1 << 64) if w >= (1 << 63) else w for w in words
                    ]
                    rows.append(
                        (f, c, lane or "none", mb, kk, len(vals), signed)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "column", "lane", "m_bits", "k", "n_values",
                    "bits",
                ],
            )

    return fdf.mapInPandas(build, _BLOOM_SCHEMA)


def update_bloom_index(
    spark: SparkSession, path: str, bloom: DataFrame
) -> tuple[DataFrame, dict]:
    """Incremental bloom maintenance, mirroring `update_skip_index`:
    hash ONLY the new files' columns (under the existing relation's own
    m_bits/k/column config — mixed configs would silently weaken
    probes), drop deleted files' rows, keep the rest untouched.
    Returns (new_bloom, {"added", "removed", "kept"}); result proven
    bit-identical to a fresh rebuild in tests. The returned relation is
    a materialized VALUE (same discipline as the min/max index)."""
    from .stats import _file_list

    if "lane" not in bloom.columns:
        raise ValueError(
            "bloom relation has no 'lane' column — built by an older "
            "version whose value hashing was type-unstable; rebuild "
            "with build_bloom_index"
        )
    cfgs = bloom.select("m_bits", "k").distinct().collect()
    if len(cfgs) != 1:
        raise ValueError(
            f"bloom relation carries {len(cfgs)} (m_bits, k) configs; "
            "incremental update requires exactly one"
        )
    m_bits, k = int(cfgs[0].m_bits), int(cfgs[0].k)
    columns = sorted(
        r.column for r in bloom.select("column").distinct().collect()
    )
    now = {f for f, _ in _file_list(path)}
    have = {r.file for r in bloom.select("file").distinct().collect()}
    added = sorted(now - have)
    removed = sorted(have - now)
    kept = bloom
    if removed:
        rm = spark.createDataFrame([(f,) for f in removed], "file string")
        kept = bloom.join(rm, on="file", how="left_anti")
    if added:
        # build over the added files only: point build_bloom_index at
        # them via a throwaway relation of explicit paths
        fresh = _bloom_files(spark, added, columns, m_bits, k)
        out = kept.unionByName(fresh)
    else:
        out = kept
    return _materialize(out), {
        "added": len(added),
        "removed": len(removed),
        "kept": len(have) - len(removed),
    }


def _bloom_check_lane(bloom: DataFrame, column: str, probe_lane: str) -> None:
    """Refuse a probe whose value lane cannot match the built column's
    lane — without this the probe's canonical repr never hashes to the
    built bits and the filter silently proves a FALSE absence for
    every file (e.g. probing an int-built column with a string).
    Rows with lane 'none' (all-null in that file) prove absence for
    any lane and are exempt."""
    if "lane" not in bloom.columns:
        raise ValueError(
            "bloom relation has no 'lane' column — built by an older "
            "version whose value hashing was type-unstable; rebuild "
            "with build_bloom_index"
        )
    lanes = {
        r.lane
        for r in bloom.where(F.col("column") == column)
        .select("lane")
        .distinct()
        .collect()
    } - {"none"}
    if lanes and probe_lane not in lanes:
        raise ValueError(
            f"probe value lane {probe_lane!r} cannot match column "
            f"{column!r} built with lane(s) {sorted(lanes)} — a "
            "mismatched probe would silently prune files that hold "
            "matches; probe with a value of the column's type"
        )


def bloom_dropped_files(
    bloom: DataFrame, eq_predicates: list[tuple[str, object]]
) -> DataFrame:
    """Files the bloom index PROVES cannot satisfy some `col = value`
    predicate (at least one of the value's k probe bits is unset in
    that file's filter). Pure DataFrame ops: the probe positions are
    computed driver-side from the value's CANONICAL repr — the same
    `_bloom_canon` the build hashed, so int-vs-float literals, decimal
    and date/timestamp columns all land on the build's bits (hashing
    raw str(value) here falsely proved absence whenever the reprs
    drifted, e.g. probe `100` vs pyarrow's read-back `100.0`). A probe
    whose value LANE cannot match the built column raises. Files
    without a bloom row for the column are never returned (unknown
    keeps); a row with zero values (all-null file) proves absence for
    any probe. Returns a (file) relation to anti-join against."""
    if not eq_predicates:
        raise ValueError("eq_predicates must be non-empty")
    configs = [
        (r.m_bits, r.k)
        for r in bloom.select("m_bits", "k").distinct().collect()
    ]
    if not configs:
        # an empty bloom relation proves nothing: drop no files
        return bloom.select("file")
    dropped = None
    for col, v in eq_predicates:
        if v is None:
            raise ValueError(
                f"bloom probe value for {col!r} is None — `= NULL` "
                "matches no row; filter nulls before probing"
            )
        lane, canon = _bloom_canon(v)
        _bloom_check_lane(bloom, col, lane)
        lane_ok = (F.col("lane") == lane) | (F.col("n_values") == 0)
        cond = None
        for mb, kk in configs:
            present = None
            for p in _bloom_positions(canon, mb, kk):
                bit = (
                    F.shiftright(
                        F.element_at(F.col("bits"), p // 64 + 1), p % 64
                    ).bitwiseAND(F.lit(1))
                    == 1
                )
                present = bit if present is None else present & bit
            c = (
                (F.col("m_bits") == mb)
                & (F.col("k") == kk)
                & (F.col("column") == col)
                & lane_ok
                & ~present
            )
            cond = c if cond is None else cond | c
        per_pred = bloom.where(cond).select("file").distinct()
        # AND-ed predicates: ANY single provably-absent value drops
        dropped = (
            per_pred if dropped is None else dropped.unionByName(per_pred)
        )
    return dropped.distinct()


def bloom_dropped_files_for_join(
    bloom: DataFrame,
    column: str,
    probes: DataFrame,
    value_col: str | None = None,
) -> DataFrame:
    """Runtime-filter-shaped bloom pruning: given a RELATION of probe
    values (the small side's join keys), return the files the bloom
    index proves contain NONE of them — so an equi-join of the store
    against a key set can skip files, not just a literal point lookup
    (the shape Spark's own DPP/runtime filters give a partitioned
    table, applied at the file-statistics plane).

    Semantics: a file is dropped iff EVERY distinct non-null probe
    value is provably absent from it (a join emits a row when ANY key
    matches). An empty probe set therefore drops every indexed file —
    the join result is provably empty. NULL probe values are ignored
    (an equi-join never matches NULL). Probe lane is validated against
    the built column's lane exactly as the literal path.

    Plan shape: probe values are hashed EXECUTOR-side with the build's
    own canonical md5 double-hash (Arrow-batched mapInPandas over the
    distinct values), then each (m_bits, k) config's probe-position
    relation joins the bloom rows for `column` and a higher-order
    `forall` tests the k bits per (file, probe) — cost O(files x
    distinct probes x k) bit tests, the intended regime being a small
    key relation (dimension keys, a broadcastable filter side).
    Returns a (file) relation to anti-join against."""
    if value_col is None:
        if len(probes.columns) != 1:
            raise ValueError(
                "pass value_col when the probe relation has more than "
                "one column"
            )
        value_col = probes.columns[0]
    configs = [
        (int(r.m_bits), int(r.k))
        for r in bloom.select("m_bits", "k").distinct().collect()
    ]
    rows = bloom.where(F.col("column") == column)
    if not configs:
        return bloom.select("file").limit(0)
    vals = probes.select(F.col(value_col).alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()

    cfg_list = list(configs)

    def hash_probes(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for v in pdf["v"]:
                lane, canon = _bloom_canon(v)
                for mb, kk in cfg_list:
                    out.append(
                        (lane, mb, kk, _bloom_positions(canon, mb, kk))
                    )
            yield pd.DataFrame(
                out, columns=["lane", "m_bits", "k", "positions"]
            )

    hashed = vals.mapInPandas(
        hash_probes,
        "lane string, m_bits int, k int, positions array<int>",
    ).localCheckpoint(eager=True)  # small by contract; probed twice

    probe_lanes = {r.lane for r in hashed.select("lane").distinct().collect()}
    if len(probe_lanes) > 1:
        raise ValueError(
            f"probe relation mixes value lanes {sorted(probe_lanes)}"
        )
    if probe_lanes:
        _bloom_check_lane(bloom, column, next(iter(probe_lanes)))
    else:
        # empty probe set: the join is provably empty — every indexed
        # file is skippable
        return rows.select("file").distinct()

    probe_lane = next(iter(probe_lanes))
    present = F.expr(
        "forall(positions, p -> "
        "(shiftright(bits[CAST(p DIV 64 AS INT)], "
        "CAST(p % 64 AS INT)) & 1) = 1)"
    )
    # lane validated above; restrict bloom rows to matching-lane or
    # all-null rows (which prove absence for any lane)
    joined = rows.where(
        (F.col("lane") == probe_lane) | (F.col("n_values") == 0)
    ).join(
        F.broadcast(hashed.drop("lane")), on=["m_bits", "k"]
    )
    per_file = joined.groupBy("file").agg(
        F.max(present.cast("int")).alias("__any_present")
    )
    return per_file.where(F.col("__any_present") == 0).select("file")


def bloom_dropped_files_for_join_tuples(
    bloom: DataFrame, columns: list[str], probes: DataFrame
) -> DataFrame:
    """Composite-key runtime-filter pruning: given a relation of probe
    TUPLES (a multi-column equi-join's key set), return the files the
    bloom index proves contain NONE of them. The per-tuple proof is an
    AND across columns: tuple (a, b) can match a row only if the row
    has a in column A AND b in column B, so ONE covered column proving
    its value absent kills the tuple for that file — strictly stronger
    than pruning on any single column's value set (a file holding a in
    A and b in B but never together is the conservative false-keep the
    filter cannot decide; a file holding a but not b is DROPPED, which
    per-column OR pruning would keep).

    A file is dropped iff EVERY distinct fully-non-null tuple is
    provably absent (a multi-key equi-join never matches a tuple with
    any NULL, so those are ignored; a probe set with no complete
    tuples makes the join provably empty — every file the index covers
    on any probed column is skippable). Columns the bloom does not
    cover for a file contribute no proof (unknown keeps). Per-column
    probe lanes are validated exactly like the single-column path.

    Plan shape mirrors `bloom_dropped_files_for_join`: distinct tuples
    hashed EXECUTOR-side into per-(tuple, column, config) position
    rows, broadcast against the bloom rows of the probed columns, the
    k-bit test per (file, tuple, column), then two tiny aggregations
    (ANY covered column absent -> tuple absent; ALL tuples absent ->
    file dropped). Returns a (file) relation to anti-join against."""
    if not columns:
        raise ValueError("columns must be non-empty")
    if len(columns) == 1:
        return bloom_dropped_files_for_join(bloom, columns[0], probes)
    configs = [
        (int(r.m_bits), int(r.k))
        for r in bloom.select("m_bits", "k").distinct().collect()
    ]
    if not configs:
        return bloom.select("file").limit(0)
    rows = bloom.where(F.col("column").isin(list(columns)))
    vals = probes.select(*columns).na.drop(
        "any", subset=list(columns)
    ).distinct()

    cfg_list = list(configs)
    col_list = list(columns)

    def hash_tuples(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for t in pdf.itertuples(index=False):
                canons = []
                for c, v in zip(col_list, t):
                    lane, canon = _bloom_canon(v)
                    canons.append((c, lane, canon))
                pid = hashlib.md5(
                    "\x1f".join(c for _, _, c in canons).encode("utf-8")
                ).hexdigest()
                for (c, lane, canon) in canons:
                    for mb, kk in cfg_list:
                        out.append((
                            pid, c, lane, mb, kk,
                            _bloom_positions(canon, mb, kk),
                        ))
            yield pd.DataFrame(
                out,
                columns=["pid", "column", "lane", "m_bits", "k", "positions"],
            )

    hashed = vals.mapInPandas(
        hash_tuples,
        "pid string, column string, lane string, m_bits int, k int, "
        "positions array<int>",
    ).localCheckpoint(eager=True)  # small by contract; probed twice

    lane_rows = hashed.select("column", "lane").distinct().collect()
    col_lanes: dict[str, set] = {}
    for r in lane_rows:
        col_lanes.setdefault(r.column, set()).add(r.lane)
    for c, lanes in col_lanes.items():
        if len(lanes) > 1:
            raise ValueError(
                f"probe tuples mix value lanes {sorted(lanes)} in "
                f"column {c!r}"
            )
        _bloom_check_lane(bloom, c, next(iter(lanes)))
    if not col_lanes:
        # no complete tuple: the join is provably empty — every file
        # the index covers on any probed column is skippable
        return rows.select("file").distinct()

    present = F.expr(
        "forall(positions, p -> "
        "(shiftright(bits[CAST(p DIV 64 AS INT)], "
        "CAST(p % 64 AS INT)) & 1) = 1)"
    )
    lane_ok = None
    for c, lanes in col_lanes.items():
        ok = (F.col("column") == c) & (
            (F.col("lane") == next(iter(lanes))) | (F.col("n_values") == 0)
        )
        lane_ok = ok if lane_ok is None else lane_ok | ok
    joined = rows.where(lane_ok).join(
        F.broadcast(hashed.drop("lane")), on=["m_bits", "k", "column"]
    )
    per_tuple = joined.groupBy("file", "pid").agg(
        F.max((~present).cast("int")).alias("__absent")
    )
    per_file = per_tuple.groupBy("file").agg(
        F.min("__absent").alias("__all_absent")
    )
    return per_file.where(F.col("__all_absent") == 1).select("file")


def scan_for_join(
    spark: SparkSession,
    index: DataFrame,
    bloom: DataFrame,
    column: str,
    probes: DataFrame,
    value_col: str | None = None,
    schema=None,
) -> tuple[DataFrame, dict]:
    """The user-facing runtime-filter scan: read ONLY the store files
    that can contain at least one of the probe relation's join keys
    (per `bloom_dropped_files_for_join`), returning a DataFrame ready
    to equi-join against the probe side. Exactness needs no residual
    here: a dropped file provably contains NO key, so the join over
    the kept files equals the join over the full store by
    construction. Files the bloom does not cover (no row for the
    column) are always read. Returns (df, info) with files kept/total;
    an all-pruned store returns an empty frame with the store schema
    (pass `schema` to skip the one-footer schema read).

    `column` may be a LIST for composite join keys: the scan then
    prunes through the tuple prover (`bloom_dropped_files_for_join_
    tuples` — one covered column proving its value absent kills the
    whole tuple), and `probes` must carry all key columns.

    When the tuple prover STRICTLY beats per-column pruning: per
    column, a file survives if it holds ANY probe value of that
    column; across columns that keeps every file whose a-values and
    b-values each overlap the probe sets — even when no single probe
    TUPLE is satisfiable there (the file holds a=1 with b=10 while
    the probes are (1,20) and (2,10)). The tuple prover refutes each
    probe tuple independently, so such cross-matched files drop. The
    gap grows with key correlation: composite business keys (tenant,
    entity) where each tenant's rows cluster in its own files are
    exactly the a-without-b shape."""
    total_rel = index.select("file").distinct()
    total = total_rel.count()
    if isinstance(column, (list, tuple)) and len(column) > 1:
        dropped = bloom_dropped_files_for_join_tuples(
            bloom, list(column), probes
        )
    else:
        if isinstance(column, (list, tuple)):
            column = column[0]
        dropped = bloom_dropped_files_for_join(
            bloom, column, probes, value_col=value_col
        )
    kept = [
        r.file
        for r in total_rel.join(dropped, on="file", how="left_anti").collect()
    ]
    info = {"files_total": int(total), "files_kept": len(kept)}
    if not kept:
        if schema is None:
            schema = _schema_from_index(spark, index)
        return spark.createDataFrame([], schema), info
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*kept), info


def count_with_skip_index(
    spark: SparkSession,
    index: DataFrame,
    predicates: list[tuple[str, str, object]],
    bloom: DataFrame | None = None,
) -> tuple[int, dict]:
    """COUNT(*) WHERE ... answered mostly from METADATA: a kept file
    whose footer stats PROVE every row matches every predicate (bounds
    entirely inside the predicate range, zero nulls in each predicate
    column) contributes its `file_rows` without being opened; only the
    boundary files — kept but not fully-proven — are scanned with the
    residual filter. The widened bounds stay conservative in BOTH
    directions: widening can only demote a file from 'all match' to
    'scan it' (for '=', min_num==max_num==lit sandwiches the true
    values exactly), never fabricate a proof.

    At 100 TB this is the difference between a count that reads three
    boundary files and one that reads a thousand interior ones.
    `bloom` additionally excludes files a bloom index PROVES hold no
    row for some `=` predicate (they contribute 0, so dropping them
    from both the counted and scanned sets is exact — same layering as
    scan_with_skip_index). Returns (count, {"files_total",
    "files_kept", "files_counted", "files_scanned"})."""
    total = index.select("file").distinct().count()
    kept = prune_files(index, predicates)
    if bloom is not None:
        eqs = [(c, v) for (c, op, v) in predicates if op == "="]
        if eqs:
            kept = kept.join(
                bloom_dropped_files(bloom, eqs), on="file", how="left_anti"
            )
    if not predicates:
        n = kept.agg(F.sum("file_rows")).collect()[0][0]
        return int(n or 0), {
            "files_total": int(total),
            "files_kept": int(kept.count()),
            "files_counted": int(kept.count()),
            "files_scanned": 0,
        }
    # per predicate: does this index row PROVE all rows match?
    proofs = []
    for col, op, raw in predicates:
        if op == "in":
            # all rows match an IN list only when the file is CONSTANT
            # at one of the values (min == max == v, zero nulls)
            lanes_vs = [_pred_value("=", v) for v in list(raw)]
            lanes = {la for la, _ in lanes_vs}
            if len(lanes) > 1:
                raise ValueError(
                    f"IN list for {col!r} mixes value lanes {sorted(lanes)}"
                )
            lane = next(iter(lanes))
            lo = F.col("min_num") if lane == "num" else F.col("min_str")
            hi = F.col("max_num") if lane == "num" else F.col("max_str")
            inside = None
            for _, vv in lanes_vs:
                c = (lo == F.lit(vv)) & (hi == F.lit(vv))
                inside = c if inside is None else inside | c
            proofs.append(
                F.max(
                    F.when(
                        (F.col("column") == col)
                        & F.col("has_minmax")
                        & (F.col("kind") == lane)
                        & (F.col("nulls") == 0)
                        & inside,
                        1,
                    ).otherwise(0)
                ).alias(f"__p{len(proofs)}")
            )
            continue
        lane, v = _pred_value(op, raw)
        lo = F.col("min_num") if lane == "num" else F.col("min_str")
        hi = F.col("max_num") if lane == "num" else F.col("max_str")
        lit = F.lit(v)
        inside = {
            "=": (lo == lit) & (hi == lit),
            "<": hi < lit,
            "<=": hi <= lit,
            ">": lo > lit,
            ">=": lo >= lit,
        }[op]
        proofs.append(
            F.max(
                F.when(
                    (F.col("column") == col)
                    & F.col("has_minmax")
                    & (F.col("kind") == lane)
                    & (F.col("nulls") == 0)
                    & inside,
                    1,
                ).otherwise(0)
            ).alias(f"__p{len(proofs)}")
        )
    proven = (
        index.join(kept.select("file"), "file")
        .groupBy("file")
        .agg(F.first("file_rows").alias("file_rows"), *proofs)
    )
    # ONE collect serves the proven/boundary split, the metadata sum,
    # and the counted-file tally (r12: was three separate actions over
    # the same O(files) relation — two aggregates and a collect; the
    # relation is O(kept files), already the driver footprint to_scan
    # implied)
    rows = proven.collect()

    def _ok(r) -> bool:
        return all(r[f"__p{i}"] == 1 for i in range(len(predicates)))

    to_scan = [r.file for r in rows if not _ok(r)]
    meta_n = sum(int(r.file_rows) for r in rows if _ok(r))
    n_counted = sum(1 for r in rows if _ok(r))
    scan_n = 0
    if to_scan:
        cond = _residual(predicates)
        scan_n = spark.read.parquet(*to_scan).where(cond).count()
    return int(meta_n) + int(scan_n), {
        "files_total": int(total),
        "files_kept": int(n_counted) + len(to_scan),
        "files_counted": int(n_counted),
        "files_scanned": len(to_scan),
    }
