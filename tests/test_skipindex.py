"""File-skipping index (functions/skipindex.py).

The contract has two halves: pruning must actually drop files on a
range-laid-out store (the 100 TB point), and the scan result must be
bit-identical to full-scan-plus-filter regardless of what was pruned
(the safety point — residual re-filter makes pruning correctness-
neutral by construction, so the tests attack the pruning DECISIONS:
boundary literals, all-null files, missing stats, string prefixes).
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
    build_skip_index,
    prune_files,
    scan_with_skip_index,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """orders range-laid on o_orderkey into 8 files: disjoint key
    ranges per file = the layout pruning exists for."""
    out = str(tmp_path_factory.mktemp("skip") / "orders")
    (
        spark.read.parquet(f"{SF}/orders.parquet")
        .repartitionByRange(8, "o_orderkey")
        .write.parquet(out)
    )
    return out


def _rows(df, key="o_orderkey"):
    return sorted(tuple(r) for r in df.collect())


def test_numeric_pruning_is_exact_and_actually_prunes(spark, store):
    import duckdb

    idx = build_skip_index(spark, store).cache()
    try:
        full = spark.read.parquet(store)
        n_files = idx.select("file").distinct().count()
        assert n_files == 8

        # range predicate: keeps a strict subset of files, result
        # bit-identical to the full filter
        keys = sorted(r.o_orderkey for r in full.select("o_orderkey").collect())
        cut = keys[len(keys) // 4]
        preds = [("o_orderkey", "<=", cut)]
        got, info = scan_with_skip_index(spark, idx, preds)
        assert info["files_total"] == 8
        assert 0 < info["files_kept"] < 8
        assert _rows(got) == _rows(full.where(F.col("o_orderkey") <= cut))

        # independent engine agrees on the row count
        want_n = duckdb.connect().execute(
            f"SELECT count(*) FROM '{store}/*.parquet' "
            f"WHERE o_orderkey <= {cut}"
        ).fetchone()[0]
        assert got.count() == want_n

        # boundary literals: files whose min/max EQUAL the literal
        # must be kept for '=' and dropped only by strict ops
        gmin, gmax = keys[0], keys[-1]
        for op, lit_v in [("=", gmin), ("=", gmax), ("<=", gmin), (">=", gmax)]:
            g2, _ = scan_with_skip_index(spark, idx, [("o_orderkey", op, lit_v)])
            expr = {
                "=": F.col("o_orderkey") == lit_v,
                "<=": F.col("o_orderkey") <= lit_v,
                ">=": F.col("o_orderkey") >= lit_v,
            }[op]
            assert _rows(g2) == _rows(full.where(expr))

        # equality below the global min: every file provably excluded,
        # empty result with the store's schema
        g3, info3 = scan_with_skip_index(
            spark, idx, [("o_orderkey", "=", gmin - 1)]
        )
        assert info3["files_kept"] == 0
        assert g3.count() == 0
        assert g3.schema == full.schema

        # conjunction intersects survivors
        g4, info4 = scan_with_skip_index(
            spark,
            idx,
            [("o_orderkey", ">", cut), ("o_orderkey", "<=", keys[len(keys) // 2])],
        )
        assert 0 < info4["files_kept"] < 8
        assert _rows(g4) == _rows(
            full.where(
                (F.col("o_orderkey") > cut)
                & (F.col("o_orderkey") <= keys[len(keys) // 2])
            )
        )

        # no predicates: everything kept
        assert prune_files(idx, []).count() == 8
    finally:
        idx.unpersist()


def test_string_lane_and_unknown_columns(spark, tmp_path):
    out = str(tmp_path / "byprio")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(4, "o_orderpriority").write.parquet(out)
    idx = build_skip_index(spark, out).cache()
    try:
        full = spark.read.parquet(out)
        got, info = scan_with_skip_index(
            spark, idx, [("o_orderpriority", "=", "1-URGENT")]
        )
        assert info["files_kept"] < info["files_total"]
        assert _rows(got) == _rows(
            full.where(F.col("o_orderpriority") == "1-URGENT")
        )

        # numeric predicate on a string column: lane mismatch never
        # prunes, residual filter still yields the truth (empty here
        # via cast semantics == full-scan behavior)
        g2, info2 = scan_with_skip_index(
            spark, idx, [("o_orderpriority", ">", "5")]
        )
        assert _rows(g2) == _rows(full.where(F.col("o_orderpriority") > "5"))
    finally:
        idx.unpersist()


def test_all_null_file_is_droppable_and_missing_stats_keep(spark, tmp_path):
    out = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id bigint, v double"
    ).coalesce(1).write.parquet(out)
    spark.createDataFrame(
        [(3, None), (4, None)], "id bigint, v double"
    ).coalesce(1).write.mode("append").parquet(out)

    spark_idx = build_skip_index(spark, tmp_path.as_posix() + "/nulls")
    full = spark.read.parquet(out)

    # v-comparison can never match NULL: the all-null file is dropped
    got, info = scan_with_skip_index(spark, spark_idx, [("v", ">=", 0.0)])
    assert info == {"files_total": 2, "files_kept": 1}
    assert _rows(got, "id") == _rows(full.where(F.col("v") >= 0.0), "id")

    # the all-null column has no min/max: an id predicate keeps both
    # (id stats exist), a v '=' inside [10,20] keeps only file 1
    got2, info2 = scan_with_skip_index(spark, spark_idx, [("id", ">=", 1)])
    assert info2["files_kept"] == 2
    assert got2.count() == 4


def test_index_survives_roundtrip_and_int64_widening(spark, tmp_path):
    """Persisting/reloading the index changes nothing; > 2^53 ints
    prune conservatively (kept when the double interval is ambiguous,
    result still exact via residual)."""
    big = 2**60
    out = str(tmp_path / "big")
    spark.createDataFrame(
        [(big + i,) for i in range(4)], "k bigint"
    ).coalesce(1).write.parquet(out)
    spark.createDataFrame(
        [(big + 100 + i,) for i in range(4)], "k bigint"
    ).coalesce(1).write.mode("append").parquet(out)

    idx = build_skip_index(spark, out)
    ipath = str(tmp_path / "idx")
    idx.write.parquet(ipath)
    idx2 = spark.read.parquet(ipath)

    full = spark.read.parquet(out)
    # widened bounds may keep both files for a literal near the seam,
    # but never drop a file that contains matches — result stays exact
    for lit_v in (big, big + 2, big + 100, big + 103):
        got, _ = scan_with_skip_index(spark, idx2, [("k", "=", lit_v)])
        assert _rows(got, "k") == _rows(full.where(F.col("k") == lit_v), "k")
        assert got.count() == 1


def _delete_file(path):
    os.remove(path)
    crc = os.path.join(
        os.path.dirname(path), "." + os.path.basename(path) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def test_update_skip_index_incremental_equals_rebuild(spark, tmp_path):
    """Append files -> update touches only the new footers; delete
    files -> their rows drop. Updated index == fresh rebuild
    bit-for-bit and pruning through it stays exact.

    The deletes REMOVE ONE FILE FROM EACH WRITE BATCH on purpose: the
    r07 defect only fired when the deleted file belonged to a batch
    the previous update had indexed lazily, so a single victim made
    the test ~50/50 flaky-green. Both batches deleting pins the
    materialization contract deterministically; the second
    update-after-delete cycle pins that the RETURNED index is a value
    (no action on it may re-read dead paths)."""
    import glob as g

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        update_skip_index,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.where("o_orderkey % 2 = 0").repartitionByRange(
        4, "o_orderkey"
    ).write.parquet(out)
    batch0 = set(g.glob(os.path.join(out, "*.parquet")))
    idx0 = build_skip_index(spark, out)

    # append: 4 more files
    orders.where("o_orderkey % 2 = 1").repartitionByRange(
        4, "o_orderkey"
    ).write.mode("append").parquet(out)
    batch1 = set(g.glob(os.path.join(out, "*.parquet"))) - batch0
    assert len(batch0) == len(batch1) == 4
    idx1, info = update_skip_index(spark, out, idx0)
    assert info["added"] == 4 and info["removed"] == 0 and info["kept"] == 4

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(idx1) == rows(build_skip_index(spark, out))

    # pruned scan through the updated index stays bit-identical
    full = spark.read.parquet(out)
    keys = sorted(r.o_orderkey for r in full.select("o_orderkey").collect())
    cut = keys[len(keys) // 3]
    got, info2 = scan_with_skip_index(spark, idx1, [("o_orderkey", "<=", cut)])
    assert 0 < info2["files_kept"] < info2["files_total"] == 8
    assert _rows(got) == _rows(full.where(F.col("o_orderkey") <= cut))

    # delete one data file from EACH batch -> update drops both
    _delete_file(sorted(batch0)[0])
    _delete_file(sorted(batch1)[0])
    idx2, info3 = update_skip_index(spark, out, idx1)
    assert info3 == {"added": 0, "removed": 2, "kept": 6}
    assert rows(idx2) == rows(build_skip_index(spark, out))

    # second lifecycle: append -> update -> delete FROM THE NEW BATCH
    # -> update. Every previously returned index must stay actionable
    # (it is a value, not a recompute over mutated storage).
    before = set(g.glob(os.path.join(out, "*.parquet")))
    orders.where("o_orderkey % 10 = 3").coalesce(2).write.mode(
        "append"
    ).parquet(out)
    batch2 = set(g.glob(os.path.join(out, "*.parquet"))) - before
    idx3, info4 = update_skip_index(spark, out, idx2)
    assert info4 == {"added": len(batch2), "removed": 0, "kept": 6}
    _delete_file(sorted(batch2)[0])
    idx4, info5 = update_skip_index(spark, out, idx3)
    assert info5 == {"added": 0, "removed": 1, "kept": 6 + len(batch2) - 1}
    assert rows(idx4) == rows(build_skip_index(spark, out))
    # every older returned index still ACTS after the mutations above:
    # a value cannot re-read dead paths
    assert idx1.select("file").distinct().count() == 8
    assert idx2.select("file").distinct().count() == 6
    assert idx3.select("file").distinct().count() == 6 + len(batch2)


def test_string_max_widen_overflow_falls_back_not_raises(spark, tmp_path):
    """A string column whose truncated max ends in U+10FFFF chars must
    not fail the build: bump-able char found -> widened bound still
    prunes safely; ALL chars maximal -> that column records no min/max
    (never prunes) and every other column still does."""
    top = chr(0x10FFFF)
    out = str(tmp_path / "adv")
    rows_ = [
        (1, "aaa" + top * 70),          # truncation, bump-able 'a'
        (2, top * 70),                   # truncation, NO bump-able char
        (3, "zzz"),
    ]
    spark.createDataFrame(rows_, "id bigint, s string").coalesce(
        1
    ).write.parquet(out)
    idx = build_skip_index(spark, out)
    got = {(r.column, r.kind, r.has_minmax) for r in idx.collect()}
    # the file's max is top*70 -> unwidenable -> s falls back to none
    assert ("s", "none", False) in got
    assert ("id", "num", True) in got
    full = spark.read.parquet(out)
    # pruning on s keeps the file (unknown never drops); result exact
    g1, info = scan_with_skip_index(spark, idx, [("s", ">=", "b")])
    assert info["files_kept"] == 1
    assert sorted(r.id for r in g1.collect()) == [2, 3]
    # a second store where the max HAS a bump-able char: widened bound
    # stays a true upper bound (file kept for literals under it)
    out2 = str(tmp_path / "adv2")
    spark.createDataFrame(
        [(1, "aaa" + top * 70)], "id bigint, s string"
    ).coalesce(1).write.parquet(out2)
    idx2 = build_skip_index(spark, out2)
    r = [x for x in idx2.collect() if x.column == "s"][0]
    assert r.has_minmax and r.kind == "str"
    assert r.max_str == "aab"  # bumped, tail dropped
    g2, info2 = scan_with_skip_index(
        spark, idx2, [("s", "=", "aaa" + top * 70)]
    )
    assert info2["files_kept"] == 1 and g2.count() == 1
    # and a literal ABOVE the widened bound is provably excluded
    g3, info3 = scan_with_skip_index(spark, idx2, [("s", ">=", "ab")])
    assert info3["files_kept"] == 0 and g3.count() == 0


def test_count_with_skip_index_metadata_fast_path(spark, store):
    """COUNT from footers: interior files counted without being
    opened, boundary files scanned, result exact vs the full filter;
    boundary-equality and all-null cases stay conservative."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        count_with_skip_index,
    )

    idx = build_skip_index(spark, store).cache()
    try:
        full = spark.read.parquet(store)
        keys = sorted(r.o_orderkey for r in full.select("o_orderkey").collect())
        cut = keys[int(len(keys) * 0.6)]

        n, info = count_with_skip_index(spark, idx, [("o_orderkey", "<=", cut)])
        assert n == full.where(F.col("o_orderkey") <= cut).count()
        # interior files proved from metadata; at most the one
        # boundary file scanned
        assert info["files_counted"] >= 1
        assert info["files_scanned"] <= 2
        assert info["files_counted"] + info["files_scanned"] == info["files_kept"]

        # equality on an existing key: exact everywhere
        n2, info2 = count_with_skip_index(
            spark, idx, [("o_orderkey", "=", keys[0])]
        )
        assert n2 == full.where(F.col("o_orderkey") == keys[0]).count()

        # no predicates: pure metadata, zero scans
        n3, info3 = count_with_skip_index(spark, idx, [])
        assert n3 == full.count() and info3["files_scanned"] == 0

        # conjunction: band count exact
        lo, hi = keys[len(keys) // 4], keys[len(keys) // 2]
        n4, _ = count_with_skip_index(
            spark, idx,
            [("o_orderkey", ">", lo), ("o_orderkey", "<=", hi)],
        )
        assert n4 == full.where(
            (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
        ).count()
    finally:
        idx.unpersist()


def test_count_with_skip_index_null_columns_stay_exact(spark, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        count_with_skip_index,
    )

    out = str(tmp_path / "n")
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id bigint, v double"
    ).coalesce(1).write.parquet(out)
    idx = build_skip_index(spark, out)
    full = spark.read.parquet(out)
    # v has a null: the all-match proof must fail, the file scans, and
    # the count excludes the null row
    n, info = count_with_skip_index(spark, idx, [("v", ">=", 0.0)])
    assert n == 2 == full.where("v >= 0.0").count()
    assert info["files_scanned"] == 1 and info["files_counted"] == 0


def test_bloom_index_prunes_scattered_equality(spark, tmp_path):
    """The min/max index proves NOTHING about a scattered column (every
    file's [min, max] spans the domain); the bloom index prunes `=`
    probes to the files that actually contain the value, results stay
    bit-identical via the residual filter, and a planted-absent value
    prunes everything."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        bloom_dropped_files,
        build_bloom_index,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # range-lay by ORDERKEY: custkeys scatter across every file
    orders.repartitionByRange(8, "o_orderkey").write.parquet(out)
    full = spark.read.parquet(out)
    idx = build_skip_index(spark, out)
    bloom = build_bloom_index(
        spark, out, ["o_custkey", "o_orderpriority"], m_bits=1 << 14
    )
    assert bloom.select("file").distinct().count() == 8

    # DETERMINISTIC probe: the smallest custkey with exactly one order
    # — it lives in exactly one file, so bloom pruning has 7 provably
    # droppable files (a `first()`-sampled key was flaky: a customer
    # whose orders span every o_orderkey range file is unprunable)
    probe = (
        full.groupBy("o_custkey").count().where("count = 1")
        .agg(F.min("o_custkey")).collect()[0][0]
    )
    # min/max alone keeps everything (scattered column)...
    got_mm, info_mm = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", probe)]
    )
    assert info_mm["files_kept"] == 8
    # ... the bloom layer prunes to a strict subset, result exact
    got, info = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", probe)], bloom=bloom
    )
    truly_in = (
        full.where(F.col("o_custkey") == probe)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert truly_in <= info["files_kept"] < 8
    assert _rows(got) == _rows(full.where(F.col("o_custkey") == probe))

    # planted-absent value: every file provably excluded
    g2, info2 = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", -12345)], bloom=bloom
    )
    assert info2["files_kept"] == 0
    assert g2.count() == 0 and g2.schema == full.schema

    # string column: low cardinality -> present everywhere (kept), and
    # an absent string prunes all
    g3, info3 = scan_with_skip_index(
        spark, idx, [("o_orderpriority", "=", "1-URGENT")], bloom=bloom
    )
    assert _rows(g3) == _rows(full.where(F.col("o_orderpriority") == "1-URGENT"))
    assert bloom_dropped_files(
        bloom, [("o_orderpriority", "no-such-priority")]
    ).count() == 8

    # conjunction with a range predicate: layers intersect
    keys = sorted(r.o_orderkey for r in full.select("o_orderkey").collect())
    cut = keys[len(keys) // 2]
    g4, info4 = scan_with_skip_index(
        spark,
        idx,
        [("o_orderkey", "<=", cut), ("o_custkey", "=", probe)],
        bloom=bloom,
    )
    assert info4["files_kept"] <= info["files_kept"]
    assert _rows(g4) == _rows(
        full.where((F.col("o_orderkey") <= cut) & (F.col("o_custkey") == probe))
    )

    # an UNDERSIZED bloom may keep extra files but never changes results
    tiny = build_bloom_index(spark, out, ["o_custkey"], m_bits=64, k=2)
    g5, _ = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", probe)], bloom=tiny
    )
    assert _rows(g5) == _rows(full.where(F.col("o_custkey") == probe))

    # unknown column in the bloom relation: never prunes
    g6, info6 = scan_with_skip_index(
        spark, idx, [("o_orderkey", "=", keys[0])], bloom=bloom
    )
    assert _rows(g6) == _rows(full.where(F.col("o_orderkey") == keys[0]))


def test_update_bloom_index_incremental_equals_rebuild(spark, tmp_path):
    """Bloom maintenance mirrors the min/max index: hash only NEW
    files, drop deleted files' rows, result bit-identical to a fresh
    rebuild, probes through the updated relation stay exact, and the
    returned relation is a value (acts after later deletes)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        update_bloom_index,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.where("o_orderkey % 2 = 0").repartitionByRange(
        4, "o_orderkey"
    ).write.parquet(out)
    b0 = build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)

    orders.where("o_orderkey % 2 = 1").repartitionByRange(
        4, "o_orderkey"
    ).write.mode("append").parquet(out)
    b1, info = update_bloom_index(spark, out, b0)
    assert info == {"added": 4, "removed": 0, "kept": 4}

    def rows(df):
        return sorted(
            (r.file, r.column, r.m_bits, r.k, r.n_values, tuple(r.bits))
            for r in df.collect()
        )

    assert rows(b1) == rows(
        build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)
    )

    # delete one file from EACH batch -> rows drop, still == rebuild
    import glob as g

    files = sorted(g.glob(os.path.join(out, "*.parquet")))
    _delete_file(files[0])
    _delete_file(files[-1])
    b2, info2 = update_bloom_index(spark, out, b1)
    assert info2 == {"added": 0, "removed": 2, "kept": 6}
    assert rows(b2) == rows(
        build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)
    )
    # the PREVIOUS relation still acts (value, not recompute recipe)
    assert b1.select("file").distinct().count() == 8

    # probes through the updated bloom stay exact
    full = spark.read.parquet(out)
    idx = build_skip_index(spark, out)
    probe = full.select("o_custkey").first().o_custkey
    got, _ = scan_with_skip_index(
        spark, idx, [("o_custkey", "=", probe)], bloom=b2
    )
    assert _rows(got) == _rows(full.where(F.col("o_custkey") == probe))

    # mixed-config relations are refused (they would weaken probes)
    import pytest as _pytest

    mixed = b2.unionByName(
        build_bloom_index(spark, out, ["o_custkey"], m_bits=128, k=2)
    )
    with _pytest.raises(ValueError, match="configs"):
        update_bloom_index(spark, out, mixed)


def test_bloom_canonical_value_hashing_across_types(spark, tmp_path):
    """The r08 defect class (ADVICE high): build hashed pyarrow's
    read-back repr, probe hashed the caller's literal repr — for
    double/decimal/date columns (or int-vs-float literals) the reprs
    drifted and the bloom falsely PROVED ABSENCE, silently pruning
    files that hold matches. Canonical hashing must keep every
    equal-under-Spark probe, and pruning must still engage for
    genuinely absent values."""
    import datetime
    from decimal import Decimal

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        bloom_dropped_files,
    )

    out = str(tmp_path / "store")
    spark.createDataFrame(
        [
            (1, 100.0, Decimal("100.00"), datetime.date(2020, 1, 2),
             datetime.datetime(2020, 1, 2, 3, 4, 5), 10**15 + 7),
            (2, 2.5, Decimal("2.50"), datetime.date(2021, 6, 9),
             datetime.datetime(2021, 6, 9, 0, 0, 0), 42),
        ],
        "id int, d double, dec decimal(10,2), dt date, ts timestamp, big long",
    ).repartition(2, "id").write.parquet(out)
    bloom = build_bloom_index(
        spark, out, ["d", "dec", "dt", "ts", "big"], m_bits=1 << 10
    )
    full = spark.read.parquet(out)
    files_with = {
        c: {
            v: full.where(F.col(c) == F.lit(v))
            .select(F.input_file_name())
            .distinct()
            .count()
            for v in vals
        }
        for c, vals in {
            "d": [100, 100.0, 2.5],          # int literal on double col
            "dec": [100, Decimal("100"), 2.5],
            "big": [10**15 + 7, float(42)],  # float literal on long col
            "dt": [datetime.date(2020, 1, 2)],
            "ts": [datetime.datetime(2020, 1, 2, 3, 4, 5)],
        }.items()
    }
    n_files = bloom.select("file").distinct().count()
    for c, vals in files_with.items():
        for v, n_in in vals.items():
            dropped = bloom_dropped_files(bloom, [(c, v)]).count()
            # NEVER prune a file that truly holds the value
            assert dropped <= n_files - n_in, (c, v)
            if n_in:
                assert dropped < n_files, (c, v)
    # genuinely absent values still prune everything (power retained)
    assert bloom_dropped_files(bloom, [("d", -9.75)]).count() == n_files
    assert bloom_dropped_files(
        bloom, [("dt", datetime.date(1999, 9, 9))]
    ).count() == n_files
    # date = timestamp-at-midnight coercion (Spark considers them
    # equal): a midnight timestamp probe on the date column must keep
    # the file holding that date
    assert bloom_dropped_files(
        bloom, [("dt", datetime.datetime(2020, 1, 2))]
    ).count() < n_files

    # probe lane mismatches RAISE instead of silently pruning all
    for col, v in [("d", "100"), ("dt", 100), ("big", "42")]:
        with pytest.raises(ValueError, match="lane"):
            bloom_dropped_files(bloom, [(col, v)])
    with pytest.raises(ValueError, match="None"):
        bloom_dropped_files(bloom, [("d", None)])


def test_bloom_join_probe_prunes_to_containing_files(spark, tmp_path):
    """Relation-valued probes (the runtime-filter shape): an equi-join
    key set prunes to exactly the union of files containing ANY key;
    empty key set drops every indexed file; mixed/mismatched lanes
    raise; results stay exact through scan_with_skip_index's residual
    discipline when the kept files are read."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        bloom_dropped_files_for_join,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(8, "o_orderkey").write.parquet(out)
    full = spark.read.parquet(out)
    bloom = build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)

    probe_keys = [
        r.o_custkey
        for r in full.select("o_custkey").distinct().limit(3).collect()
    ]
    probes = spark.createDataFrame(
        [(k,) for k in probe_keys], "o_custkey long"
    )
    dropped = bloom_dropped_files_for_join(bloom, "o_custkey", probes)
    dropped_set = {r.file for r in dropped.collect()}
    truly_in = {
        r[0]
        for r in full.where(F.col("o_custkey").isin(probe_keys))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    # soundness: no file holding any probe key is dropped
    assert all(f not in dropped_set for f in truly_in)
    # the kept set answers the join exactly
    kept_files = [
        r.file
        for r in bloom.select("file").distinct().collect()
        if r.file not in dropped_set
    ]
    got = (
        spark.read.parquet(*kept_files)
        .join(probes, on="o_custkey")
        .select("o_orderkey")
    )
    want = full.join(probes, on="o_custkey").select("o_orderkey")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in want.collect()
    )

    # a probe relation with NULLs: nulls ignored (equi-join never
    # matches NULL), same result
    probes_null = spark.createDataFrame(
        [(k,) for k in probe_keys] + [(None,)], "o_custkey long"
    )
    d2 = {
        r.file
        for r in bloom_dropped_files_for_join(
            bloom, "o_custkey", probes_null
        ).collect()
    }
    assert d2 == dropped_set

    # absent keys only: every indexed file provably skippable
    absent = spark.createDataFrame([(-5,), (-6,)], "o_custkey long")
    assert bloom_dropped_files_for_join(
        bloom, "o_custkey", absent
    ).count() == 8
    # empty probe set: join provably empty -> all files skippable
    assert bloom_dropped_files_for_join(
        bloom, "o_custkey", absent.where("o_custkey > 0")
    ).count() == 8
    # lane mismatch raises
    with pytest.raises(ValueError, match="lane"):
        bloom_dropped_files_for_join(
            bloom, "o_custkey",
            spark.createDataFrame([("x",)], "o_custkey string"),
        )


def test_string_widening_skips_surrogate_gap(spark, tmp_path):
    """Truncate-and-increment bumping U+D7FF must skip to U+E000 —
    chr(0xD800) is a lone surrogate Arrow cannot encode, so the old
    bump crashed the index build on valid (if adversarial) data."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        _STR_PREFIX,
        _widen_str_upper,
    )

    assert _widen_str_upper("a" + chr(0xD7FF)) == "a" + chr(0xE000)
    assert _widen_str_upper(chr(0xD7FF) * 3) == chr(0xD7FF) * 2 + chr(0xE000)

    out = str(tmp_path / "store")
    hot = chr(0xD7FF) * _STR_PREFIX + "tail-beyond-prefix"
    spark.createDataFrame(
        [(1, hot), (2, "aaa")], "id int, s string"
    ).coalesce(1).write.parquet(out)
    idx = build_skip_index(spark, out)  # must not crash in the build
    row = [
        r for r in idx.collect() if r.column == "s" and r.has_minmax
    ][0]
    # widened upper bound is a real upper bound for the hot string
    assert row.max_str > hot[:_STR_PREFIX] and "\ud800" not in row.max_str
    got, _ = scan_with_skip_index(spark, idx, [("s", "=", hot)])
    assert got.count() == 1


def test_scan_for_join_reads_only_key_containing_files(spark, tmp_path):
    """The composed runtime-filter scan: join over the pruned file set
    equals the join over the full store (no residual needed — dropped
    files provably hold no key), and the scan provably reads fewer
    files for a selective key set."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        scan_for_join,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(8, "o_orderkey").write.parquet(out)
    full = spark.read.parquet(out)
    idx = build_skip_index(spark, out)
    bloom = build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)

    # pick the key with the smallest file spread so pruning is real
    spread = (
        full.select("o_custkey", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nf"))
        .orderBy("nf", "o_custkey")
        .first()
    )
    probes = spark.createDataFrame(
        [(int(spread.o_custkey),), (-99,)], "o_custkey long"
    )
    got, info = scan_for_join(spark, idx, bloom, "o_custkey", probes)
    assert info["files_kept"] < info["files_total"] == 8
    assert info["files_kept"] >= spread.nf
    j_got = got.join(probes, on="o_custkey").select("o_orderkey")
    j_want = full.join(probes, on="o_custkey").select("o_orderkey")
    assert sorted(r[0] for r in j_got.collect()) == sorted(
        r[0] for r in j_want.collect()
    )

    # all-absent key set: empty frame, store schema, zero files read
    absent = spark.createDataFrame([(-1,), (-2,)], "o_custkey long")
    g2, info2 = scan_for_join(spark, idx, bloom, "o_custkey", absent)
    assert info2["files_kept"] == 0
    assert g2.count() == 0 and g2.schema == full.schema


def test_count_with_skip_index_bloom_layer(spark, tmp_path):
    """COUNT through the bloom layer: an equality count on a scattered
    column scans only the files the bloom keeps, stays exact, and an
    absent value answers 0 with zero files opened."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        count_with_skip_index,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(8, "o_orderkey").write.parquet(out)
    full = spark.read.parquet(out)
    idx = build_skip_index(spark, out)
    bloom = build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)

    spread = (
        full.select("o_custkey", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nf"))
        .orderBy("nf", "o_custkey")
        .first()
    )
    probe = int(spread.o_custkey)
    want = full.where(F.col("o_custkey") == probe).count()
    # without bloom: min/max proves nothing on the scattered key
    n0, i0 = count_with_skip_index(spark, idx, [("o_custkey", "=", probe)])
    assert n0 == want and i0["files_kept"] == 8
    # with bloom: same count from fewer opened files
    n1, i1 = count_with_skip_index(
        spark, idx, [("o_custkey", "=", probe)], bloom=bloom
    )
    assert n1 == want
    assert spread.nf <= i1["files_kept"] < 8
    # absent value: 0 rows, zero files opened
    n2, i2 = count_with_skip_index(
        spark, idx, [("o_custkey", "=", -7)], bloom=bloom
    )
    assert n2 == 0 and i2["files_kept"] == 0 and i2["files_scanned"] == 0


def test_bloom_canon_beyond_double_ints_and_decimals(spark):
    """ADVICE r09 (low): the OverflowError fallback itself overflowed
    for ints — format(int, 'f') converts through float. Beyond-double
    ints and Decimals must canonicalize (to the same exact repr when
    numerically equal) instead of raising."""
    from decimal import Decimal

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        _bloom_canon,
    )

    big = 10**400
    lane_i, canon_i = _bloom_canon(big)
    lane_d, canon_d = _bloom_canon(Decimal("1E+400"))
    assert lane_i == lane_d == "num"
    assert canon_i == canon_d == "1" + "0" * 400
    # negative + non-power shapes don't collide
    assert _bloom_canon(-big)[1] != canon_i
    assert _bloom_canon(big + 1)[1] != canon_i


def test_scan_empty_index_raises_descriptive_error(spark):
    """ADVICE r09 (low): an EMPTY skip index (no files) with every
    file pruned used to die on `.first().file` (AttributeError on
    None); both scan paths now raise a ValueError naming the fix
    (pass schema=) — or return the empty frame when schema is given."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        scan_for_join,
        scan_with_skip_index,
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame([(1,)], "k long").write.parquet(
            f"{d}/store"
        )
        from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
            build_bloom_index,
            build_skip_index,
        )

        empty_idx = build_skip_index(spark, f"{d}/store").where(F.lit(False))
        empty_bloom = build_bloom_index(spark, f"{d}/store", ["k"]).where(
            F.lit(False)
        )
        empty_idx = spark.createDataFrame(
            empty_idx.collect(), empty_idx.schema
        )
        empty_bloom = spark.createDataFrame(
            empty_bloom.collect(), empty_bloom.schema
        )
    probes = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="schema"):
        scan_with_skip_index(spark, empty_idx, [("x", "=", 1)])
    with pytest.raises(ValueError, match="schema"):
        scan_for_join(spark, empty_idx, empty_bloom, "k", probes)
    got, info = scan_with_skip_index(
        spark, empty_idx, [("x", "=", 1)], schema="x long"
    )
    assert got.count() == 0 and info["files_kept"] == 0


def test_bloom_tuple_probe_ands_across_columns(spark, tmp_path):
    """Composite-key pruning is an AND across columns per tuple: a file
    holding the tuple's A-value but NOT its B-value is dropped (single
    column pruning on A would keep it); a file holding both values only
    in DIFFERENT rows is the documented conservative false-keep; files
    holding the tuple are never dropped; all-absent tuples drop every
    covered file; NULL-bearing and empty tuple sets behave like the
    single-column path."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        bloom_dropped_files_for_join_tuples,
    )

    out = str(tmp_path / "store")
    # f0: (1,'a') together; f1: A=1 present, B='a' absent;
    # f2: A=1 and B='a' both present but never in one row
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "ka int, kb string"
    ).coalesce(1).write.parquet(out + "/f0")
    spark.createDataFrame(
        [(1, "zz"), (3, "yy")], "ka int, kb string"
    ).coalesce(1).write.parquet(out + "/f1")
    spark.createDataFrame(
        [(1, "qq"), (9, "a")], "ka int, kb string"
    ).coalesce(1).write.parquet(out + "/f2")
    import glob as _glob
    import shutil as _shutil

    os.makedirs(out + "/flat")
    for i, d in enumerate(("f0", "f1", "f2")):
        src = _glob.glob(f"{out}/{d}/*.parquet")[0]
        _shutil.copy(src, f"{out}/flat/{i}-{d}.parquet")
    flat = out + "/flat"
    bloom = build_bloom_index(spark, flat, ["ka", "kb"], m_bits=1 << 12)

    def dropped(pairs, schema="ka int, kb string"):
        probes = spark.createDataFrame(pairs, schema)
        return {
            os.path.basename(r.file)
            for r in bloom_dropped_files_for_join_tuples(
                bloom, ["ka", "kb"], probes
            ).collect()
        }

    d = dropped([(1, "a")])
    assert "0-f0.parquet" not in d          # holds the tuple: kept
    assert "1-f1.parquet" in d              # has ka=1 but no kb='a': AND drops
    assert "2-f2.parquet" not in d          # both values, different rows: FP keep

    # a second tuple matching f1 un-drops it (ANY tuple possible keeps)
    d2 = dropped([(1, "a"), (3, "yy")])
    assert d2 == d - {"1-f1.parquet"}

    # all tuples provably absent everywhere: every covered file dropped
    assert len(dropped([(77, "nope")])) == 3
    # NULL-bearing tuples ignored; nothing but NULLs -> join provably
    # empty -> all covered files skippable
    assert dropped([(1, "a"), (None, "zz")]) == d
    assert len(dropped([(None, "a"), (1, None)])) == 3
    # per-column lane mismatch raises
    with pytest.raises(ValueError, match="lane"):
        dropped([("1", 5)], schema="ka string, kb int")


def test_bloom_tuple_probe_exactness_on_real_keys(spark, tmp_path):
    """Soundness sweep on real data: kept files answer the composite
    equi-join exactly (no file holding a probe tuple is ever dropped)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        bloom_dropped_files_for_join_tuples,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(6, "o_orderkey").write.parquet(out)
    full = spark.read.parquet(out)
    bloom = build_bloom_index(
        spark, out, ["o_custkey", "o_orderpriority"], m_bits=1 << 14
    )
    probes = (
        full.select("o_custkey", "o_orderpriority").distinct().limit(5)
    )
    probes = spark.createDataFrame(
        probes.collect(), "o_custkey long, o_orderpriority string"
    )
    dropped_set = {
        r.file
        for r in bloom_dropped_files_for_join_tuples(
            bloom, ["o_custkey", "o_orderpriority"], probes
        ).collect()
    }
    kept_files = [
        r.file
        for r in bloom.select("file").distinct().collect()
        if r.file not in dropped_set
    ]
    on = ["o_custkey", "o_orderpriority"]
    got = spark.read.parquet(*kept_files).join(probes, on=on)
    want = full.join(probes, on=on)
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )


def test_in_list_pruning_and_metadata_count(spark, tmp_path):
    """IN-list predicates through the library pruner: a file is
    dropped only when EVERY value is provably outside its bounds; the
    pruned scan is bit-equal to full-scan-plus-isin; COUNT proves
    'all rows match' only for files CONSTANT at a listed value."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_skip_index,
        count_with_skip_index,
        scan_with_skip_index,
    )

    out = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, i // 100) for i in range(300)], "k int, g int"
    )
    df.repartitionByRange(3, "k").write.parquet(out)
    idx = build_skip_index(spark, out)

    got, info = scan_with_skip_index(spark, idx, [("k", "in", (5, 7))])
    want = sorted(
        r.k for r in spark.read.parquet(out).where("k in (5, 7)").collect()
    )
    assert sorted(r.k for r in got.collect()) == want
    assert info["files_kept"] == 1  # both values live in the first file

    # values spanning two files keep exactly those two
    _, info2 = scan_with_skip_index(spark, idx, [("k", "in", (5, 250))])
    assert info2["files_kept"] == 2
    # all values absent: everything pruned
    _, info3 = scan_with_skip_index(
        spark, idx, [("k", "in", (-5, 999))], schema=df.schema
    )
    assert info3["files_kept"] == 0

    # metadata COUNT: constant-g files prove 'all rows match g IN ...'
    n, cinfo = count_with_skip_index(spark, idx, [("g", "in", (0, 2))])
    assert n == 200
    assert cinfo["files_counted"] == 2 and cinfo["files_scanned"] == 0
    # mixed-lane IN raises loudly
    import pytest as _pytest

    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        prune_files,
    )

    with _pytest.raises(ValueError, match="lanes"):
        prune_files(idx, [("k", "in", (1, "a"))]).collect()


def test_in_list_bloom_pruning_on_scattered_column(spark, tmp_path):
    """IN-list + bloom: on a scattered column whose min/max prove
    nothing, the bloom drops a file only when EVERY listed value is
    provably absent — results stay exact via the residual."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        build_bloom_index,
        build_skip_index,
        scan_with_skip_index,
    )

    out = str(tmp_path / "store")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartitionByRange(6, "o_orderkey").write.parquet(out)
    idx = build_skip_index(spark, out)
    bloom = build_bloom_index(spark, out, ["o_custkey"], m_bits=1 << 14)
    full = spark.read.parquet(out)

    keys = [
        r.o_custkey
        for r in full.select("o_custkey").distinct().limit(2).collect()
    ]
    preds = [("o_custkey", "in", tuple(keys))]
    # without the bloom: min/max keep everything (scattered column)
    _, i0 = scan_with_skip_index(spark, idx, preds)
    assert i0["files_kept"] == 6
    got, i1 = scan_with_skip_index(spark, idx, preds, bloom=bloom)
    want = sorted(
        r.o_orderkey
        for r in full.where(F.col("o_custkey").isin(keys)).collect()
    )
    assert sorted(r.o_orderkey for r in got.collect()) == want
    assert i1["files_kept"] <= i0["files_kept"]

    # planted-absent values: every file provably free of all of them
    _, i2 = scan_with_skip_index(
        spark, idx, [("o_custkey", "in", (-5, -6))], bloom=bloom,
        schema=full.schema,
    )
    assert i2["files_kept"] == 0
