"""overwrite_where (Delta replaceWhere) + stats-pruned match probes.

The properties that matter: the predicate-scoped swap is ONE atomic
version (no delete-then-append window), replacement rows are validated
against the predicate BEFORE any write, NULL-predicate rows survive,
untouched files stay byte-identical in the live set, and the log-stats
candidate pruning shared with delete_where can never change an answer
— pinned by running every pruned operation against a parser-defeated
twin (wrapping the predicate in parens forces the full probe scan) and
requiring identical final content.
"""
from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V
from aws_glue_data_catalog_replication_utility_spark.versioned import (
    _parse_conjuncts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _manifest(root, v):
    with open(os.path.join(root, "_txlog", f"v{v:012d}.json")) as fh:
        return json.load(fh)


# ---------------------------------------------------------------- parser

def test_parse_conjuncts_shapes():
    assert _parse_conjuncts("a = 5") == [("a", "=", 5)]
    assert _parse_conjuncts("a == 5.5") == [("a", "=", 5.5)]
    assert _parse_conjuncts("`weird col` <= 'x''y'") == [
        ("weird col", "<=", "x'y")
    ]
    assert _parse_conjuncts("a > 1 AND b < 'zz' and c >= -2e3") == [
        ("a", ">", 1), ("b", "<", "zz"), ("c", ">=", -2000.0)
    ]
    # literal-first comparisons flip to column-first ops
    assert _parse_conjuncts("5 < a") == [("a", ">", 5)]
    assert _parse_conjuncts("'m' >= b") == [("b", "<=", "m")]
    assert _parse_conjuncts("true = flag") == [("flag", "=", True)]
    # IN lists parse to an 'in' triple (r10c); unsafe shapes give up
    assert _parse_conjuncts("k IN (1, 2)") == [("k", "in", (1, 2))]
    assert _parse_conjuncts("s in ('a', 'b''c')") == [
        ("s", "in", ("a", "b'c"))
    ]
    for bad_in in (
        "k IN (1, NULL)",       # NULL never equi-matches: give up
        "k IN (1, 'a')",        # mixed lanes: no single prune lane
        "k IN ()",              # empty
        "s IN ('a,b', 'c')",    # comma inside quotes defeats the split
    ):
        assert _parse_conjuncts(bad_in) is None, bad_in
    # anything the skip index can't prove -> None (full scan, not wrong)
    for bad in (
        "a = 5 OR b = 6",
        "(a = 5)",
        "upper(a) = 'X'",
        "a = b",
        "a BETWEEN 1 AND 2",
        "a IS NULL",
        "name = 'x AND y'",  # AND inside the string defeats the split
    ):
        assert _parse_conjuncts(bad) is None, bad


# ---------------------------------------------------- replaceWhere core

def test_overwrite_where_is_one_atomic_predicate_swap(
    spark, orders, tmp_path
):
    root = str(tmp_path / "t")
    V.append(orders.repartition(4), root)

    repl = (
        orders.where("o_custkey < 50")
        .withColumn("o_totalprice", F.col("o_totalprice") * 0 + 1.0)
    )
    v = V.overwrite_where(spark, root, "o_custkey < 50", repl)
    assert v == 2

    # content == survivors-of-NOT-pred + replacement, in ONE version
    got = V.read_versioned(spark, root)
    want = orders.where("o_custkey >= 50").unionByName(repl)
    assert _rows(got) == _rows(want)
    assert [h["version"] for h in V.history(root)] == [1, 2]
    m = _manifest(root, 2)
    assert m["action"] == "replace_where"
    assert m["meta"]["predicate"] == "o_custkey < 50"

    # time travel to v1 still exact
    assert _rows(V.read_versioned(spark, root, 1)) == _rows(orders)


def test_overwrite_where_validates_replacement_rows(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    out_of_scope = orders.where("o_custkey >= 50").limit(5)
    with pytest.raises(ValueError, match="satisfy the predicate"):
        V.overwrite_where(spark, root, "o_custkey < 50", out_of_scope)
    # nothing committed by the failed attempt
    assert [h["version"] for h in V.history(root)] == [1]
    # the documented escape hatch writes anyway
    v = V.overwrite_where(
        spark, root, "o_custkey < 50", out_of_scope, validate=False
    )
    assert v == 2


def test_overwrite_where_keeps_null_predicate_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "id int, score double"
    )
    V.append(df.coalesce(1), root)
    repl = spark.createDataFrame([(9, 5.0)], "id int, score double")
    V.overwrite_where(spark, root, "score < 50", repl)
    got = _rows(V.read_versioned(spark, root))
    # row 2 (NULL predicate) and row 3 survive; row 1 replaced by row 9
    assert got == [(2, None), (3, 99.0), (9, 5.0)]


def test_overwrite_where_no_match_still_lands_data(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders.repartition(3), root)
    files_v1 = sorted(glob.glob(os.path.join(root, "data", "*.parquet")))
    repl = spark.createDataFrame(
        [(10**9, 1, 1.0)], "o_orderkey bigint, o_custkey bigint, "
        "o_totalprice double"
    ).where("o_custkey < 0")  # empty relation, trivially valid
    v = V.overwrite_where(spark, root, "o_custkey < 0", repl)
    assert v == 2
    m = _manifest(root, 2)
    assert m["removed"] == []  # nothing matched: no file rewritten
    assert _rows(V.read_versioned(spark, root)) == _rows(orders)
    # original files untouched on disk
    for f in files_v1:
        assert os.path.exists(f)


def test_overwrite_where_evolves_schema(spark, orders, tmp_path):
    root = str(tmp_path / "t")
    V.append(orders, root)
    repl = (
        orders.where("o_custkey < 50")
        .withColumn("source", F.lit("backfill"))
    )
    V.overwrite_where(spark, root, "o_custkey < 50", repl)
    got = V.read_versioned(spark, root)
    assert "source" in got.columns
    n_new = got.where("source = 'backfill'").count()
    assert n_new == repl.count()
    # survivors read back with the new column NULL-padded
    assert got.where("source IS NULL").count() == orders.where(
        "o_custkey >= 50"
    ).count()


# ------------------------------------------------- stats-pruned probes

def _three_range_store(spark, orders, root):
    """Three files with disjoint o_orderkey ranges, so a range
    predicate is provably confined to one file by the log stats."""
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    lo, hi = keys[len(keys) // 3], keys[2 * len(keys) // 3]
    V.append(orders.where(f"o_orderkey < {lo}").coalesce(1), root)
    V.append(
        orders.where(
            f"o_orderkey >= {lo} AND o_orderkey < {hi}"
        ).coalesce(1),
        root,
    )
    V.append(orders.where(f"o_orderkey >= {hi}").coalesce(1), root)
    return lo, hi


def test_delete_where_prunes_probe_from_log_stats(spark, orders, tmp_path):
    root = str(tmp_path / "a")
    twin = str(tmp_path / "b")
    lo, hi = _three_range_store(spark, orders, root)
    _three_range_store(spark, orders, twin)

    pred = f"o_orderkey < {lo}"
    v = V.delete_where(spark, root, pred)
    m = _manifest(root, v)
    # the probe opened ONLY the one stat-overlapping file
    assert m["meta"]["files_total"] == 3
    assert m["meta"]["probe_files_scanned"] == 1
    # parser-defeated twin scans everything; content must agree
    V.delete_where(spark, twin, f"({pred})")
    assert _rows(V.read_versioned(spark, root)) == _rows(
        V.read_versioned(spark, twin)
    )


def test_overwrite_where_prunes_probe_from_log_stats(
    spark, orders, tmp_path
):
    root = str(tmp_path / "a")
    twin = str(tmp_path / "b")
    lo, hi = _three_range_store(spark, orders, root)
    _three_range_store(spark, orders, twin)

    pred = f"o_orderkey >= {hi}"
    repl = orders.where(pred).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    v = V.overwrite_where(spark, root, pred, repl)
    m = _manifest(root, v)
    assert m["meta"]["files_total"] == 3
    assert m["meta"]["probe_files_scanned"] == 1
    assert len(m["removed"]) == 1
    V.overwrite_where(spark, twin, f"({pred})", repl)
    assert _rows(V.read_versioned(spark, root)) == _rows(
        V.read_versioned(spark, twin)
    )


def test_pruned_delete_never_wrong_on_overlapping_stats(
    spark, orders, tmp_path
):
    """Predicate overlapping EVERY file: pruning keeps all candidates
    (meta says so) and the delete is exact."""
    root = str(tmp_path / "t")
    V.append(orders.repartition(4), root)  # hash-partitioned: all overlap
    n_even = orders.where("o_custkey >= 0").count()
    v = V.delete_where(spark, root, "o_custkey >= 0")
    m = _manifest(root, v)
    assert m["meta"]["probe_files_scanned"] == m["meta"]["files_total"] == 4
    assert V.read_versioned(spark, root).count() == orders.count() - n_even


def test_pruned_delete_across_schema_generations(spark, tmp_path):
    """Predicate on a column one generation LACKS: the old-generation
    file has no stats rows for it (unknown keeps -> candidate), the
    widened scan evaluates it NULL (no match), and only the new
    generation's matching file is rewritten."""
    root = str(tmp_path / "t")
    g1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    V.append(g1.coalesce(1), root)
    g2 = spark.createDataFrame(
        [(3, "c", "x"), (4, "d", "y")], "id int, s string, extra string"
    )
    V.append(g2.coalesce(1), root)

    v = V.delete_where(spark, root, "extra = 'x'")
    got = sorted(tuple(r) for r in V.read_versioned(spark, root).collect())
    assert got == [(1, "a", None), (2, "b", None), (4, "d", "y")]
    m = _manifest(root, v)
    assert len(m["removed"]) == 1  # only the gen2 file rewritten

    # and replaceWhere through the same seam: swap the 'y' region
    repl = spark.createDataFrame(
        [(9, "z", "y")], "id int, s string, extra string"
    )
    V.overwrite_where(spark, root, "extra = 'y'", repl)
    got2 = sorted(tuple(r) for r in V.read_versioned(spark, root).collect())
    assert got2 == [(1, "a", None), (2, "b", None), (9, "z", "y")]


def test_delete_where_in_list_pruned(spark, orders, tmp_path):
    """DELETE ... WHERE k IN (...) prunes the probe to the files whose
    bounds can hold ANY listed value, and matches the unpruned twin."""
    root = str(tmp_path / "a")
    twin = str(tmp_path / "b")
    lo, hi = _three_range_store(spark, orders, root)
    _three_range_store(spark, orders, twin)
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    pick = (keys[0], keys[1])  # both in the first range file
    pred = f"o_orderkey IN ({pick[0]}, {pick[1]})"
    v = V.delete_where(spark, root, pred)
    m = _manifest(root, v)
    assert m["meta"]["probe_files_scanned"] == 1
    V.delete_where(spark, twin, f"({pred})")
    assert _rows(V.read_versioned(spark, root)) == _rows(
        V.read_versioned(spark, twin)
    )
