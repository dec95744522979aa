"""Property test: the data source's pure-Python file pruner is
semantically identical to `skipindex.prune_files` (the DataFrame
implementation the rest of the engine uses) over RANDOM stats
relations and predicate sets — not just the footer-derived cases the
e2e tests cover. Both run the same proof rules; any divergence is a
wrong-results bug on one side (a file the DataFrame lane keeps but
the data source drops would silently lose rows)."""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
    _INDEX_SCHEMA,
    prune_files,
)
from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
    _prune_with_log_stats,
)

_COLS = ["a", "b", "s"]

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def _stat_row(draw, col):
    kind = draw(st.sampled_from(["num", "str", "none"]))
    has = kind != "none" and draw(st.booleans())
    min_num = max_num = min_str = max_str = None
    if has and kind == "num":
        lo, hi = sorted(draw(st.tuples(_finite, _finite)))
        min_num, max_num = lo, hi
    elif has and kind == "str":
        lo, hi = sorted(
            draw(st.tuples(st.text("abc", max_size=3), st.text("abc", max_size=3)))
        )
        min_str, max_str = lo, hi
    return (col, kind if has else "none", None, bool(has),
            min_num, max_num, min_str, max_str)


@st.composite
def _file(draw, idx):
    rows = draw(st.integers(min_value=0, max_value=50))
    stats = []
    for col in draw(st.sets(st.sampled_from(_COLS), max_size=3)):
        r = list(draw(_stat_row(col)))
        # nulls is bounded by the file's row count
        r[2] = draw(st.integers(min_value=0, max_value=rows))
        stats.append(tuple(r))
    return (f"data/f{idx:03d}.parquet", rows, stats)


_pred = st.tuples(
    st.sampled_from(_COLS + ["missing"]),
    st.sampled_from(["=", "<", "<=", ">", ">="]),
    st.one_of(
        st.integers(min_value=-1000, max_value=1000),
        _finite,
        st.text("abc", max_size=3),
    ),
)


@given(
    files=st.lists(
        st.integers(), min_size=1, max_size=6
    ).flatmap(
        lambda seeds: st.tuples(
            *[_file(i) for i in range(len(seeds))]
        )
    ),
    preds=st.lists(_pred, max_size=3),
    # some files have no stats recorded at all (pre-stats manifests)
    statless=st.sets(st.integers(min_value=0, max_value=5), max_size=2),
)
@settings(max_examples=30, deadline=None)
def test_pure_pruner_equals_prune_files(spark, files, preds, statless):
    live = [f for f, _, _ in files]
    rows = {
        f: r for i, (f, r, _) in enumerate(files) if i not in statless
    }
    stats = {
        f: [list(s) for s in ss]
        for i, (f, _, ss) in enumerate(files)
        if i not in statless
    }
    py_kept = set(_prune_with_log_stats(live, rows, stats, preds, []))

    idx_rows = []
    for i, (f, r, ss) in enumerate(files):
        if i in statless:
            continue
        for s in ss:
            idx_rows.append((f, r, *s))
    idx = spark.createDataFrame(idx_rows, _INDEX_SCHEMA)
    df_kept = {r.file for r in prune_files(idx, preds).collect()}
    # prune_files only sees files WITH index rows; files absent from
    # the index (stat-less, or zero stats rows) are always kept by the
    # data source — add them to the DataFrame side before comparing
    indexed = {row[0] for row in idx_rows}
    df_kept |= {f for f in live if f not in indexed}

    assert py_kept == df_kept
    # and pruning never drops a stat-less file
    assert all(f in py_kept for f in live if f not in stats)
