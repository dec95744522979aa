"""Seeded shuffle-and-shard writer (functions/sampling.py).

The dataloader-prep contract: the permutation is a pure function of
the row id (bit-exact DuckDB twin, invariant under input partitioning)
and the materialized layout is one ordered file per shard whose row
order IS the shard's shuffle order.
"""
from __future__ import annotations

import glob
import os

import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
    shuffle_assignment,
    write_shuffled_shards,
)

SF = "/root/testdata/sf0.01/documents.parquet"


def test_shuffle_assignment_matches_duckdb_and_is_partition_invariant(spark):
    import duckdb

    docs = spark.read.parquet(SF).select("doc_id")
    n_shards = 8
    got = {
        r.doc_id: (r.shard, r.shuffle_key)
        for r in shuffle_assignment(docs, "doc_id", n_shards).collect()
    }

    # bit-exact twin: same salted-md5 construction, both hash lanes
    want = dict(
        duckdb.connect().execute(
            f"""
            SELECT doc_id,
                   (('0x' || substring(md5('shuf:s:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {n_shards},
                    ('0x' || substring(md5('shuf:o:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
            FROM '{SF}'
            """
        ).fetchall()
    )
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in want.items()
    }

    # partitioning must not change the permutation (the df.orderBy(rand())
    # failure mode this operator exists to avoid)
    again = {
        r.doc_id: (r.shard, r.shuffle_key)
        for r in shuffle_assignment(
            docs.repartition(7), "doc_id", n_shards
        ).collect()
    }
    assert again == got

    # multinomial balance: every shard within a loose band of n/k
    from collections import Counter

    sizes = Counter(v[0] for v in got.values())
    n = len(got)
    assert len(sizes) == n_shards
    for k in range(n_shards):
        assert 0.5 * n / n_shards < sizes[k] < 1.5 * n / n_shards

    with pytest.raises(ValueError, match="n_shards"):
        shuffle_assignment(docs, "doc_id", 0)


def test_write_shuffled_shards_one_ordered_file_per_shard(spark, tmp_path):
    import pyarrow.parquet as pq

    docs = spark.read.parquet(SF).select("doc_id", "lang")
    out = str(tmp_path / "shards")
    n_shards = 8
    info = write_shuffled_shards(docs, out, "doc_id", n_shards)
    assert info["shards"] == n_shards
    assert info["rows"] == docs.count()

    expect = {
        r.doc_id: (r.shard, r.shuffle_key)
        for r in shuffle_assignment(docs, "doc_id", n_shards).collect()
    }

    seen = []
    for k in range(n_shards):
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard={k}", "*"))
            if f.endswith(".parquet")
        ]
        # one task owned the whole shard -> exactly one data file
        assert len(files) == 1, files
        t = pq.read_table(files[0]).to_pydict()
        ids = t["doc_id"]
        keys = t["shuffle_key"]
        # file row order IS the shard's shuffle order
        assert list(zip(keys, ids)) == sorted(zip(keys, ids))
        for i in ids:
            assert expect[i][0] == k
        seen.extend(ids)

    # the shards partition the corpus: nothing lost, nothing duplicated
    assert sorted(seen) == sorted(expect)

    # a second run is byte-stable on assignment (mode=error refuses
    # overwrite; overwrite mode reproduces the same permutation)
    info2 = write_shuffled_shards(
        docs, out, "doc_id", n_shards, mode="overwrite"
    )
    assert info2 == info
    again = {
        r.doc_id: r.shuffle_key
        for r in spark.read.parquet(out).select(
            "doc_id", "shuffle_key"
        ).collect()
    }
    assert again == {k: v[1] for k, v in expect.items()}
