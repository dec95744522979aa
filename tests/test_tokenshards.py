"""Megatron indexed-dataset token shards: byte-level layout pinned by
a pure-Python reference writer, round-trips via a Spark-independent
numpy reader, deterministic across re-runs."""
from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.tokenshards import (
    _idx_bytes,
    read_token_shard,
    write_token_shards,
)


def _mk(spark, n=200, vocab=1000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 7 + 1).cast("int")),
            lambda i: F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(vocab)),
        ).alias("tokens"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _mk(spark)
    man = write_token_shards(df, out, n_shards=4)
    assert man["dtype"] == "uint16"  # vocab 1000 fits
    assert man["docs"] == 200
    assert {s["shard"] for s in man["shards"]} <= set(range(4))
    # every document's tokens come back bit-exact, in shard order
    want = {
        r.doc_id: [int(t) for t in r.tokens] for r in df.collect()
    }
    got_docs = 0
    for s in man["shards"]:
        seqs, dtype, doc_idx = read_token_shard(
            os.path.join(out, f"shard-{s['shard']:05d}")
        )
        assert dtype == "uint16"
        assert len(seqs) == s["docs"]
        assert list(doc_idx) == list(range(len(seqs) + 1))
        got_docs += len(seqs)
        assert sum(len(q) for q in seqs) == s["tokens"]
    assert got_docs == 200
    # collect all sequences and match the multiset of token lists
    all_seqs = []
    for s in man["shards"]:
        seqs, _, _ = read_token_shard(
            os.path.join(out, f"shard-{s['shard']:05d}")
        )
        all_seqs.extend([list(map(int, q)) for q in seqs])
    assert sorted(all_seqs) == sorted(want.values())


def test_deterministic_bytes(spark, tmp_path):
    df = _mk(spark, 120)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_token_shards(df, a, n_shards=3)
    write_token_shards(df.orderBy(F.rand(7)), b, n_shards=3)  # any order in
    for n in sorted(os.listdir(a)):
        if n == "manifest.json":
            continue
        with open(os.path.join(a, n), "rb") as f1, open(
            os.path.join(b, n), "rb"
        ) as f2:
            assert f1.read() == f2.read(), n


def test_idx_layout_matches_reference_bytes():
    """The executor-written .idx equals the documented Megatron layout
    byte for byte: magic, version, dtype code, counts, int32 sizes,
    int64 pointers (cumulative byte offsets), int64 doc_idx."""
    import numpy as np

    body = _idx_bytes("uint16", [3, 1, 4], [0, 1, 2, 3])
    assert body[:9] == b"MMIDIDX\x00\x00"
    assert struct.unpack("<Q", body[9:17])[0] == 1
    assert body[17] == 8  # uint16 code
    assert struct.unpack("<Q", body[18:26])[0] == 3
    assert struct.unpack("<Q", body[26:34])[0] == 4
    sizes = np.frombuffer(body[34:46], dtype=np.int32)
    assert list(sizes) == [3, 1, 4]
    pointers = np.frombuffer(body[46:70], dtype=np.int64)
    assert list(pointers) == [0, 6, 8]  # bytes: 3*2, +1*2
    doc_idx = np.frombuffer(body[70:102], dtype=np.int64)
    assert list(doc_idx) == [0, 1, 2, 3]


def test_explicit_shard_col_and_dtype(spark, tmp_path):
    out = str(tmp_path / "s")
    df = _mk(spark, 60).withColumn(
        "part", (F.col("doc_id") % 2).cast("int")
    )
    man = write_token_shards(
        df, out, shard_col="part", n_shards=2, dtype="int32"
    )
    assert man["dtype"] == "int32"
    assert len(man["shards"]) == 2
    seqs, dtype, _ = read_token_shard(os.path.join(out, "shard-00000"))
    assert dtype == "int32"
    assert len(seqs) == 30  # even doc_ids


def test_dtype_overflow_fails_loudly(spark, tmp_path):
    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.array(F.lit(70000)).alias("tokens"),
    )
    man = write_token_shards(df, str(tmp_path / "ok"), n_shards=1)
    assert man["dtype"] == "int32"  # auto widens past uint16
    with pytest.raises(Exception, match="outside"):
        write_token_shards(
            df, str(tmp_path / "bad"), n_shards=1, dtype="uint16"
        )
