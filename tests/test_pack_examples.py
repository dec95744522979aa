"""Fixed-length example packing (functions/sampling.pack_examples)
vs a pure-Python reference of the same two-stage rule (greedy doc
binning, then head-to-tail cut per bin).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.bpe import (
    bpe_encode,
    train_bpe,
)
from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
    pack_examples,
)

PATH = "/root/testdata/sf0.001/documents.parquet"
W = 64


def _ref_pack(docs, window):
    """docs: list of (shard, order, tokens) -> {(shard, bin, idx): tokens}"""
    out = {}
    by_shard: dict = {}
    for s, o, t in docs:
        by_shard.setdefault(s, []).append((o, t))
    for s, items in by_shard.items():
        items.sort()
        # stage 1: greedy binning by cumulative token count
        cum = 0
        bins: dict[int, list] = {}
        for o, t in items:
            b = cum // window
            bins.setdefault(b, []).extend(t)
            cum += len(t)
        # stage 2: cut each bin's stream
        for b, stream in bins.items():
            for i in range(0, max(len(stream), 1), window):
                chunk = stream[i : i + window]
                if chunk:
                    out[(s, b, i // window)] = chunk
    return out


@pytest.fixture(scope="module")
def tokenized(spark):
    docs = spark.read.parquet(PATH)
    model = train_bpe(docs, n_merges=10)
    tok = bpe_encode(docs, model).withColumn(
        "shard", (F.col("doc_id") % 3).cast("int")
    )
    return tok.select("doc_id", "shard", "bpe_tokens").cache()


def test_pack_examples_matches_python_reference(spark, tokenized):
    got = {
        (r.shard, r.bin, r.example_idx): list(r.tokens)
        for r in pack_examples(
            tokenized, "bpe_tokens", "shard", "doc_id", W
        ).collect()
    }
    docs = [
        (r.shard, r.doc_id, list(r.bpe_tokens)) for r in tokenized.collect()
    ]
    want = _ref_pack(docs, W)
    assert got == want

    # every example is exactly W tokens except at most one per bin
    from collections import Counter

    short = Counter()
    for (s, b, i), toks in got.items():
        assert len(toks) <= W
        if len(toks) < W:
            short[(s, b)] += 1
    assert all(v == 1 for v in short.values())

    # losslessness: every token of every doc appears exactly once
    n_tokens_in = sum(len(t) for _, _, t in docs)
    assert sum(len(t) for t in got.values()) == n_tokens_in


def test_pack_examples_drop_last_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, 1, ["a"] * 10), (0, 2, ["b"] * 7), (0, 3, []), (1, 4, [])],
        "shard int, doc_id bigint, toks array<string>",
    )
    out = pack_examples(df, "toks", "shard", "doc_id", 8)
    rows = {
        (r.shard, r.bin, r.example_idx): list(r.tokens)
        for r in out.collect()
    }
    # shard 0: doc1 tokens 10 -> bin0 gets doc1 (cum 0) ; doc2 at cum 10 -> bin1
    assert rows[(0, 0, 0)] == ["a"] * 8
    assert rows[(0, 0, 1)] == ["a"] * 2
    assert rows[(0, 1, 0)] == ["b"] * 7
    # empty docs produce no examples (shard 1 absent entirely)
    assert not any(s == 1 for s, _, _ in rows)

    full_only = pack_examples(df, "toks", "shard", "doc_id", 8, drop_last=True)
    assert [
        list(r.tokens) for r in full_only.collect()
    ] == [["a"] * 8]
