"""Distributed BPE training/encoding (functions/bpe.py) vs a pure-
Python reference implementation of Sennrich et al.'s algorithm.

The oracle is exact: same tokenization, same tie-break (count desc,
pair lexicographic), same greedy non-overlapping merge — the learned
merge TABLES must be identical, and the encoder must reproduce the
reference tokenization losslessly.
"""
from __future__ import annotations

from collections import Counter

import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.bpe import (
    EOW,
    bpe_encode,
    train_bpe,
)

PATH = "/root/testdata/sf0.001/documents.parquet"


def _ref_word_counts(texts):
    wc: Counter = Counter()
    for t in texts:
        wc.update((t or "").split())
    return wc


def _ref_train(word_counts, n_merges, min_pair_count=2):
    syms = {
        w: tuple(list(w[:-1]) + [w[-1] + EOW]) for w in word_counts
    }
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append([a, b])
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def _ref_encode(word, merges):
    syms = list(word[:-1]) + [word[-1] + EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(PATH).select("doc_id", "text")
    texts = [r.text for r in docs.collect()]
    return docs, texts


def test_train_bpe_matches_reference_exactly(spark, corpus):
    # local_words=0 pins the DISTRIBUTED rounds against the reference
    # (the r12 driver-local merge loop would otherwise absorb this
    # corpus's bounded vocabulary); the local lane is pinned by
    # test_train_bpe_local_lane_matches_distributed below
    docs, texts = corpus
    model = train_bpe(docs, n_merges=25, local_words=0)
    want = _ref_train(_ref_word_counts(texts), 25)
    assert model["merges"] == want
    assert len(model["merges"]) == 25  # corpus is big enough

    # determinism: partitioning never changes the learned table
    again = train_bpe(docs.repartition(7), n_merges=10, local_words=0)
    assert again["merges"] == want[:10]


def test_train_bpe_local_lane_matches_distributed(spark, corpus):
    """r12 driver-local merge rounds: identical merge table to the
    distributed rounds AND to the pure-Python reference, including the
    early-stop round count."""
    docs, texts = corpus
    m_local = train_bpe(docs, n_merges=12, local_words=1_000_000)
    m_dist = train_bpe(docs, n_merges=12, local_words=0)
    assert m_local == m_dist
    assert m_local["merges"] == _ref_train(_ref_word_counts(texts), 12)

    # early-stop parity on a tiny corpus (default threshold -> local)
    tiny = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id bigint, text string"
    )
    assert train_bpe(tiny, n_merges=10) == train_bpe(
        tiny, n_merges=10, local_words=0
    )


def test_bpe_encode_matches_reference_and_is_lossless(spark, corpus):
    docs, texts = corpus
    model = train_bpe(docs, n_merges=25)
    got = {
        r.doc_id: (list(r.bpe_tokens), r.bpe_token_count)
        for r in bpe_encode(docs, model).collect()
    }
    by_id = {r.doc_id: r.text for r in docs.collect()}
    assert set(got) == set(by_id)
    for d, text in by_id.items():
        want_tokens = []
        for w in (text or "").split():
            want_tokens.extend(_ref_encode(w, model["merges"]))
        toks, cnt = got[d]
        assert toks == want_tokens, d
        assert cnt == len(want_tokens)
        # lossless: concatenating tokens and stripping EOW markers
        # reconstructs the text without whitespace
        assert "".join(toks).replace(EOW, "") == "".join(
            (text or "").split()
        )


def test_train_bpe_early_stop_and_validation(spark):
    tiny = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id bigint, text string"
    )
    # pairs: (a,b)x2 eligible; everything else count 1 < min_pair_count
    model = train_bpe(tiny, n_merges=10)
    assert [tuple(m) for m in model["merges"]][0] == ("a", "b" + EOW)
    assert len(model["merges"]) < 10  # stopped when singletons remained

    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(tiny, 0)
