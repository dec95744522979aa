"""Learned quality classifier (functions/classifier.py).

Attack surface: does the trained linear model actually separate a
planted good/bad corpus (the operator's reason to exist), is the
pure-expression scoring lane the same math as the exported weights
(numpy + DuckDB twins), and is the score a pure function of the row
(partition invariance).
"""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.classifier import (
    score_quality,
    train_quality_classifier,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog while reading fine "
    "prose about science history culture and careful measurement"
).split()
BAD = (
    "zxqv qqwz vvxk jjqp zzrw xkcd qpzm wvxx kjzz ppqx rrzv xxqx "
    "zzpp qkvw jxqz wqpz kkxv zpqw vqxz pqzk"
).split()


def _mk_docs(vocab, n, seed, start_id):
    rng = random.Random(seed)
    return [
        (start_id + i, " ".join(rng.choices(vocab, k=30)))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def model_and_data(spark):
    train = _mk_docs(GOOD, 80, 1, 0) + _mk_docs(BAD, 80, 2, 1000)
    labels = [(i, 1) for i, _ in train[:80]] + [
        (i, 0) for i, _ in train[80:]
    ]
    tdf = spark.createDataFrame(train, "doc_id bigint, text string").join(
        spark.createDataFrame(labels, "doc_id bigint, label int"), "doc_id"
    )
    model = train_quality_classifier(tdf, dim=128, reg=1e-4)
    held = _mk_docs(GOOD, 40, 3, 5000) + _mk_docs(BAD, 40, 4, 6000)
    hdf = spark.createDataFrame(held, "doc_id bigint, text string")
    return model, hdf


def test_classifier_separates_planted_corpus(spark, model_and_data):
    model, hdf = model_and_data
    assert model["auc"] > 0.95
    assert model["n_pos"] == 80 and model["n_neg"] == 80
    assert len(model["weights"]) == 128

    scored = score_quality(hdf, model, keep_threshold=0.5)
    got = {r.doc_id: (r.quality_prob, r.quality_keep) for r in scored.collect()}
    correct = sum(
        1
        for i, (p, keep) in got.items()
        if keep == (i < 5000 + 40)  # ids < 5040 are the good docs
    )
    assert correct / len(got) > 0.9


def test_score_lane_matches_numpy_and_duckdb(spark, model_and_data):
    import duckdb
    import numpy as np

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )

    model, hdf = model_and_data
    emb = hashed_tf_embedding(hdf, dim=model["dim"]).toPandas()
    scored = {
        r.doc_id: (r.quality_logit, r.quality_prob)
        for r in score_quality(hdf, model).collect()
    }
    w = np.array(model["weights"])
    for _, row in emb.iterrows():
        want = model["bias"] + float(np.dot(np.array(row.embedding), w))
        got_logit, got_prob = scored[row.doc_id]
        assert got_logit == pytest.approx(want, rel=1e-9, abs=1e-12)
        assert got_prob == pytest.approx(
            1.0 / (1.0 + math.exp(-want)), rel=1e-9
        )

    # DuckDB twin of the dot+sigmoid over the same embedding rows
    con = duckdb.connect()
    con.register("emb", emb)
    wlit = "[" + ",".join(repr(x) for x in model["weights"]) + "]"
    want_duck = dict(con.execute(
        f"""
        SELECT doc_id,
               {model['bias']!r} + list_sum(
                 list_transform(range(1, {model['dim']} + 1),
                                i -> embedding[i] * ({wlit})[i]))
        FROM emb
        """
    ).fetchall())
    for i, (logit, _) in scored.items():
        assert logit == pytest.approx(want_duck[i], rel=1e-9, abs=1e-12)


def test_score_is_partition_invariant_and_validates(spark, model_and_data):
    model, hdf = model_and_data
    a = {r.doc_id: r.quality_logit for r in score_quality(hdf, model).collect()}
    b = {
        r.doc_id: r.quality_logit
        for r in score_quality(hdf.repartition(7), model).collect()
    }
    assert a == b  # bit-exact: deterministic embedding + ordered fold

    with pytest.raises(ValueError, match="dim"):
        score_quality(hdf, {**model, "dim": 64})

    one_label = spark.createDataFrame(
        [(1, "a b c", 1), (2, "d e f", 1)],
        "doc_id bigint, text string, label int",
    )
    with pytest.raises(ValueError, match="both labels"):
        train_quality_classifier(one_label, dim=16)
