"""DSIR importance resampling vs a pure-Python reference twin.

Integer columns must match exactly; log-valued doubles are
tolerance-checked (ln ulps differ across engines — the
unigram_logprob precedent); the selection is compared as an ORDERED
list with an explicit decision-margin guard showing the comparison is
not riding on float noise."""

from __future__ import annotations

import hashlib
import math

import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.dsir import (
    dsir_bucket_logratio,
    dsir_features,
    dsir_importance_weights,
    dsir_resample,
    dsir_select,
)

B = 64  # small bucket count so collisions actually happen in-test
ALPHA = 1e-4
SEED = "r10"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_grams(text: str) -> list[str]:
    toks = text.strip().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_features(docs: list[tuple[str, str]]) -> dict[str, dict[int, int]]:
    out: dict[str, dict[int, int]] = {}
    for did, text in docs:
        buckets: dict[int, int] = {}
        for g in _py_grams(text):
            b = _h32("dsir:" + g) % B
            buckets[b] = buckets.get(b, 0) + 1
        out[did] = buckets
    return out


def _py_logratio(tf, rf) -> dict[int, float]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for d in tf.values():
        for b, c in d.items():
            tc[b] = tc.get(b, 0) + c
    for d in rf.values():
        for b, c in d.items():
            rc[b] = rc.get(b, 0) + c
    tt = sum(tc.values())
    rt = sum(rc.values())
    out = {}
    for b in set(tc) | set(rc):
        lp = math.log((tc.get(b, 0) + ALPHA) / (tt + ALPHA * B))
        lq = math.log((rc.get(b, 0) + ALPHA) / (rt + ALPHA * B))
        out[b] = lp - lq
    return out


def _py_weights(rf, ratio) -> dict[str, tuple[int, float]]:
    out = {}
    for did, buckets in rf.items():
        acc = 0.0
        for b in sorted(buckets):  # same left-to-right bucket fold
            acc += buckets[b] * ratio.get(b, 0.0)
        out[did] = (sum(buckets.values()), acc)
    return out


def _py_key(did: str, log_w: float, temperature=1.0) -> float:
    u = (_h32(f"gum:{SEED}:{did}") + 0.5) / 2**32
    return log_w / temperature + -math.log(-math.log(u))


# raw corpus: half "code-like", half "prose-like"; target is prose
RAW = [
    (f"c{i}", f"def fn{i} ( x ) : return x + {i} ; end fn{i}")
    for i in range(15)
] + [
    (f"p{i}", f"the quiet river {i} flows past the old stone bridge today")
    for i in range(15)
]
TARGET = [
    (f"t{i}", f"a river runs past the bridge and the stone mill {i}")
    for i in range(8)
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id string, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
    return raw, tgt


def test_features_match_reference(spark, frames):
    raw, _ = frames
    got = {
        (r.doc_id, r.bucket): r.c
        for r in dsir_features(raw, n_buckets=B).collect()
    }
    ref = _py_features(RAW)
    want = {
        (did, b): c for did, bs in ref.items() for b, c in bs.items()
    }
    assert got == want


def test_weights_match_reference(spark, frames):
    raw, tgt = frames
    rf = dsir_features(raw, n_buckets=B)
    tf = dsir_features(tgt, n_buckets=B)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets=B, alpha=ALPHA)
    got = {
        r.doc_id: (r.n_grams, r.log_w)
        for r in dsir_importance_weights(rf, ratio).collect()
    }
    ref = _py_weights(
        _py_features(RAW), _py_logratio(_py_features(TARGET), _py_features(RAW))
    )
    assert set(got) == set(ref)
    for did in ref:
        assert got[did][0] == ref[did][0], did  # n_grams exact
        assert got[did][1] == pytest.approx(ref[did][1], rel=1e-12, abs=1e-12)


def test_resample_matches_reference_topk(spark, frames):
    raw, tgt = frames
    rf = dsir_features(raw, n_buckets=B)
    tf = dsir_features(tgt, n_buckets=B)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets=B, alpha=ALPHA)
    w = dsir_importance_weights(rf, ratio)
    k = 10
    got = dsir_resample(w, k, seed=SEED).collect()
    ref_w = _py_weights(
        _py_features(RAW), _py_logratio(_py_features(TARGET), _py_features(RAW))
    )
    keyed = sorted(
        ((_py_key(d, lw), d) for d, (_, lw) in ref_w.items()),
        key=lambda t: (-t[0], t[1]),
    )
    # the decision margin at the k boundary dwarfs float noise, so the
    # ordered selection must agree exactly
    margin = keyed[k - 1][0] - keyed[k][0]
    assert margin > 1e-6
    assert [r.doc_id for r in got] == [d for _, d in keyed[:k]]
    for r in got:
        assert r.key == pytest.approx(
            dict(((d, kk) for kk, d in keyed))[r.doc_id], rel=1e-9
        )


def test_select_prefers_target_like_docs(spark, frames):
    """Behavioral gate: with a prose target, the selection is
    dominated by prose docs — the operator actually selects."""
    raw, tgt = frames
    picked = dsir_select(raw, tgt, k=10, n_buckets=B, seed=SEED)
    rows = picked.collect()
    assert len(rows) == 10
    prose = sum(1 for r in rows if r.doc_id.startswith("p"))
    assert prose >= 8
    keys = [r.key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert set(picked.columns) == {"doc_id", "text", "n_grams", "log_w", "key"}


def test_resample_deterministic_and_seed_sensitive(spark, frames):
    raw, tgt = frames
    rf = dsir_features(raw, n_buckets=B)
    tf = dsir_features(tgt, n_buckets=B)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets=B, alpha=ALPHA)
    w = dsir_importance_weights(rf, ratio)
    a = [r.doc_id for r in dsir_resample(w, 10, seed=SEED).collect()]
    b = [r.doc_id for r in dsir_resample(w, 10, seed=SEED).collect()]
    c = [r.doc_id for r in dsir_resample(w, 10, seed="other").collect()]
    assert a == b
    assert a != c  # different gumbel draw reshuffles the boundary


def test_temperature_flattens_selection(spark, frames):
    """T -> infinity degenerates toward uniform sampling: the prose
    dominance under T=1 must weaken at very high temperature."""
    raw, tgt = frames
    rf = dsir_features(raw, n_buckets=B)
    tf = dsir_features(tgt, n_buckets=B)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets=B, alpha=ALPHA)
    w = dsir_importance_weights(rf, ratio)
    sharp = dsir_resample(w, 15, seed=SEED, temperature=0.25).collect()
    flat = dsir_resample(w, 15, seed=SEED, temperature=1e6).collect()
    prose_sharp = sum(1 for r in sharp if r.doc_id.startswith("p"))
    prose_flat = sum(1 for r in flat if r.doc_id.startswith("p"))
    assert prose_sharp == 15  # low T: pure exploitation
    assert prose_flat < 15  # high T: code docs leak in

    with pytest.raises(ValueError):
        dsir_resample(w, 0, seed=SEED)
    with pytest.raises(ValueError):
        dsir_resample(w, 5, seed=SEED, temperature=0.0)


def test_topk_plan_is_take_ordered(spark, frames):
    """The selection must execute as TakeOrderedAndProject, not a
    global sort of the corpus."""
    raw, tgt = frames
    rf = dsir_features(raw, n_buckets=B)
    tf = dsir_features(tgt, n_buckets=B)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets=B, alpha=ALPHA)
    w = dsir_importance_weights(rf, ratio)
    plan = dsir_resample(w, 5, seed=SEED)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
