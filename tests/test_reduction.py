"""PCA embedding reduction (`functions/reduction.py`) vs a numpy SVD
oracle: subspace agreement up to sign, explained variance matched,
monotone coverage, unit-norm outputs."""

from __future__ import annotations

import numpy as np
import pytest

from aws_glue_data_catalog_replication_utility_spark.functions.reduction import (
    pca_reduce,
)

SF = "/root/testdata/sf0.001"


def _numpy_pca(X: np.ndarray, k: int):
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (X.shape[0] - 1)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    return w[:k], V[:, :k], w.sum()


def test_pca_reduce_matches_numpy_oracle(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    k = 4

    red, ratios = pca_reduce(emb, k, renormalize=False)
    got = {r.vec_id: np.array(r.embedding) for r in red.collect()}

    w, V, total = _numpy_pca(X, k)
    # explained variance ratios
    assert np.allclose(ratios, w / total, atol=1e-6)
    # projections agree up to per-component sign (distinct eigenvalues).
    # MLlib derives components from the CENTERED covariance but applies
    # the rotation to the RAW vectors (no mean subtraction at
    # transform) — the oracle mirrors that
    want = X @ V
    got_m = np.array([got[i] for i in ids])
    for j in range(k):
        col_match = np.allclose(got_m[:, j], want[:, j], atol=1e-4)
        col_flip = np.allclose(got_m[:, j], -want[:, j], atol=1e-4)
        assert col_match or col_flip, f"component {j} subspace mismatch"


def test_pca_reduce_monotone_coverage_and_norms(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, r2 = pca_reduce(emb, 2)
    red8, r8 = pca_reduce(emb, 8)
    assert sum(r8) >= sum(r2) - 1e-9  # more components never explain less
    assert r8[:2] == pytest.approx(r2, abs=1e-9)
    # renormalized outputs are unit vectors of length k
    sample = red8.limit(20).collect()
    for r in sample:
        v = np.array(r.embedding)
        assert v.shape == (8,)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)

    with pytest.raises(ValueError, match="k must be"):
        pca_reduce(emb, 0)


def test_pca_reduce_feeds_cosine_lane(spark):
    """Composition: reduced unit vectors run through the exact cosine
    top-k lane unchanged. On LOW-RANK data (an 8-d latent space lifted
    to 64-d — the situation PCA reduction exists for; the driver's
    synthetic embeddings are near-isotropic, where no linear reduction
    can keep neighbors) a 16-component cut keeps nearly all variance
    and most neighbors."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_topk,
    )

    rng = np.random.default_rng(7)
    lift = rng.normal(size=(8, 64))
    lat = rng.normal(size=(300, 8))
    X = lat @ lift + 0.01 * rng.normal(size=(300, 64))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id bigint, embedding array<float>",
    )
    queries = emb.limit(10).select(
        "vec_id", "embedding"
    ).withColumnRenamed("vec_id", "query_id")

    full = cosine_topk(emb, queries, k=10)
    # queries must live in the SAME projected space: reduce the corpus
    # once, then pick the query rows out of the reduced relation
    red_all, _ = pca_reduce(emb, 16)
    qids = [r.query_id for r in queries.select("query_id").collect()]
    red_q = red_all.where(
        red_all.vec_id.isin(qids)
    ).withColumnRenamed("vec_id", "query_id")
    red_topk = cosine_topk(red_all, red_q, k=10)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    inter = pairs(full) & pairs(red_topk)
    recall = len(inter) / max(len(pairs(full)), 1)
    assert recall >= 0.9, recall
