"""Statistical calibration of the probabilistic lanes (VERDICT r08 #1).

The r07/r08 lesson: the MinHash permutation family was degenerate for
seven rounds while every bit-exact DuckDB twin stayed green, because
both engines shared the broken constant — cross-engine equality proves
REPRODUCIBILITY, not SEMANTICS. These tests pin the math itself against
planted corpora whose TRUE similarity is known by construction:

- MinHash: per-component agreement is Bernoulli(J), so the estimator's
  mean must sit within binomial bounds of the true Jaccard at several J
  levels AND — the part that actually catches the r07 degeneracy — its
  per-pair mean-squared error must match J(1-J)/K. The degenerate
  family ("do the docs share the globally-min shingle") has the CORRECT
  mean (P = J exactly) but 12x the variance: est in {0,1} instead of
  granularity 1/K. A mean-only calibration would have stayed green for
  seven rounds too.
- LSH banding: empirical candidate rate tracks the s-curve
  1-(1-J^r)^b. The degenerate family's collision rate is J itself,
  outside the binomial envelope at both tails (J=0.2: 0.203 vs 0.032).
- SimHash: bit-agreement between docs sharing a fraction rho of m
  unique tokens converges (CLT over the +-1 token votes) to the
  arccos law 1 - arccos(rho)/pi.
- sign-LSH: for isotropic vector pairs at planted angle theta,
  per-coordinate sign agreement is the hyperplane law q = 1-theta/pi
  and the engine's banded candidate rate is 1-(1-q^bits)^bands.

Everything is DETERMINISTIC (md5-derived hashes, seeded numpy), so the
binomial-style tolerances are safety margins, not flake budgets.

Shared-constant sweep (the written check VERDICT r08 #1 asked for —
could any OTHER lane hide a degenerate family behind a shared-constant
twin the way q18/q19 did?):
- q18/q19 (MinHash sigs + LSH recall): the failure mode that happened;
  pinned here by the MSE + s-curve assertions.
- q32 (SimHash): its md5 constants are shared with the DuckDB twin, so
  a vote-collapse degeneracy (e.g. all bits driven by one token) would
  agree cross-engine; pinned here by the arccos law, which such a
  collapse fails at rho<1 (agreement would saturate at ~1).
- q29 (sign-LSH near-dup): axis-aligned planes are shared with the
  twin; a plane-collapse degeneracy (all bands keying one coordinate)
  would agree cross-engine; pinned here by the banded s-curve, which
  collapse fails (candidate rate would be q, not 1-(1-q^4)^8).
- q21/q33/q58-q60 (cosine/IVF/PQ): NOT probabilistic — exact integer /
  IEEE arithmetic with recall pinned against exact anchors; no shared
  random family exists to degenerate.
- q37 (exact Jaccard): set arithmetic, no estimator.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
    minhash_band_pairs,
    minhash_signature,
    simhash,
)

K = 12          # num_hashes (the full MINHASH_AB family)
BANDS, ROWS = 4, 3
M_SHINGLES = 80  # shingles per planted doc


def _planted_shingles(spark, levels, pairs_per_level):
    """(doc_id, shingle) relation of doc PAIRS with exact Jaccard:
    each pair shares c of its 2 x 80 shingles, J_true = c/(160-c);
    namespaced shingles make cross-pair collisions impossible."""
    rows = []
    j_true = []
    for li, j in enumerate(levels):
        c = round(2 * M_SHINGLES * j / (1 + j))
        j_true.append(c / (2 * M_SHINGLES - c))
        for p in range(pairs_per_level):
            base = f"L{li}p{p}"
            shared = [f"{base}s{i}" for i in range(c)]
            for side, tag in ((0, "a"), (1, "b")):
                doc = 2 * (li * pairs_per_level + p) + side
                uniq = [f"{base}{tag}{i}" for i in range(M_SHINGLES - c)]
                rows.extend((doc, s) for s in shared + uniq)
    return (
        spark.createDataFrame(rows, "doc_id long, shingle string"),
        j_true,
    )


def test_minhash_estimator_calibration(spark):
    """Mean AND second moment of the MinHash estimator vs known true
    Jaccard — the assertion set the degenerate r07 family fails."""
    levels = [0.9, 0.7, 0.5, 0.2]
    P = 200
    shingles, j_true = _planted_shingles(spark, levels, P)
    sigs = {
        r.doc_id: [r[f"mh_{i}"] for i in range(K)]
        for r in minhash_signature(shingles, num_hashes=K).collect()
    }
    means = []
    for li, jt in enumerate(j_true):
        ests = []
        for p in range(P):
            a = sigs[2 * (li * P + p)]
            b = sigs[2 * (li * P + p) + 1]
            ests.append(sum(x == y for x, y in zip(a, b)) / K)
        mean = sum(ests) / P
        means.append(mean)
        # (1) unbiasedness: binomial bound on the mean of P pairs of
        # K Bernoulli(J) components (+1% family-imperfection slack —
        # the linear universal family is only approximately min-wise)
        tol = 4.5 * math.sqrt(jt * (1 - jt) / (K * P)) + 0.01
        assert abs(mean - jt) <= tol, (jt, mean, tol)
        # (2) concentration: per-pair MSE must be J(1-J)/K, NOT the
        # J(1-J) a {0,1}-degenerate family produces (12x larger).
        # This is the assertion that catches the seven-round defect.
        mse = sum((e - jt) ** 2 for e in ests) / P
        ref = jt * (1 - jt) / K
        assert 0.3 * ref <= mse <= 2.5 * ref, (jt, mse, ref)
        # (3) granularity: a real K-component estimator takes many
        # values strictly inside (0, 1) at mid similarity
        if 0.3 <= jt <= 0.8:
            interior = {e for e in ests if 0.0 < e < 1.0}
            assert len(interior) >= 3, sorted(set(ests))
    # (4) monotone in true similarity
    assert means == sorted(means, reverse=True), means


def test_lsh_band_collision_s_curve(spark):
    """The ENGINE's banded candidate generation (minhash_band_pairs,
    the q19 lane) empirically tracks 1-(1-J^r)^b at every J level."""
    levels = [0.9, 0.7, 0.5, 0.2]
    P = 200
    shingles, j_true = _planted_shingles(spark, levels, P)
    sigs = minhash_signature(shingles, num_hashes=K)
    cands = {
        (r.id_a, r.id_b)
        for r in minhash_band_pairs(
            sigs, num_hashes=K, bands=BANDS
        ).collect()
    }
    for li, jt in enumerate(j_true):
        hits = sum(
            (2 * (li * P + p), 2 * (li * P + p) + 1) in cands
            for p in range(P)
        )
        rate = hits / P
        theory = 1 - (1 - jt**ROWS) ** BANDS
        tol = 4.5 * math.sqrt(theory * (1 - theory) / P) + 0.02
        assert abs(rate - theory) <= tol, (jt, rate, theory, tol)
    # cross-pair collisions (disjoint shingle namespaces) are hash
    # accidents with probability ~2^-93 per band; none may appear
    planted = {
        (2 * i, 2 * i + 1) for i in range(len(levels) * P)
    }
    assert cands <= planted


def test_simhash_agreement_arccos_law(spark):
    """SimHash bit agreement between docs sharing a fraction rho of
    m=201 unique tokens converges to 1 - arccos(rho)/pi (bivariate-CLT
    over the +-1 votes; odd m so vote sums never tie)."""
    m = 201
    levels = [0.9, 0.6, 0.3, 0.0]
    P = 120
    bits = 16
    rows = []
    rho_true = []
    for li, rho in enumerate(levels):
        c = round(rho * m)
        rho_true.append(c / m)
        for p in range(P):
            base = f"L{li}p{p}"
            shared = [f"{base}s{i}" for i in range(c)]
            for side, tag in ((0, "a"), (1, "b")):
                doc = 2 * (li * P + p) + side
                toks = shared + [f"{base}{tag}{i}" for i in range(m - c)]
                rows.append((doc, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hs = {r.doc_id: r.simhash for r in simhash(df, bits=bits).collect()}
    qs = []
    for li, rt in enumerate(rho_true):
        agree = 0
        for p in range(P):
            x = hs[2 * (li * P + p)] ^ hs[2 * (li * P + p) + 1]
            agree += bits - bin(x & ((1 << bits) - 1)).count("1")
        q = agree / (bits * P)
        qs.append(q)
        theory = 1 - math.acos(rt) / math.pi
        # binomial over bits*P independent positions + CLT slack
        tol = 4.5 * math.sqrt(theory * (1 - theory) / (bits * P)) + 0.02
        assert abs(q - theory) <= tol, (rt, q, theory, tol)
    assert qs == sorted(qs, reverse=True), qs


def test_sign_lsh_hyperplane_law(spark):
    """Isotropic vector pairs at planted angle theta: per-coordinate
    sign agreement follows q = 1 - theta/pi, and the ENGINE's banded
    candidate rate (sign_lsh_candidates, the q29 lane) follows
    1-(1-q^bits)^bands."""
    np = pytest.importorskip("numpy")
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        sign_lsh_candidates,
    )

    rng = np.random.default_rng(20260815)
    d, bands, bits = 32, 8, 4
    P = 400
    thetas = [45.0, 72.0, 108.0, 144.0]
    vecs = []
    for li, deg in enumerate(thetas):
        th = math.radians(deg)
        for p in range(P):
            u = rng.standard_normal(d)
            u /= np.linalg.norm(u)
            w = rng.standard_normal(d)
            w -= (w @ u) * u
            w /= np.linalg.norm(w)
            v = math.cos(th) * u + math.sin(th) * w
            base = 2 * (li * P + p)
            vecs.append((base, [float(x) for x in u]))
            vecs.append((base + 1, [float(x) for x in v]))
        # closed-form check on the raw data: mean sign agreement over
        # coordinates (projection of an isotropic pair on a fixed axis
        # == projection of a fixed pair on a random hyperplane)
        agree = np.mean([
            np.mean(
                (np.array(vecs[-2 * P + 2 * i][1]) >= 0)
                == (np.array(vecs[-2 * P + 2 * i + 1][1]) >= 0)
            )
            for i in range(P)
        ])
        q_theory = 1 - th / math.pi
        assert abs(agree - q_theory) <= 0.03, (deg, agree, q_theory)

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cands = {
        (r.id_a, r.id_b)
        for r in sign_lsh_candidates(
            emb, bands=bands, bits=bits
        ).collect()
    }
    for li, deg in enumerate(thetas):
        th = math.radians(deg)
        q = 1 - th / math.pi
        theory = 1 - (1 - q**bits) ** bands
        hits = sum(
            (2 * (li * P + p), 2 * (li * P + p) + 1) in cands
            for p in range(P)
        )
        rate = hits / P
        tol = 4.5 * math.sqrt(max(theory * (1 - theory), 1e-4) / P) + 0.03
        assert abs(rate - theory) <= tol, (deg, rate, theory, tol)


def test_bloom_filter_fpr_tracks_closed_form(spark, tmp_path):
    """The bloom file index's stored filters follow the textbook
    false-positive law (1 - e^(-kn/m))^k: probe absent values against
    the ENGINE-built bits (evaluated with the probe path's own
    canonical hash) and pin the measured FP rate inside binomial
    bounds of theory — a degenerate hash family (all k positions
    collapsing, bits saturating) fails on either side. Present values
    must never be false negatives (the contract wrong hashing broke in
    r08's ADVICE finding)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.skipindex import (
        _bloom_canon,
        _bloom_positions,
        build_bloom_index,
    )

    n, m_bits, k = 500, 1 << 12, 4
    out = str(tmp_path / "store")
    spark.createDataFrame(
        [(i,) for i in range(n)], "v long"
    ).coalesce(1).write.parquet(out)
    bloom = build_bloom_index(spark, out, ["v"], m_bits=m_bits, k=k)
    row = bloom.collect()[0]
    assert row.n_values == n and row.lane == "num"
    words = [w & ((1 << 64) - 1) for w in row.bits]

    def present(value) -> bool:
        _, canon = _bloom_canon(value)
        return all(
            (words[p // 64] >> (p % 64)) & 1
            for p in _bloom_positions(canon, m_bits, k)
        )

    # zero false negatives over every stored value
    assert all(present(i) for i in range(n))
    # false-positive rate on absent values tracks (1 - e^-kn/m)^k
    probes = 4000
    fp = sum(present(10_000 + i) for i in range(probes)) / probes
    theory = (1 - math.exp(-k * n / m_bits)) ** k
    tol = 4.5 * math.sqrt(theory * (1 - theory) / probes) + 0.01
    assert abs(fp - theory) <= tol, (fp, theory, tol)
    # sanity against degenerate extremes: neither empty nor saturated
    ones = sum(bin(w).count("1") for w in words)
    fill_theory = 1 - math.exp(-k * n / m_bits)
    assert abs(ones / m_bits - fill_theory) <= 0.05
