"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; at 100 TB the scale path
is bucketed LSH (random-hyperplane signs) so candidate generation is an
equi-join, with exact re-ranking inside buckets.

Numeric determinism: dot products are LEFT-TO-RIGHT double folds
(zip_with + aggregate), which the DuckDB oracle reproduces bit-exactly
with list_inner_product over DOUBLE[] — verified, no rounding slop
needed. This is why we do NOT use a Pandas UDF here by default: numpy's
pairwise summation changes the fold order. (A vectorized Pandas-UDF
variant is the right call when throughput matters more than oracle
bit-equality; see `cosine_topk_pandas`.)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ._exprcache import check_context, register_cache


def _fold_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _fold_norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries: (query_id, embedding). Broadcast the (small) query set, so
    the big embeddings table streams once with NO shuffle until the
    per-query top-k aggregation — which is a windowed rank over
    (query_id) keys, k rows out per query.
    """
    from pyspark.sql import Window

    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__e")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__q")
    )
    scored = (
        e.join(F.broadcast(q), on=F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            (
                _fold_dot(F.col("__e"), F.col("__q"))
                / (F.sqrt(_fold_norm2(F.col("__e"))) * F.sqrt(_fold_norm2(F.col("__q"))))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, F.col("cosine"), F.col("__rn").alias("rank"))
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine-similar pairs (id_a < id_b, cosine >= threshold).

    All-pairs self-join — the EXACTNESS BASELINE, quadratic by design
    (the oracle anchor for the LSH path below), same role q17 plays for
    MinHash. Never the 100 TB path: use `sign_lsh_candidates` + exact
    re-rank inside buckets there."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                _fold_dot(F.col("a.__v"), F.col("b.__v"))
                / (
                    F.sqrt(_fold_norm2(F.col("a.__v")))
                    * F.sqrt(_fold_norm2(F.col("b.__v")))
                )
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def sign_lsh_candidates(
    embeddings: DataFrame,
    bands: int = 8,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hyperplane-LSH candidate pairs via coordinate-sign buckets: band b
    keys on the signs of dims [b*bits, (b+1)*bits); vectors sharing any
    band key become a candidate pair (id_a < id_b).

    The 100 TB ANN path: an equi-join on (band, key) — shuffle bounded
    by bucket sizes — instead of the all-pairs cross join. Axis-aligned
    hyperplanes keep it deterministic and oracle-reproducible; swap in
    seeded random projections for production recall tuning (more bits
    per band -> fewer candidates, lower recall; q29 pins the trade
    exactly against the `cosine_pairs` baseline)."""
    sign = lambda i: F.when(F.col(vec_col)[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
    # single scan: posexplode one per-row array of band keys instead of
    # `bands` unioned projections (one scan per join side; the band-key
    # shuffle is identical on both sides -> ReusedExchange)
    keys = F.array(
        *[
            F.concat(*[sign(b * bits + i) for i in range(bits)])
            for b in range(bands)
        ]
    )
    banded = embeddings.select(
        F.col(id_col), F.posexplode(keys).alias("band", "band_key")
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(b_, on=["band", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _semantic_pair_plan(
    embeddings: DataFrame,
    threshold: float,
    assignments: DataFrame,
    pair_blocks: int,
    id_col: str,
    vec_col: str,
):
    """The shared pair-generation plan of semantic_dedup and the
    streaming closure pass: unit-normalize once per row, blocked
    intra-cluster triangle join, exact cosine filter. Returns
    (assigned-unit-vector relation `e`, pair relation
    (id_col > dup_of, cosine >= threshold))."""
    v = F.col(vec_col).cast("array<double>")
    # zero vectors (e.g. empty docs through hashed_tf_embedding) unit-
    # normalize to the zero vector — cosine 0 against everything, never
    # a duplicate (ANSI mode would raise DIVIDE_BY_ZERO unguarded)
    raw_norm = F.sqrt(_fold_norm2(v))
    nrm = F.when(raw_norm == 0, F.lit(1.0)).otherwise(raw_norm)
    unit = F.transform(v, lambda x: x / nrm)
    e = embeddings.select(F.col(id_col), unit.alias("__u")).join(
        assignments.select(id_col, "cluster"), on=id_col
    )
    blocks = F.array(*[F.lit(j) for j in range(pair_blocks)])
    bucket = F.pmod(F.hash(F.col(id_col)), F.lit(pair_blocks))
    a = e.select(
        F.col(id_col).alias("__ida"),
        F.col("__u").alias("__ua"),
        "cluster",
        bucket.alias("__k1"),
        F.explode(blocks).alias("__k2"),
    )
    b = e.select(
        F.col(id_col).alias("__idb"),
        F.col("__u").alias("__ub"),
        "cluster",
        F.explode(blocks).alias("__k1"),
        bucket.alias("__k2"),
    )
    pairs = (
        a.join(b, on=["cluster", "__k1", "__k2"])
        .where(F.col("__ida") > F.col("__idb"))
        .select(
            F.col("__ida").alias(id_col),
            F.col("__idb").alias("dup_of"),
            _fold_dot(F.col("__ua"), F.col("__ub")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return e, pairs


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    n_seeds: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    pair_blocks: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then call two docs
    semantic duplicates when their EXACT cosine clears `threshold`
    within the same cluster — the cluster pass bounds the quadratic
    term to intra-cluster pairs instead of corpus².

    Returns one row per input vector:
    (id, cluster, keep, dup_of, cosine) — greedy min-id keepers (a doc
    is dropped iff a SMALLER-id doc in its cluster clears the
    threshold; `dup_of` is its best match: highest cosine, ties to the
    smallest id), the same keeper rule as every other dedup lane here,
    and SQL-expressible for the DuckDB twin. Like the incremental
    stream (streaming/neardedup.py) this is greedy, not transitive
    closure — feed the pairs into `dedup_clusters` when closure
    matters. Cross-cluster near-dups are missed by construction; that
    is SemDeDup's documented recall trade, tuned by n_seeds (fewer
    clusters -> higher recall, more intra-cluster pairs).

    `assignments` overrides the clustering: any (id, cluster) frame —
    e.g. `quantized_ivf_assignments` against trained k-means
    codebooks. Default is `ivf_assignments`' deterministic seed
    centroids (map-side argmax, zero exchanges), which keeps the whole
    chain oracle-reproducible.

    Plan shape, built for the giant-cluster case (SemDeDup's real
    workload is ~corpus/k docs per cluster, pairs ~(corpus/k)²):
    - vectors are unit-normalized ONCE per row, so each pair costs a
      single dot fold (cosine == dot of units; a zero vector
      normalizes to NaNs and NaN >= threshold is false — zero vectors
      never duplicate anything, same as the raw formula);
    - the intra-cluster self-join is BLOCKED: each side is replicated
      `pair_blocks` times onto (cluster, bucket_i, bucket_j) keys, so
      one cluster's quadratic work lands on pair_blocks² tasks instead
      of one — the standard triangle-join decomposition. Each
      unordered pair meets on exactly one key in each orientation and
      the id inequality keeps exactly one. pair_blocks multiplies
      shuffle volume and divides per-task work quadratically;
      pair_blocks=1 degenerates to the plain cluster equi-join
      (bit-identical results, pinned in tests).
    No cartesian product; the dot is the same left-to-right double
    fold the q21 oracle pins bit-exact against DuckDB."""
    if pair_blocks < 1:
        raise ValueError("pair_blocks must be >= 1")
    if assignments is None:
        assignments = ivf_assignments(
            embeddings, n_seeds=n_seeds, id_col=id_col, vec_col=vec_col
        )
    e, pairs = _semantic_pair_plan(
        embeddings, threshold, assignments, pair_blocks, id_col, vec_col
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("dup_of").asc()
    )
    best = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        e.select(id_col, "cluster")
        .join(best, on=id_col, how="left")
        .select(
            id_col,
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "cosine",
        )
    )


def hashed_tf_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = False,
    l2_normalize: bool = True,
    out_col: str = "embedding",
) -> DataFrame:
    """Text -> vector bridge: signed feature-hashing ("hashing trick")
    term-frequency embeddings, so a corpus with NO precomputed vectors
    can run the whole similarity/ANN stack (cosine_topk, sign-LSH,
    IVF-PQ index) straight from its text column.

    Each token t adds sign(t) to bucket(t): bucket = base md5 hash mod
    `dim`, sign = ±1 from an independent md5 slice (the signed variant
    keeps collisions unbiased — E[collision contribution] = 0).

    Plan shape: explode tokens -> (id, bucket, sign) projection (ONE
    md5 pair per token, whole-stage codegen) -> groupBy(id, bucket)
    SUM with map-side partial aggregation -> groupBy(id) map
    assembly -> dense dim-long array via element_at lookups. Two
    shuffles whose combined volume is bounded by docs x min(dim,
    distinct tokens) — the standard TF-pipeline shape, linear in
    corpus size at 100 TB. (A shuffle-free all-expression variant
    exists but higher-order lambdas are interpreted WITHOUT common
    subexpression elimination, so the per-token hashing re-executes
    once per output bucket — measured ~200x slower at dim=64; the
    exploded lane keeps every md5 inside codegen, exactly once.)

    Determinism: bucket sums are integer adds (order-free); the L2
    norm is the usual left-to-right double fold over bucket order, so
    a DuckDB twin reproduces every value bit-for-bit (same md5-slice
    arithmetic as the MinHash family, dedup.py:127). Docs with no
    tokens (empty/NULL text) embed to the ZERO vector, not NULL —
    explode_outer keeps their row alive through the aggregations.

    normalize=True applies `normalize_text` first (casefold etc.), so
    case-variant duplicates embed to the identical vector. Returns
    df rows as (id_col, out_col array<double>)."""
    from .dedup import _base_hash, _token_expr

    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = F.filter(_token_expr(text_col, normalize), lambda t: t != F.lit(""))
    tok = F.col("__tok")
    scored = df.select(
        F.col(id_col), F.explode_outer(toks).alias("__tok")
    ).select(
        id_col,
        # empty docs ride through as a sentinel bucket no lookup reads
        F.coalesce(F.pmod(_base_hash(tok), F.lit(dim)), F.lit(-1)).alias("__b"),
        F.coalesce(
            F.lit(1) - F.lit(2) * F.pmod(
                F.conv(F.substring(F.md5(tok), 9, 8), 16, 10).cast("long"),
                F.lit(2),
            ),
            F.lit(0),
        ).alias("__s"),
    )
    sums = scored.groupBy(id_col, "__b").agg(F.sum("__s").alias("__v"))
    assembled = sums.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__v")))
        ).alias("__m")
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("long")), F.lit(0)
        ).cast("double"),
    )
    out = assembled.select(F.col(id_col), raw.alias("__raw"))
    if not l2_normalize:
        return out.select(F.col(id_col), F.col("__raw").alias(out_col))
    # stacked selects on purpose: "__raw"/"__n" are each referenced more
    # than once downstream, which stops CollapseProject from inlining
    # (and so re-evaluating) the expensive array expressions
    with_norm = out.select(
        F.col(id_col), "__raw", F.sqrt(_fold_norm2(F.col("__raw"))).alias("__n")
    )
    return with_norm.select(
        F.col(id_col),
        F.when(
            F.col("__n") > 0,
            F.transform(F.col("__raw"), lambda x: x / F.col("__n")),
        )
        .otherwise(F.col("__raw"))
        .alias(out_col),
    )


def _memo_expr(cache: dict, key, build):
    """Content-keyed memo for literal-folded Column expressions: the
    IVF/PQ lanes fold config-sized codebooks into the projection as
    literals, which costs thousands of Py4J round-trips to construct
    (~2s of every q58/q59 call). An unresolved Column is plan-
    independent and the key is the full literal content, so reuse is
    exact — WITHIN one SparkContext; `check_context` invalidates all
    registered caches across a context restart, since a cached Column
    wraps the old context's Py4J gateway (ADVICE r05). Bounded: these
    caches hold a handful of codebook-sized entries per process."""
    check_context()
    if key not in cache:
        if len(cache) > 64:
            cache.clear()
        cache[key] = build()
    return cache[key]


_CENTROID_MEMO: dict = register_cache({})


def _centroid_literal(seed_rows) -> Column:
    """The centroid set as a literal array<struct<sid, sv>> — tiny
    (config-sized), lives in the plan itself; no broadcast join, no
    shuffle. seed_rows: collected (id, vector) rows. Content-memoized."""
    key = tuple((int(r[0]), tuple(float(x) for x in r[1])) for r in seed_rows)
    return _memo_expr(
        _CENTROID_MEMO,
        key,
        lambda: F.array(
            *[
                F.struct(
                    F.lit(int(r[0])).alias("sid"),
                    F.array(*[F.lit(float(x)) for x in r[1]]).alias("sv"),
                )
                for r in seed_rows
            ]
        ),
    )


def _argmax_cluster(cents: Column, vec: Column) -> Column:
    """Map-side argmax: per row, score every centroid by cosine inside
    one array expression and take the max struct — zero exchanges. Ties
    break toward the smaller seed id via max over struct(cos, -sid).
    A zero vector scores 0 against every centroid (the norm guard —
    ANSI mode raises DIVIDE_BY_ZERO instead of yielding NaN) and lands
    in the smallest seed id by the tie rule; nonzero vectors are
    bit-identical to the unguarded form."""
    raw_norm = F.sqrt(_fold_norm2(vec))
    norm_v = F.when(raw_norm == 0, F.lit(1.0)).otherwise(raw_norm)
    scores = F.transform(
        cents,
        lambda c: F.struct(
            (
                _fold_dot(vec, c["sv"]) / (norm_v * F.sqrt(_fold_norm2(c["sv"])))
            ).alias("cos"),
            (-c["sid"]).alias("negsid"),
        ),
    )
    return (-F.array_max(scores)["negsid"]).cast("long")


def ivf_assignments(
    embeddings: DataFrame,
    n_seeds: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_seeds: int = 4096,
    lane: str = "arrow",
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest-by-cosine
    centroid. Centroids here are the first `n_seeds` vectors by id —
    deterministic and oracle-reproducible; production would k-means them
    (same assignment plan, different seed source). Returns (id, cluster).

    lane="arrow" (default, r12, guide §4.2): the per-row argmax runs
    vectorized in numpy inside mapInArrow (`_assign_arrow_gen`) —
    bit-identical to the expression lane (left-to-right cumsum folds;
    pinned by test) at a fraction of the interpreted-HOF cost, which
    dominated every semantic-dedup phase profile. lane="expr" keeps the
    pure-expression argmax — the documented oracle anchor.

    Plan shape: MAP-SIDE argmax — the centroid set is collected to the
    driver (bounded by max_seeds, raising on overflow like
    cosine_topk_pandas) and folded into ONE narrow projection: per row,
    score all centroids inside an array expression and take the max
    struct. ZERO exchanges before the search join — the whole
    assignment is whole-stage codegen over a single scan. (The previous
    per-vector window argmax shuffled the entire scored corpus just to
    rank n_seeds candidates — at 100 TB that shuffles the whole
    embedding table once per index build.)

    At search time, nprobe=1 reads ONE cluster's bucket instead of the
    full table: the inverted-file layout is a `partitionBy(cluster)`
    write, so cluster pruning is directory pruning.

    Determinism: cosine is the same left-to-right double fold as the
    window lane; ties break toward the smaller seed id via max over
    struct(cos, -seed_id) — bit-identical results to the old plan."""
    if n_seeds > max_seeds:
        raise ValueError(
            f"ivf_assignments folds the centroid set into the projection "
            f"driver-side; n_seeds={n_seeds} exceeds max_seeds={max_seeds} — "
            f"raise max_seeds deliberately or use a coarser quantizer"
        )
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    seed_rows = (
        e.where(F.col(id_col) < n_seeds)
        .orderBy(id_col)
        .collect()
    )
    if lane == "arrow":
        if any(all(float(x) == 0.0 for x in r[1]) for r in seed_rows):
            # the expression lane raises DIVIDE_BY_ZERO (ANSI) on a
            # zero-norm centroid at execution; fail identically-loudly,
            # but driver-side where the seeds already live
            raise ValueError("zero-norm centroid in ivf seed set")
        id_type = e.schema[id_col].dataType.simpleString()
        return e.mapInArrow(
            _assign_arrow_gen([(int(r[0]), list(r[1])) for r in seed_rows]),
            f"`{id_col}` {id_type}, cluster long",
        )
    cents = _centroid_literal(seed_rows)
    return e.select(
        F.col(id_col), _argmax_cluster(cents, F.col("__v")).alias("cluster")
    )


def _assign_arrow_gen(seed_pairs: list[tuple[int, list[float]]]):
    """mapInArrow generator: the vectorized twin of `_argmax_cluster`
    over a (id, __v double-array) relation, pinned bit-identical by
    test_ivf_arrow_lane_matches_expression_lane. Bit-exactness is the
    whole design: dots and norms are left-to-right IEEE folds (a
    leading-zero cumsum — numpy's pairwise `sum` would round
    differently and flip near-tie argmaxes), the zero-norm guard is the
    same `norm==0 -> 1.0`, and np.argmax's first-max/first-NaN rule
    equals Spark's max-over-struct(cos, -sid) ordering (NaN greatest,
    ties to the smaller seed id, seeds pre-sorted by id). Per batch the
    work is one (rows x seeds x dim) product + cumsum in C instead of
    an interpreted fold tree per (row, seed) — and the per-seed norm,
    which the expression lane re-folds per row, is computed once.
    Raises on ragged/null vectors (the expression lane is the anchor
    for exotic shapes)."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        S = np.array([v for _, v in seed_pairs], dtype=np.float64)
        sids = np.array([s for s, _ in seed_pairs], dtype=np.int64)
        k, d = S.shape
        zk = np.zeros((k, 1))
        cn = np.sqrt(np.cumsum(np.concatenate([zk, S * S], axis=1), axis=1)[:, -1])
        if (cn == 0.0).any():
            # the expression lane raises DIVIDE_BY_ZERO (ANSI) on a
            # zero-norm centroid at execution; fail identically-loudly
            raise ValueError("zero-norm centroid in ivf seed set")
        for batch in batches:
            ids = batch.column(0)
            vecs = batch.column(1)
            nrows = len(ids)
            if nrows == 0:
                continue
            offs = vecs.offsets.to_numpy(zero_copy_only=False)
            if vecs.null_count or not (offs[1:] - offs[:-1] == d).all():
                raise ValueError(
                    "ivf arrow lane requires non-null fixed-dim vectors "
                    f"matching the seed dim {d}; use lane='expr' for "
                    "ragged input"
                )
            flat = vecs.values.to_numpy(zero_copy_only=False)
            V = flat[offs[0] : offs[-1]].reshape(nrows, d)
            z1 = np.zeros((nrows, 1))
            rn = np.sqrt(
                np.cumsum(np.concatenate([z1, V * V], axis=1), axis=1)[:, -1]
            )
            rn[rn == 0.0] = 1.0
            best = np.empty(nrows, dtype=np.int64)
            chunk = max(1, 4_000_000 // (k * (d + 1)))
            with np.errstate(divide="ignore", invalid="ignore"):
                for s in range(0, nrows, chunk):
                    Vc = V[s : s + chunk]
                    prods = Vc[:, None, :] * S[None, :, :]
                    z2 = np.zeros((Vc.shape[0], k, 1))
                    dots = np.cumsum(
                        np.concatenate([z2, prods], axis=2), axis=2
                    )[:, :, -1]
                    cos = dots / (rn[s : s + chunk, None] * cn[None, :])
                    best[s : s + chunk] = np.argmax(cos, axis=1)
            yield pa.record_batch(
                [ids, pa.array(sids[best])], names=["id", "cluster"]
            )

    return gen


def dot_udf_available() -> bool:
    """True when pandas+pyarrow are importable (the fast-lane UDF path)."""
    try:
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        return True
    except ImportError:
        return False


def cosine_topk_pandas(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 10_000,
) -> DataFrame:
    """Throughput variant: numpy matmul per Arrow batch via mapInPandas.

    Each batch computes a (batch x num_queries) similarity matrix in one
    BLAS call — the 100 TB lane (10-100x the fold path). Not bit-stable
    vs the oracle (pairwise summation), so benched, not hash-checked.

    The query set is collected to the driver and broadcast inside the
    UDF closure — correct only while it is config-sized. max_queries
    guards that contract: the collect is bounded (limit max_queries+1,
    never an unbounded pull) and overflow raises instead of silently
    OOMing the driver on the 100 TB lane.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_pandas broadcasts the query set driver-side; got "
            f">{max_queries} query rows — raise max_queries deliberately or "
            f"use a join-based lane (cosine_topk / ivf_topk) for large query sets"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_norm.T  # (batch, nq)
            nq = len(q_ids)
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(q_ids, len(ids)),
                    id_col: np.tile(ids, nq),
                    "cosine": sims.T.reshape(-1),
                }
            )

    from pyspark.sql import Window

    scored = (
        embeddings.select(id_col, vec_col)
        .mapInPandas(score, schema=out_schema)
        .where(F.col(id_col) != F.col(query_id_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def _pq_codebook(seed_rows, m: int):
    """codebook[j][c] = the c-th codeword of subspace j (list of ints),
    plus the subspace width. seed_rows: collected quantize_embeddings
    rows (id, n_dims, scale, quantized), ordered by id."""
    dim = seed_rows[0]["n_dims"]
    sub = dim // m
    codebook = [
        [list(r["quantized"])[j * sub : (j + 1) * sub] for r in seed_rows]
        for j in range(m)
    ]
    return codebook, sub


_PQ_CODE_MEMO: dict = register_cache({})


def _pq_code_cols(codebook, m: int, sub: int, n_codewords: int) -> list[Column]:
    """Per-subspace nearest-codeword index over the `quantized` column —
    squared-L2 integer argmin folded into literal expressions (map-side,
    zero exchanges). Ties break toward the smaller codeword index.
    Content-memoized (see _memo_expr)."""
    key = (
        tuple(tuple(tuple(cw) for cw in cws) for cws in codebook),
        m, sub, n_codewords,
    )
    return _memo_expr(
        _PQ_CODE_MEMO, key, lambda: _pq_code_cols_build(codebook, m, sub, n_codewords)
    )


def _sql_int_array(vals) -> str:
    """SQL literal text for an int array — part of the expr-text fast
    path below (one JVM parse instead of one Py4J round-trip per
    literal; the Column-builder equivalent costs seconds for a
    config-sized codebook on a multi-ms-per-call gateway)."""
    return "array(" + ",".join(str(int(x)) for x in vals) + ")"


def _sql_int_l2(vec_sql: str, lit_vals) -> str:
    """Integer squared-L2 between a vector expression and a literal
    array, as SQL text — the same zip_with + BIGINT-accumulator
    aggregate as the Column form, so results are bit-identical."""
    return (
        "aggregate(zip_with("
        + vec_sql
        + ", "
        + _sql_int_array(lit_vals)
        + ", (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x)"
    )


def _sql_neg_l2_struct(vec_sql: str, lit_vals, neg_id: int) -> str:
    """named_struct('negdist', -<integer L2>, 'negc', -<id>) as SQL text
    — byte-for-byte the same function calls as the Column form, so the
    argmin is bit-identical; only the construction path differs."""
    return (
        "named_struct('negdist', -"
        + _sql_int_l2(vec_sql, lit_vals)
        + ", 'negc', "
        + str(-int(neg_id))
        + ")"
    )


def _pq_code_cols_build(codebook, m: int, sub: int, n_codewords: int) -> list[Column]:
    code_cols = []
    for j in range(m):
        structs = ",".join(
            _sql_neg_l2_struct(
                f"slice(quantized, {j * sub + 1}, {sub})", codebook[j][c], c
            )
            for c in range(n_codewords)
        )
        code_cols.append(
            F.expr(f"CAST(-(array_max(array({structs})).negc) AS INT)")
        )
    return code_cols


def pq_codes(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    max_codebook: int = 65536,
    qz: DataFrame | None = None,
    seed_rows=None,
) -> DataFrame:
    """Product-quantization codes over the int8-quantized vectors: the
    vector is split into `m` contiguous subvectors; each subvector maps
    to the nearest (squared-L2) of `k` codewords; the stored code is m
    small ints — with k<=256 that is m BYTES per vector, the standard
    ANN compression step past scalar quantization (which pq composes
    with: codes are computed over quantize_embeddings' int8 codes, so
    every distance is INTEGER arithmetic — exact under any summation
    order, hence bit-identical in the DuckDB oracle; float-L2 PQ would
    hinge on fold order).

    Codebook: per subspace, the subvectors of the first `k` vectors by
    id — deterministic and oracle-reproducible (production k-means
    would replace the seed source, same assignment plan). Collected
    driver-side (bounded by max_codebook entries, raising on overflow)
    and folded into ONE narrow projection — map-side argmin like
    ivf_assignments, zero exchanges. Ties break toward the smaller
    codeword index. Trailing dims beyond m*(dim//m) are ignored by the
    code (document-level contract; dim % m == 0 in practice).

    qz / seed_rows let a caller that already quantized the table (and
    collected its head) share that work instead of re-deriving it —
    pq_adc_topk / ivf_pq_scores pass both, so ONE quantization subplan
    and ONE bounded collect serve the whole search (VERDICT r04 #5
    flagged the duplicate subplan).

    Returns (id, m, codes array<int>)."""
    if m * k > max_codebook:
        raise ValueError(
            f"pq_codes folds the codebook into the projection driver-side; "
            f"m*k={m * k} exceeds max_codebook={max_codebook}"
        )
    if qz is None:
        qz = quantize_embeddings(
            embeddings, id_col=id_col, vec_col=vec_col, levels=levels
        )
    if seed_rows is None:
        seed_rows = qz.where(F.col(id_col) < k).orderBy(id_col).collect()
    if not seed_rows:
        return qz.select(
            F.col(id_col), F.lit(m).alias("m"),
            F.array().cast("array<int>").alias("codes"),
        )
    codebook, sub = _pq_codebook(seed_rows, m)
    code_cols = _pq_code_cols(codebook, m, sub, len(seed_rows))
    return qz.select(
        F.col(id_col), F.lit(m).alias("m"), F.array(*code_cols).alias("codes")
    )


def _adc_luts(query_rows, codebook, m: int, sub: int, n_codewords: int):
    """Per-query ADC lookup tables: luts[qid][j][c] = integer squared-L2
    distance between the query's j-th quantized subvector and codeword
    c. Pure-integer driver-side precompute over the collected head."""
    luts: dict[int, list[list[int]]] = {}
    for qr in query_rows:
        qv = list(qr["quantized"])
        luts[int(qr[0])] = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qv[j * sub : (j + 1) * sub], codebook[j][c])
                )
                for c in range(n_codewords)
            ]
            for j in range(m)
        ]
    return luts


_ADIST_MEMO: dict = register_cache({})


def _adist_expr(lut, m: int) -> Column:
    """sum_j LUT[j][code_j] over the `codes` column — the ADC distance
    as m literal-array lookups, whole-stage codegen. Content-memoized
    (see _memo_expr); built as ONE SQL text parsed JVM-side (same
    left-fold of element_at over a BIGINT start as the Column form —
    integer adds, bit-identical)."""
    key = (tuple(tuple(row) for row in lut), m)
    terms = " + ".join(
        f"element_at({_sql_int_array(lut[j])}, codes[{j}] + 1)" for j in range(m)
    )
    return _memo_expr(
        _ADIST_MEMO,
        key,
        lambda: F.expr(f"CAST(0 AS BIGINT) + {terms}"),
    )


def _lut_adist_col(luts: Column, codes: Column) -> Column:
    """ADC distance from a JOINED lut column instead of folded literals:
    sum_j luts[j][codes[j]] — zip_with pairs each subspace's lookup
    table with its stored code, integer-exact in any order. This is the
    large-query-set lane's scoring expression: the plan carries ONE
    expression regardless of how many queries the broadcast relation
    holds (VERDICT r05 #2)."""
    return F.aggregate(
        F.zip_with(luts, codes, lambda lut_j, c: F.element_at(lut_j, c + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_adc_topk(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    n_queries: int = 5,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    lut_lane_threshold: int = 64,
    lane: str = "auto",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes — the query
    side of a PQ index: per query, a lookup table LUT[j][c] holds the
    integer squared-L2 distance between the query's j-th (quantized)
    subvector and codeword c; a stored vector's approximate distance is
    just sum_j LUT[j][code_j] — m table lookups instead of a d-dim
    distance, the whole point of PQ at search time.

    All integer arithmetic over the int8 lane (exact in any summation
    order -> oracle-verifiable bit-for-bit). Queries here are the first
    n_queries vectors by id, deterministic like the q21/q33 query sets.
    Plan: codes are a map-side projection (pq_codes); the LUTs fold in
    as literals; one posexplode emits (query, vec, adist) rows and ONE
    window shuffle on query_id ranks them. Ties: smaller vec_id wins.
    ONE quantization subplan + ONE bounded head collect serve both the
    codebook and the query LUTs (VERDICT r04 #5: the previous form
    quantized twice and collected three times).

    TWO scoring lanes, bit-identical (pinned in tests), routed on the
    query-set size (VERDICT r05 #2 — the literal lane's plan embeds
    n_queries x m x k literals, a codegen/driver blowup long before any
    collect guard trips):
    - `literal` (small sets, <= lut_lane_threshold): LUTs fold into the
      projection, one posexplode — zero joins.
    - `lut` (large sets): the LUTs become a BROADCAST relation
      (query_id, luts) cross-joined against the codes scan (a declared
      broadcast product, the q21 family — the full ADC scan IS
      every-vector x every-query); the plan carries ONE scoring
      expression regardless of query count.
    `lane` forces a specific lane for tests/tuning ('auto' routes).
    Returns (query_id, vec_id, adist, rank), self-matches excluded."""
    qz = quantize_embeddings(embeddings, id_col=id_col, vec_col=vec_col, levels=levels)
    head = (
        qz.where(F.col(id_col) < max(k, n_queries)).orderBy(id_col).collect()
    )
    seed_rows = [r for r in head if r[0] < k]
    query_rows = [r for r in head if r[0] < n_queries]
    if not seed_rows or not query_rows:
        raise ValueError("pq_adc_topk needs at least k seed and n_queries vectors")
    codebook, sub = _pq_codebook(seed_rows, m)
    luts = _adc_luts(query_rows, codebook, m, sub, len(seed_rows))

    codes = pq_codes(
        embeddings, m=m, k=k, id_col=id_col, vec_col=vec_col, levels=levels,
        qz=qz, seed_rows=seed_rows,
    )
    use_lut = lane == "lut" or (lane == "auto" and len(luts) > lut_lane_threshold)
    if use_lut:
        # full-corpus ADC is inherently every-vector x every-query: a
        # DECLARED broadcast product (the q21 family) of the scan
        # against the config-sized LUT relation — no shuffle, and the
        # plan stays O(1) in the query count
        lut_df = embeddings.sparkSession.createDataFrame(
            [(int(qid), [[int(x) for x in row] for row in lut])
             for qid, lut in sorted(luts.items())],
            # bigint: ids are long everywhere else; int would fail
            # createDataFrame for 64-bit query ids on this lane only
            "query_id bigint, __luts array<array<bigint>>",
        )
        scored = (
            codes.crossJoin(F.broadcast(lut_df))
            .select(
                id_col,
                "query_id",
                _lut_adist_col(F.col("__luts"), F.col("codes")).alias("adist"),
            )
            .where(F.col(id_col) != F.col("query_id"))
        )
    else:
        per_query = F.array(
            *[
                F.struct(
                    F.lit(qid).alias("query_id"),
                    _adist_expr(lut, m).alias("adist"),
                )
                for qid, lut in sorted(luts.items())
            ]
        )
        scored = (
            codes.select(F.col(id_col), F.explode(per_query).alias("s"))
            .select(id_col, F.col("s.query_id"), F.col("s.adist"))
            .where(F.col(id_col) != F.col("query_id"))
        )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= topk)
        .select("query_id", id_col, "adist", F.col("__rn").cast("int").alias("rank"))
    )


def ivf_pq_scores(
    embeddings: DataFrame,
    n_seeds: int = 8,
    m: int = 4,
    k: int = 8,
    n_queries: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    max_seeds: int = 4096,
) -> DataFrame:
    """The composed production ANN search surface (VERDICT r04 #3/#4):
    per (query, stored vector), the ADC distance AND the probe rank of
    the stored vector's IVF cluster in the query's centroid preference
    order — so `probe_rank <= nprobe` IS the nprobe search space, and
    ranking the filtered rows by adist is the IVF-pruned ADC search.

    ONE narrow projection computes, per stored vector: its coarse
    cluster (map-side argmax over the centroid literals, identical to
    ivf_assignments), its PQ code (map-side argmin over the codebook
    literals, identical to pq_codes), and per query a struct of
    (adist = m LUT lookups, probe_rank = one map lookup keyed by the
    vector's cluster). Zero exchanges; the only shuffle in a full
    search is the consumer's per-query top-k window. At 100 TB the
    inverted-file layout (partitionBy(cluster), q33) turns the
    probe_rank filter into directory pruning — the nprobe lanes never
    scan unprobed clusters.

    Shares ONE quantization subplan and two bounded head collects
    (quantized head for codebook+LUTs, float head for centroids+probe
    order). Probe order = cosine(query, centroid) desc, seed id asc —
    the same deterministic ranking DuckDB reproduces bit-for-bit (the
    folds are left-to-right IEEE doubles on both sides).

    Returns (query_id, id, adist, probe_rank), self-matches excluded."""
    if n_seeds > max_seeds:
        raise ValueError(
            f"ivf_pq_scores folds the centroid set into the projection "
            f"driver-side; n_seeds={n_seeds} exceeds max_seeds={max_seeds}"
        )
    # ---- bounded driver-side precompute (config-sized heads) -----------
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    fhead = (
        e.where(F.col(id_col) < max(n_seeds, n_queries)).orderBy(id_col).collect()
    )
    cent_rows = [r for r in fhead if r[0] < n_seeds]
    fquery_rows = [r for r in fhead if r[0] < n_queries]
    qz = quantize_embeddings(embeddings, id_col=id_col, vec_col=vec_col, levels=levels)
    qhead = (
        qz.where(F.col(id_col) < max(k, n_queries)).orderBy(id_col).collect()
    )
    seed_rows = [r for r in qhead if r[0] < k]
    query_rows = [r for r in qhead if r[0] < n_queries]
    if not cent_rows or not seed_rows or not query_rows:
        raise ValueError(
            "ivf_pq_scores needs at least n_seeds centroid, k codebook, "
            "and n_queries query vectors"
        )
    codebook, sub = _pq_codebook(seed_rows, m)
    luts = _adc_luts(query_rows, codebook, m, sub, len(seed_rows))

    # per-query centroid preference order, driver-side: left-to-right
    # IEEE double folds == the engine/oracle lanes bit-for-bit
    def _fold(xs):
        acc = 0.0
        for x in xs:
            acc += x
        return acc

    import math

    def _cos(a, b):
        dot = _fold(x * y for x, y in zip(a, b))
        na = math.sqrt(_fold(x * x for x in a))
        nb = math.sqrt(_fold(x * x for x in b))
        return dot / (na * nb)

    probe_order: dict[int, list[tuple[int, int]]] = {}
    for qr in fquery_rows:
        ranked = sorted(
            cent_rows, key=lambda c: (-_cos(qr[1], c[1]), int(c[0]))
        )
        probe_order[int(qr[0])] = [
            (int(c[0]), rank + 1) for rank, c in enumerate(ranked)
        ]

    # ---- the one projection: cluster + codes + per-query structs -------
    cents = _centroid_literal(cent_rows)
    scale = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    quantized = F.when(
        scale == 0, F.transform(F.col("__v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x * float(levels) / scale).cast("int"),
        )
    )
    indexed = e.select(
        F.col(id_col),
        _argmax_cluster(cents, F.col("__v")).alias("__cluster"),
        quantized.alias("quantized"),
    ).select(
        F.col(id_col),
        F.col("__cluster"),
        F.array(*_pq_code_cols(codebook, m, sub, len(seed_rows))).alias("codes"),
    )
    per_query = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                _adist_expr(luts[qid], m).alias("adist"),
                F.element_at(
                    F.create_map(
                        *[
                            F.lit(v)
                            for sid, rank in probe_order[qid]
                            for v in (sid, rank)
                        ]
                    ),
                    F.col("__cluster"),
                ).cast("int").alias("probe_rank"),
            )
            for qid in sorted(luts)
        ]
    )
    return (
        indexed.select(F.col(id_col), F.explode(per_query).alias("s"))
        .select(id_col, F.col("s.query_id"), F.col("s.adist"), F.col("s.probe_rank"))
        .where(F.col(id_col) != F.col("query_id"))
    )


def ivf_adc_topk(
    embeddings: DataFrame,
    nprobe: int = 1,
    n_seeds: int = 8,
    m: int = 4,
    k: int = 8,
    n_queries: int = 5,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """IVF-pruned ADC top-k — the production ANN query: prune the
    search space to each query's `nprobe` nearest clusters, rank the
    survivors by ADC distance. nprobe is THE recall/cost knob at scale:
    nprobe=n_seeds degenerates to full-table ADC (pq_adc_topk's lane).
    One map-side projection (ivf_pq_scores) + one window shuffle.
    Returns (query_id, id, adist, rank)."""
    scores = ivf_pq_scores(
        embeddings, n_seeds=n_seeds, m=m, k=k, n_queries=n_queries,
        id_col=id_col, vec_col=vec_col, levels=levels,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        scores.where(F.col("probe_rank") <= nprobe)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= topk)
        .select("query_id", id_col, "adist", F.col("__rn").cast("int").alias("rank"))
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Per-vector symmetric scalar quantization (the int8 compression
    ANN indexes store): scale = max(|x_i|), q_i = floor(x_i * levels /
    scale). Pure array expressions in whole-stage codegen, no shuffle —
    at 100 TB this is a map-only rewrite of the embedding column to 1/4
    the bytes (int8 vs float32), the standard storage lane in front of
    IVF/LSH search.

    floor(), never round(): rounding modes differ across engines, floor
    of IEEE-identical doubles does not — the quantized values are
    engine-exact. A zero vector quantizes to all zeros (scale 0 guard).
    Returns (id, n_dims, scale, quantized)."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x * float(levels) / scale).cast("int"))
    )
    return embeddings.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        scale.alias("scale"),
        q.alias("quantized"),
    )


_ARGMIN_MEMO: dict = register_cache({})


def _int_l2_argmin(cent_rows: list[tuple[int, list[int]]], qcol: Column | str) -> Column:
    """Nearest centroid by integer squared-L2 over the quantized lane —
    the centroid set folds into ONE literal projection (map-side, zero
    exchanges, same pattern as `_argmax_cluster`/`_pq_code_cols`). All
    arithmetic is exact long math, so the argmin is bit-identical in any
    engine. Ties break toward the smaller centroid id. Content-memoized
    when qcol is given BY NAME (see _memo_expr)."""
    if isinstance(qcol, str):
        key = (tuple((cid, tuple(cv)) for cid, cv in cent_rows), qcol)
        # expr-text fast path: the whole centroid set parses JVM-side in
        # one call (the per-literal Column build costs ~2s for 8x64
        # centroids on this gateway); same functions, bit-identical
        structs = ",".join(
            _sql_neg_l2_struct(f"`{qcol}`", cv, cid) for cid, cv in cent_rows
        )
        return _memo_expr(
            _ARGMIN_MEMO, key,
            lambda: F.expr(
                f"CAST(-(array_max(array({structs})).negc) AS BIGINT)"
            ),
        )
    cands = F.array(
        *[
            F.struct(
                (
                    -F.aggregate(
                        F.zip_with(
                            qcol,
                            F.array(*[F.lit(int(x)) for x in cv]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    )
                ).alias("negdist"),
                F.lit(-cid).alias("negc"),
            )
            for cid, cv in cent_rows
        ]
    )
    return (-F.array_max(cands)["negc"]).cast("long")


def kmeans_codebook(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    max_clusters: int = 4096,
) -> tuple[list[tuple[int, list[int]]], DataFrame]:
    """Deterministic Lloyd's k-means over the int8-quantized lane — the
    seeded-codebook alternative to first-k-by-id centroids for IVF/PQ
    (VERDICT r04 #9). Every quantity is integer-exact and
    order-independent, so the trained codebook is bit-reproducible by
    any engine (the q61 oracle re-runs the identical iterations in SQL):

    - init: the first `n_clusters` quantized vectors by id;
    - assign: map-side integer-L2 argmin (`_int_l2_argmin`) — zero
      exchanges, the centroid set lives in the projection as literals;
    - update: posexplode(quantized) -> groupBy(cluster, pos).sum/count.
      Partial (map-side) aggregation reduces each partition's
      contribution to n_clusters x dim rows BEFORE the shuffle, so the
      per-iteration exchange moves O(clusters x dim x partitions) rows
      regardless of corpus size — the canonical distributed-k-means
      shape. New centroid component = FLOOR(sum/count) in IEEE double
      division (exact long operands -> identical result in any engine;
      never bankers'-rounding, which differs across engines). An empty
      cluster keeps its previous centroid.

    Driver state per iteration is one bounded collect of
    n_clusters x dim (sum, count) rows, guarded by `max_clusters`; each
    iteration's plan restarts from literals, so lineage does not grow
    with n_iters. The quantized scan re-runs per iteration (map-only) —
    at 100 TB, persist the quantized projection externally if iterating
    deep.

    Returns (centroids, assignments): centroids as [(cluster_id,
    [int components])], assignments as (id, cluster) computed with the
    final codebook."""
    if n_clusters > max_clusters:
        raise ValueError(
            f"kmeans_codebook folds the centroid set into the projection "
            f"driver-side; n_clusters={n_clusters} exceeds max_clusters="
            f"{max_clusters} — raise max_clusters deliberately"
        )
    qz = quantize_embeddings(embeddings, id_col=id_col, vec_col=vec_col, levels=levels)
    seed_rows = qz.where(F.col(id_col) < n_clusters).orderBy(id_col).collect()
    if len(seed_rows) < n_clusters:
        raise ValueError(
            f"kmeans_codebook needs ids 0..{n_clusters - 1} present for seeding"
        )
    cents = [(c, list(r["quantized"])) for c, r in enumerate(seed_rows)]
    for _ in range(n_iters):
        # two-step select: a generator (posexplode) in the same select as
        # the argmin strips F.struct field aliases during analysis (Spark
        # generator-resolution quirk), so compute the cluster first
        assigned = qz.select(
            _int_l2_argmin(cents, "quantized").alias("cluster"),
            "quantized",
        ).select("cluster", F.posexplode("quantized").alias("pos", "val"))
        stats = (
            assigned.groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in stats:
            comp = by_cluster.setdefault(int(r["cluster"]), {})
            # FLOOR over IEEE double division of exact longs: both Spark
            # and DuckDB evaluate fl(s/c) identically, so the floor is
            # engine-exact even in the rare case it differs from the
            # mathematical floor
            comp[int(r["pos"])] = int(math.floor(r["s"] / r["c"]))
        cents = [
            (
                cid,
                [by_cluster[cid][p] for p in range(len(old))]
                if cid in by_cluster
                else old,
            )
            for cid, old in cents
        ]
    assignments = qz.select(
        F.col(id_col), _int_l2_argmin(cents, "quantized").alias("cluster")
    )
    return cents, assignments


def quantized_ivf_assignments(
    embeddings: DataFrame,
    n_clusters: int = 8,
    seed_source: str = "first",
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """IVF coarse assignment over the quantized lane with a pluggable
    codebook source: `first` = the first n_clusters vectors by id (the
    q33-style deterministic seed), `kmeans` = Lloyd-trained codebook
    (`kmeans_codebook`). Both produce (id, cluster) via the same
    map-side integer-L2 argmin, so a recall comparison between them
    isolates exactly the codebook's effect (q61)."""
    if seed_source == "kmeans":
        _, assignments = kmeans_codebook(
            embeddings, n_clusters=n_clusters, n_iters=n_iters,
            id_col=id_col, vec_col=vec_col, levels=levels,
        )
        return assignments
    if seed_source != "first":
        raise ValueError(f"unknown seed_source: {seed_source!r}")
    qz = quantize_embeddings(embeddings, id_col=id_col, vec_col=vec_col, levels=levels)
    seed_rows = qz.where(F.col(id_col) < n_clusters).orderBy(id_col).collect()
    cents = [(c, list(r["quantized"])) for c, r in enumerate(seed_rows)]
    return qz.select(
        F.col(id_col), _int_l2_argmin(cents, "quantized").alias("cluster")
    )


def opq_rotation(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    n_iters: int = 0,
) -> dict:
    """Learn an OPQ rotation (Ge et al. 2013, "Optimized Product
    Quantization", CVPR — arXiv:1309.4173): an orthogonal matrix R
    applied BEFORE product quantization so each of the `m` subspaces
    carries a balanced share of the data's variance. Plain PQ splits
    the raw dimensions contiguously — on anisotropic embeddings (real
    ones always are: energy concentrates in a few principal
    directions) one subspace swallows most of the signal while the
    rest encode noise, and ADC recall collapses. Rotating costs one
    matmul per vector and nothing at search time (queries rotate the
    same way; L2/cosine are rotation-invariant, pinned in tests).

    Default is the deterministic NON-PARAMETRIC variant (OPQ-NP init):
    PCA via exact SVD on a bounded ordered sample (first `sample`
    vectors by id — the same deterministic-seed discipline as every
    codebook here), then GREEDY EIGENVALUE ALLOCATION — principal
    directions are dealt, largest first, to the subspace with the
    smallest variance PRODUCT (log-sum), the paper's balancing rule —
    and R is that permuted basis. `n_iters > 0` adds the parametric
    refinement loop: per-subspace k-means codebooks (k centroids, 10
    Lloyd steps, deterministic first-k init) -> reconstruction ->
    orthogonal Procrustes (SVD of X^T Y) re-solve of R; recorded MSE
    is non-increasing end-to-end (pinned).

    Driver-side numpy on the sample only (O(sample * d) collect + an
    O(d^3) SVD — config-sized); the per-vector rotation is distributed
    (`apply_rotation`). Returns {"rotation": d x d row-major list,
    "mse": [per-refinement-iter], "m": m, "k": k}."""
    import numpy as np

    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("opq_rotation needs a non-empty sample")
    X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    Xc = X - X.mean(axis=0)
    # exact PCA: eigen-decomposition of the covariance via SVD
    _, s, vt = np.linalg.svd(Xc, full_matrices=True)
    var = np.zeros(d)
    var[: len(s)] = (s**2) / max(1, n - 1)
    # greedy eigenvalue allocation: largest eigenvalue to the bucket
    # with the smallest log-variance product (and free capacity)
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = [0.0] * m
    for i in np.argsort(-var):
        free = [j for j in range(m) if len(buckets[j]) < sub]
        j = min(free, key=lambda j: (load[j], j))
        buckets[j].append(int(i))
        load[j] += float(np.log(var[i] + 1e-12))
    order = [i for b in buckets for i in b]
    R = vt[order].T  # columns = allocated principal directions
    mse: list[float] = []

    def _codebooks(Xr):
        Y = np.empty_like(Xr)
        for j in range(m):
            S = Xr[:, j * sub : (j + 1) * sub]
            C = S[:k].copy()  # deterministic first-k init
            for _ in range(10):
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for c in range(len(C)):
                    pts = S[a == c]
                    if len(pts):
                        C[c] = pts.mean(axis=0)
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            Y[:, j * sub : (j + 1) * sub] = C[d2.argmin(axis=1)]
        return Y

    for _ in range(max(0, int(n_iters))):
        Xr = X @ R
        Y = _codebooks(Xr)
        mse.append(float(((Xr - Y) ** 2).sum(axis=1).mean()))
        # orthogonal Procrustes: argmin_R ||X R - Y||_F
        u, _, vt2 = np.linalg.svd(X.T @ Y)
        R = u @ vt2
    if n_iters:
        Xr = X @ R
        mse.append(float(((Xr - _codebooks(Xr)) ** 2).sum(axis=1).mean()))
    return {
        "rotation": [[float(x) for x in row] for row in R],
        "mse": mse,
        "m": m,
        "k": k,
    }


def apply_rotation(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Distributed x -> xR over an embedding column: one Arrow-batched
    pandas UDF doing a single numpy matmul per batch (the vectorized
    lane — a per-row fold would be d^2 scalar ops through the
    interpreter). Output is float32 like the stored embeddings; every
    other column passes through untouched, so the rotated relation
    drops into any downstream lane (quantize/PQ/IVF/cosine)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    R = np.asarray(rotation, dtype=np.float64)

    def _rot_fn(s):
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        out = (X @ R).astype(np.float32)
        return pd.Series([row for row in out])

    # explicit annotations: the module's `from __future__ import
    # annotations` would stringify inline hints and pandas_udf cannot
    # resolve 'pd.Series' without pd in the module globals
    _rot_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _rot = pandas_udf(_rot_fn, "array<float>")

    return df.withColumn(out_col or vec_col, _rot(F.col(vec_col)))


def opq_adc_topk(
    embeddings: DataFrame,
    rotation: list[list[float]] | dict,
    m: int = 4,
    k: int = 8,
    n_queries: int = 5,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    lane: str = "auto",
) -> DataFrame:
    """ADC top-k over OPQ-rotated codes: rotate (corpus and queries
    rotate identically — queries are the first n_queries ids of the
    same relation, exactly the pq_adc_topk contract), then the
    UNCHANGED integer PQ/ADC machinery. The rotation never touches
    search-time cost; it only re-coordinates the space so the m
    subspace codebooks quantize balanced energy."""
    if isinstance(rotation, dict):
        rotation = rotation["rotation"]
    rotated = apply_rotation(embeddings, rotation, vec_col=vec_col)
    return pq_adc_topk(
        rotated, m=m, k=k, n_queries=n_queries, topk=topk,
        id_col=id_col, vec_col=vec_col, levels=levels, lane=lane,
    )
