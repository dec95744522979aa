"""Persistent IVF-PQ index: the ANN stack productized as an on-disk
layout plus a search that reads only the probed clusters.

Layout under `root`:

    root/vectors/cluster=<c>/...parquet   (vec_id, n_dims, scale,
                                           quantized, codes, embedding)
    root/meta.json                        params + centroids + codebook

The vectors plane is hive-partitioned by the IVF cluster, so an
nprobe-bounded search is DIRECTORY pruning (the q33 layout contract:
`PartitionFilters` on `cluster`, untouched clusters' files never open).
Everything numeric runs on the int8-quantized lane (quantize_embeddings)
with integer-exact arithmetic end to end: cluster assignment is the
integer-L2 argmin, PQ codes are integer argmins over the stored
codebook, search is ADC — per query a lookup table of integer squared
distances folded into the projection as literals. The codebook source
is `first` (first-k vectors by id) or `kmeans` (Lloyd-trained,
kmeans_codebook) — both deterministic and bit-reproducible.

Driver-side state is config-sized only: centroids (n_clusters x dim
ints), the PQ codebook (m x k x sub ints), and the collected query set
(bounded by max_queries with an overflow guard, the repo-wide policy).

Maintenance commit protocol (r10 — VERDICT r09 #2): every mutation
(build / append / delete / compact) runs under an exclusive per-index
lock and commits by atomically replacing `meta.json` with a bumped
`version` — the version IS the commit point. Compaction is optimistic:
the expensive re-clustered layout is written to a temp dir OUTSIDE the
lock, then the swap (a) re-checks under the lock that the version it
read is still current — a concurrent append/delete wins and the
compact aborts cleanly, never losing the interleaved write — and
(b) records a `compact.pending` manifest (carrying the full new meta)
before the first rename, so a crash anywhere inside the swap window is
recoverable: `recover_ann_index` rolls forward (temp layout is
complete by construction once the manifest exists) or back, and every
other mutation REFUSES to run over a pending manifest instead of
corrupting the half-swapped layout. The local lock is `fcntl.flock`,
the sandbox stand-in for an object store's conditional PUT
(S3 If-None-Match / DynamoDB conditional writes — the reference's own
mutual-exclusion primitive, DDBUtil.java:227-244); a real-store port
replaces `_maintenance_lock` + the pending-manifest write with one
conditional PUT, the same seam versioned.py isolates in its LogStore.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    _adist_expr,
    _fold_dot,
    _fold_norm2,
    _int_l2_argmin,
    _lut_adist_col,
    _pq_code_cols,
    kmeans_codebook,
    quantize_embeddings,
)


_PENDING = "compact.pending"
_OLD_DIR = "vectors__old"
_TMP_DIR = "vectors__compacting"
# test seam: called by compact_ann_index after the temp layout is
# written and before the commit lock is taken — the exact window where
# a concurrent append/delete can land (tests inject one here to pin
# the abort-not-lose contract)
_before_compact_commit_hook = None


@contextlib.contextmanager
def _maintenance_lock(root: str):
    """Exclusive per-index mutation lock (see module docstring: local
    flock emulating an object store's conditional PUT)."""
    os.makedirs(root, exist_ok=True)
    fh = open(os.path.join(root, ".maintenance.lock"), "w")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fh, fcntl.LOCK_UN)
        fh.close()


def _write_meta(root: str, meta: dict) -> None:
    """Atomic meta commit: tmp + rename, so a reader never sees a torn
    meta.json and the version bump is all-or-nothing."""
    tmp = os.path.join(root, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(root, "meta.json"))


def _check_no_pending(root: str, op: str) -> None:
    if os.path.exists(os.path.join(root, _PENDING)):
        raise RuntimeError(
            f"refusing {op}: a compaction at {root} is mid-swap or "
            f"crashed ({_PENDING} present); run recover_ann_index "
            "first — mutating over the pending swap would corrupt or "
            "lose writes"
        )


def _quantize_with_embedding(
    embeddings: DataFrame, id_col: str, vec_col: str, levels: int
) -> DataFrame:
    """quantize_embeddings' exact projection PLUS the float embedding
    column carried through — build/append need both, and carrying the
    column through one projection beats joining the quantized lane back
    to its own source (the join was a full self-shuffle of the corpus;
    this is map-only). The quantization expressions are identical to
    `quantize_embeddings` (floor, zero-scale guard), so seeds collected
    here match the oracle-pinned lane bit-for-bit."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x * float(levels) / scale).cast("int"))
    )
    return embeddings.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        scale.alias("scale"),
        q.alias("quantized"),
        F.col(vec_col).alias("embedding"),
    )


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    root: str,
    n_clusters: int = 8,
    m: int = 4,
    k: int = 8,
    codebook: str = "first",
    kmeans_iters: int = 2,
    levels: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build and persist the index; returns the meta dict. One pass of
    map-side projections (quantize -> cluster argmin -> PQ codes, all
    literal-folded, zero exchanges) plus the partitioned write's
    shuffle-free fan-out into cluster directories."""
    from .dedup import ensure_min_parallelism

    # split guard: a single-row-group local parquet file would serialize
    # the whole quantize+code projection onto one task; no-op on real
    # multi-file input
    embeddings = ensure_min_parallelism(embeddings, keys=[id_col])
    qz = _quantize_with_embedding(embeddings, id_col, vec_col, levels)
    # ONE bounded head collect serves both the centroid seed and the PQ
    # codebook seed (r12 — the 'first' lane ran two separate head jobs
    # over the same quantized relation; the ivf_pq_scores discipline)
    head = (
        qz.where(F.col(id_col) < max(n_clusters, k)).orderBy(id_col).collect()
    )
    if codebook == "kmeans":
        cents, _ = kmeans_codebook(
            embeddings, n_clusters=n_clusters, n_iters=kmeans_iters,
            id_col=id_col, vec_col=vec_col, levels=levels,
        )
    elif codebook == "first":
        seed = [r for r in head if r[id_col] < n_clusters]
        if len(seed) < n_clusters:
            raise ValueError(f"need ids 0..{n_clusters - 1} present for seeding")
        cents = [(c, list(r["quantized"])) for c, r in enumerate(seed)]
    else:
        raise ValueError(f"unknown codebook source: {codebook!r}")

    pq_seed = [r for r in head if r[id_col] < k]
    if len(pq_seed) < k:
        raise ValueError(f"need ids 0..{k - 1} present for the PQ codebook")
    dim = pq_seed[0]["n_dims"]
    sub = dim // m
    pq_book = [
        [list(r["quantized"])[j * sub : (j + 1) * sub] for r in pq_seed]
        for j in range(m)
    ]

    vectors = _index_rows(qz, cents, pq_book, m, sub, k)
    meta = {
        "version": 1,
        "n_clusters": n_clusters,
        "m": m,
        "k": k,
        "sub": sub,
        "dim": dim,
        "levels": levels,
        "codebook_source": codebook,
        "id_col": id_col,
        "centroids": [[int(x) for x in cv] for _, cv in cents],
        "pq_codebook": [[[int(x) for x in cw] for cw in js] for js in pq_book],
    }
    with _maintenance_lock(root):
        # a full rebuild IS a recovery: sweep any crashed-compact state
        # (pending manifest, half-swapped dirs) before overwriting
        for leftover in (_PENDING, _OLD_DIR, _TMP_DIR):
            p = os.path.join(root, leftover)
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
        vectors.write.mode("overwrite").partitionBy("cluster").parquet(
            f"{root}/vectors"
        )
        _write_meta(root, meta)
    return meta


def _index_rows(
    qz: DataFrame,
    cents,
    pq_book,
    m: int,
    sub: int,
    k: int,
) -> DataFrame:
    """The index-row projection shared by build and append: quantized
    row (embedding carried through by `_quantize_with_embedding` — no
    join back to the source) -> coarse cluster (integer-L2 argmin over
    the centroid literals) -> PQ codes (argmin over the codebook
    literals). All map-side, zero exchanges."""
    return qz.withColumn("cluster", _int_l2_argmin(cents, "quantized")).withColumn(
        "codes", F.array(*_pq_code_cols(pq_book, m, sub, k))
    )


def append_to_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    root: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> dict:
    """Incrementally add vectors to a persisted index (VERDICT r05 #4 —
    a 100 TB corpus doesn't rebuild nightly; the reference's own shape
    is per-message incremental upsert, GlueUtil.java:397-451): new
    vectors are assigned against the STORED centroids and PQ codebook
    (no retraining — the standard IVF maintenance contract: recall
    degrades only as the data distribution drifts from the training
    snapshot, at which point you rebuild), appended into the existing
    cluster directories, and the meta version bumps. Because the
    stored parameters drive the assignment, append-then-search is
    BIT-IDENTICAL to rebuild-then-search with the same training rows
    (pinned in tests).

    Guards: the index must exist, every new vector must match the
    indexed dimensionality (one distributed limit-1 probe, no collect
    of the data), and the whole read-assign-write-commit runs under the
    index's maintenance lock (r10): an append can no longer interleave
    with a compaction's directory swap and be silently dropped with the
    pre-compact layout — it either lands (and the compact aborts on its
    version re-check) or, over a crashed swap, refuses with a pointer
    to recover_ann_index."""
    if not os.path.exists(f"{root}/meta.json"):
        raise ValueError(f"no ANN index at {root}; build_ann_index first")
    with _maintenance_lock(root):
        _check_no_pending(root, "append_to_ann_index")
        meta = load_ann_meta(root)
        if id_col is None:
            id_col = meta["id_col"]
        elif id_col != meta["id_col"]:
            raise ValueError(
                f"id_col={id_col!r} does not match the indexed {meta['id_col']!r}"
            )
        bad = (
            embeddings.where(
                F.size(F.col(vec_col)) != F.lit(int(meta["dim"]))
            ).limit(1).count()
        )
        if bad:
            raise ValueError(
                f"appended vectors must have dim={meta['dim']} to match the "
                f"stored centroids/codebook"
            )
        from .dedup import ensure_min_parallelism

        cents = [(i, v) for i, v in enumerate(meta["centroids"])]
        qz = _quantize_with_embedding(
            ensure_min_parallelism(embeddings, keys=[id_col]), id_col, vec_col, meta["levels"]
        )
        rows = _index_rows(
            qz, cents, meta["pq_codebook"], meta["m"], meta["sub"], meta["k"]
        )
        rows.write.mode("append").partitionBy("cluster").parquet(
            f"{root}/vectors"
        )
        meta["version"] = int(meta.get("version", 1)) + 1
        _write_meta(root, meta)
    return meta


def load_ann_meta(root: str) -> dict:
    with open(f"{root}/meta.json") as fh:
        return json.load(fh)


def _int_l2_lit(vec, lit_vals) -> "F.Column":
    """Integer squared-L2 between an int-array column and a literal
    vector — exact long math, the same fold `_int_l2_argmin` and
    `_pq_code_cols` inline."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(int(x)) for x in lit_vals]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def search_ann_index_df(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    rerank_factor: int | None = None,
) -> DataFrame:
    """Fully-DISTRIBUTED index search: the query set stays a DataFrame
    end to end — no driver-side collect at all, so corpus-scale query
    sets (dedup both ways, batch kNN joins) are first-class. Per query,
    ONE map-side projection computes (a) its nprobe preferred clusters
    (array_sort over the centroid-distance structs — integer-exact,
    ties to the smaller id, identical to the collected lane's python
    ranking) and (b) its ADC lookup tables (m x k integer L2s against
    the codebook literals). The plan size is m*k + n_clusters literal
    folds — CONSTANT in the query count. Probes explode to
    (query_id, cluster, luts) and equi-join the vectors plane on
    `cluster`; Catalyst/AQE picks broadcast vs shuffle by the query
    relation's size, and for selective query sets Spark's dynamic
    partition pruning keeps unprobed cluster directories unread.
    Scoring and ranking match `search_ann_index` bit-for-bit (pinned in
    tests). Returns (query_id, vec_id, adist, rank), self-matches
    excluded.

    rerank_factor enables the two-stage search on this lane too: the
    ADC shortlist (k * factor per query) joins back to the stored float
    embeddings AND to the query vectors — both relational joins, still
    no collect — and the exact cosine (the `cosine_topk` fold, same
    IEEE order) reranks. With full probing and a covering shortlist the
    result EQUALS brute-force cosine_topk (pinned). Output then is
    (query_id, vec_id, cosine, rank)."""
    meta = load_ann_meta(root)
    m, sub, levels = meta["m"], meta["sub"], meta["levels"]
    cents = meta["centroids"]
    book = meta["pq_codebook"]

    qz = quantize_embeddings(
        queries, id_col=query_id_col, vec_col=vec_col, levels=levels
    )
    # expr-text fast path (same functions as the Column form, parsed
    # JVM-side in one call — the per-literal build cost seconds per
    # call for a config-sized codebook)
    from .similarity import _sql_int_l2

    cent_structs = ",".join(
        f"named_struct('d', {_sql_int_l2('quantized', cv)}, 'c', {cid})"
        for cid, cv in enumerate(cents)
    )
    cent_scores = F.expr(f"array({cent_structs})")
    probe = F.transform(
        F.slice(F.array_sort(cent_scores), 1, max(1, nprobe)), lambda s: s["c"]
    )
    luts = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                _sql_int_l2(f"slice(quantized, {j * sub + 1}, {sub})", book[j][c])
                for c in range(meta["k"])
            )
            + ")"
            for j in range(m)
        )
        + ")"
    )
    q_rel = qz.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(probe).alias("cluster"),
        luts.alias("__luts"),
    )
    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    scored = (
        vectors.select(F.col(meta["id_col"]).alias("vec_id"), "cluster", "codes")
        .join(q_rel, on="cluster")
        .select(
            "vec_id",
            "query_id",
            _lut_adist_col(F.col("__luts"), F.col("codes")).alias("adist"),
        )
        .where(F.col("vec_id") != F.col("query_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    shortlist_k = k if rerank_factor is None else k * max(1, rerank_factor)
    ranked = scored.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= shortlist_k
    )
    if rerank_factor is None:
        return ranked.select(
            "query_id", "vec_id", "adist", F.col("__rn").cast("int").alias("rank")
        )
    cand = (
        vectors.select(
            F.col(meta["id_col"]).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("__e"),
        )
        .join(ranked.select("query_id", "vec_id"), on="vec_id")
        .join(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("__q"),
            ),
            on="query_id",
        )
    )
    cosine = _fold_dot(F.col("__e"), F.col("__q")) / (
        F.sqrt(_fold_norm2(F.col("__e"))) * F.sqrt(_fold_norm2(F.col("__q")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("__rn").cast("int").alias("rank")
        )
    )


def _quantize_py(vec, levels: int) -> list[int]:
    """Driver-side twin of quantize_embeddings for the (config-sized)
    query set: identical IEEE arithmetic — scale = max |x|,
    q_i = floor(x_i * levels / scale)."""
    scale = max(abs(float(x)) for x in vec)
    if scale == 0:
        return [0] * len(vec)
    return [math.floor(float(x) * levels / scale) for x in vec]


def search_ann_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    rerank_factor: int | None = None,
    lut_lane_threshold: int = 64,
    lane: str = "auto",
) -> DataFrame:
    """ADC top-k over the persisted index, scanning ONLY each query's
    `nprobe` nearest clusters: the scan filter is `cluster IN (union of
    probed clusters)` — partition-directory pruning — and per query a
    literal probe-set membership test keeps exactly its own clusters.
    Returns (query_id, vec_id, adist, rank); ties break on vec_id.

    The query set collects driver-side (bounded, overflow-raising).
    TWO scoring lanes, bit-identical, routed on query-set size
    (VERDICT r05 #2 — the literal lane embeds n_queries x m x k
    literals in the plan, impractical far below the collect guard):
    - `literal` (<= lut_lane_threshold queries): each query's ADC
      lookup table folds into the projection — m literal array lookups
      per row, the same plan family as pq_adc_topk.
    - `lut` (large sets): (query_id, probed cluster, luts) becomes a
      BROADCAST relation equi-joined on `cluster` — so the broadcast
      hash join ALSO replaces the per-query probe-membership filter,
      and the plan carries one scoring expression for any query count.
    Both lanes keep the `cluster IN (union of probes)` scan filter, so
    directory pruning is unchanged. `lane` forces one for tests.

    Query ids share the indexed id space for the self-exclusion rule
    (a query whose id equals a stored vector's id never returns that
    vector — the search-the-corpus-with-itself shape); external query
    sets should use ids disjoint from the corpus ids.

    rerank_factor enables the standard TWO-STAGE search: ADC shortlists
    k * rerank_factor candidates per query (cheap integer lookups over
    the compressed codes), then ONLY the shortlist joins back to the
    stored float embeddings for an exact-cosine rerank — the same
    left-to-right fold as cosine_topk, so with full probing and a
    shortlist covering the corpus the result EQUALS the exact search
    (pinned in tests). Output is then (query_id, vec_id, cosine, rank).
    The rerank join is a broadcast of the shortlist id set (bounded by
    n_queries x k x rerank_factor, config-sized by construction)."""
    meta = load_ann_meta(root)
    m, sub, levels = meta["m"], meta["sub"], meta["levels"]
    cents = meta["centroids"]
    book = meta["pq_codebook"]

    q_rows = queries.select(query_id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"search_ann_index collects the query set driver-side; got "
            f">{max_queries} rows. Raising max_queries is viable on the "
            f"broadcast-LUT lane (driver memory is the only bound there); "
            f"for corpus-scale query sets run the search as a join job "
            f"over a LUT DataFrame instead of collecting"
        )
    if not q_rows:
        raise ValueError("empty query set")

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    per_query = []
    probed_union: set[int] = set()
    for r in q_rows:
        qv = _quantize_py(r[1], levels)
        ranked = sorted(range(len(cents)), key=lambda c: (l2(qv, cents[c]), c))
        probe = ranked[: max(1, nprobe)]
        probed_union.update(probe)
        lut = [
            [l2(qv[j * sub : (j + 1) * sub], book[j][c]) for c in range(meta["k"])]
            for j in range(m)
        ]
        per_query.append((int(r[0]), probe, lut))

    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    # one scan filter for directory pruning...
    scan = vectors.where(F.col("cluster").isin(sorted(probed_union)))
    use_lut = lane == "lut" or (lane == "auto" and len(per_query) > lut_lane_threshold)
    if use_lut:
        # broadcast (query_id, cluster, luts) relation: the equi-join on
        # cluster IS the per-query probe filter, and scoring reads the
        # joined lut column — no per-query plan growth
        probe_df = spark.createDataFrame(
            [
                (qid, int(c), [[int(x) for x in row] for row in lut])
                for qid, probe, lut in per_query
                for c in probe
            ],
            # bigint: indexed ids are long everywhere else (doc_id); an
            # int schema here would fail createDataFrame for 64-bit ids
            # on this lane only (lane-routing-dependent failure)
            "query_id bigint, cluster int, __luts array<array<bigint>>",
        )
        scored = (
            scan.select(
                F.col(meta["id_col"]).alias("vec_id"), "cluster", "codes"
            )
            .join(F.broadcast(probe_df), on="cluster")
            .select(
                "vec_id",
                "query_id",
                _lut_adist_col(F.col("__luts"), F.col("codes")).alias("adist"),
            )
            .where(F.col("vec_id") != F.col("query_id"))
        )
    else:
        # ...then per-query rows: (query_id, adist) for rows inside THAT
        # query's probe set only
        lanes = F.array(
            *[
                F.struct(
                    F.lit(qid).alias("query_id"),
                    _adist_expr(lut, m).alias("adist"),
                    F.array(*[F.lit(c) for c in probe]).alias("probe"),
                )
                for qid, probe, lut in per_query
            ]
        )
        scored = (
            scan.select(F.col(meta["id_col"]).alias("vec_id"), "cluster", F.explode(lanes).alias("s"))
            .where(F.array_contains(F.col("s.probe"), F.col("cluster")))
            .select("vec_id", F.col("s.query_id").alias("query_id"), F.col("s.adist").alias("adist"))
            .where(F.col("vec_id") != F.col("query_id"))
        )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("vec_id").asc())
    shortlist_k = k if rerank_factor is None else k * max(1, rerank_factor)
    ranked = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= shortlist_k)
    )
    if rerank_factor is None:
        return ranked.select(
            "query_id", "vec_id", "adist", F.col("__rn").cast("int").alias("rank")
        )

    # stage 2: exact-cosine rerank of the shortlist against the stored
    # float embeddings. The query vectors ride a BROADCAST relation
    # joined on query_id (the previous form coalesced one literal-folded
    # branch per query — the same O(n_queries) plan growth the scoring
    # lanes route around); zip_with over two columns folds left-to-right
    # in the SAME IEEE order as the literal form, so rerank == exact
    # stays bit-for-bit (pinned in tests).
    qv_df = spark.createDataFrame(
        [(int(r[0]), [float(x) for x in r[1]]) for r in q_rows],
        "query_id bigint, __q array<double>",
    )
    cand = (
        vectors.select(
            F.col(meta["id_col"]).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("__e"),
        )
        .join(F.broadcast(ranked.select("query_id", "vec_id")), on="vec_id")
        .join(F.broadcast(qv_df), on="query_id")
    )
    per_q_cos = _fold_dot(F.col("__e"), F.col("__q")) / (
        F.sqrt(_fold_norm2(F.col("__e"))) * F.sqrt(_fold_norm2(F.col("__q")))
    )
    rer = cand.select("query_id", "vec_id", per_q_cos.alias("cosine"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rer.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .select("query_id", "vec_id", "cosine", F.col("__rn").cast("int").alias("rank"))
    )


def ann_index_stats(spark: SparkSession, root: str) -> DataFrame:
    """Index observability for the maintenance loop: one row per
    cluster with its vector count plus index-wide columns — meta
    version, total vectors, and the balance factor
    (max cluster / mean cluster; 1.0 = perfectly balanced, large
    values say the coarse quantizer no longer fits the data and it is
    rebuild time). One groupBy over partition-pruned metadata-narrow
    columns; the global stats ride a broadcast one-row relation, no
    driver collect."""
    meta = load_ann_meta(root)
    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    per = vectors.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    totals = per.agg(
        F.sum("n_vectors").alias("total_vectors"),
        (
            F.max("n_vectors").cast("double")
            / (F.sum("n_vectors") / F.count(F.lit(1)))
        ).alias("balance_factor"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "cluster",
            "n_vectors",
            "total_vectors",
            "balance_factor",
            F.lit(int(meta.get("version", 1))).alias("meta_version"),
        )
        .orderBy("cluster")
    )


def verify_ann_index(spark: SparkSession, root: str) -> dict:
    """Structural integrity check (run after append / before serving):
    every stored row must carry codes of length m with codewords in
    [0, k), quantized vectors of the indexed dimension, and a cluster
    id the meta knows. Returns counters; raises on any violation so a
    corrupted index never serves. Also refuses an index with a
    crashed/incomplete compaction swap (pending manifest or
    half-swapped dirs, r10) — recover_ann_index is the resume path.
    Distributed aggregation — no collect of the data plane."""
    crash_state = [
        name
        for name in (_PENDING, _OLD_DIR, _TMP_DIR)
        if os.path.exists(os.path.join(root, name))
    ]
    if crash_state:
        raise ValueError(
            f"ANN index at {root} has a crashed/incomplete compaction "
            f"({', '.join(crash_state)} present); run recover_ann_index"
        )
    meta = load_ann_meta(root)
    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    bad = (
        F.when(F.size("codes") != int(meta["m"]), F.lit("codes_len"))
        .when(
            F.exists(
                "codes",
                lambda c: (c < 0) | (c >= F.lit(int(meta["k"]))),
            ),
            F.lit("codeword_range"),
        )
        .when(F.size("quantized") != int(meta["dim"]), F.lit("dim"))
        .when(
            (F.col("cluster") < 0)
            | (F.col("cluster") >= len(meta["centroids"])),
            F.lit("cluster_range"),
        )
    )
    row = (
        vectors.select(F.col(meta["id_col"]).alias("__id"), bad.alias("__bad"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count("__bad").alias("violations"),
            # duplicate ids: what a careless append of already-indexed
            # vectors produces — silent double-counting at search time
            (F.count(F.lit(1)) - F.countDistinct("__id")).alias("dup_ids"),
        )
        .collect()[0]
    )
    out = {
        "total": row.total,
        "violations": row.violations,
        "dup_ids": row.dup_ids,
        "meta_version": int(meta.get("version", 1)),
    }
    if row.violations or row.dup_ids:
        raise ValueError(f"ANN index at {root} failed verification: {out}")
    return out


def delete_from_ann_index(
    spark: SparkSession,
    root: str,
    ids,
    id_col: str | None = None,
) -> dict:
    """Remove vectors from a persisted index by id — the maintenance
    operation symmetric to `append_to_ann_index` (the reference's own
    surface is symmetric too: batch partition deletes beside batch
    creates, GlueUtil.java:489-543). A dedup pipeline that prunes
    near-duplicate vectors needs exactly this: delete the losers
    without rebuilding the index.

    Partition-scoped commit: only the cluster directories that actually
    contain deleted ids are rewritten (dynamic partition overwrite on
    `cluster`, the same commit discipline as the catalog partition
    sync); untouched clusters' files are never opened or rewritten, so
    a delete of k vectors costs O(affected clusters), not O(index).
    A cluster whose every vector is deleted has its directory removed.
    Because rows are immutable and assignment is per-row against the
    STORED centroids/codebook, delete-then-search is bit-identical to
    rebuild-without-those-ids (pinned in tests).

    `ids`: a list/tuple of ids, or a DataFrame whose `id_col` column
    names them. Ids not present in the index are ignored (idempotent —
    re-running a delete is a no-op). Returns {"removed", "affected_clusters",
    "meta_version"} and bumps the meta version when anything changed."""
    if not os.path.exists(f"{root}/meta.json"):
        raise ValueError(f"no ANN index at {root}; build_ann_index first")
    with _maintenance_lock(root):
        _check_no_pending(root, "delete_from_ann_index")
        return _delete_locked(spark, root, ids, id_col)


def _delete_locked(spark, root, ids, id_col):
    meta = load_ann_meta(root)
    if id_col is None:
        id_col = meta["id_col"]
    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(id_col).cast("long").alias(id_col)).dropDuplicates()
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} bigint"
        ).dropDuplicates()

    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    # affected clusters + how many survive in each: one aggregation,
    # bounded by n_clusters rows (config-sized driver state)
    hit = vectors.join(ids_df, on=id_col, how="left_semi")
    per_cluster = {
        int(r["cluster"]): (int(r["n_del"]))
        for r in hit.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_del"))
        .collect()
    }
    if not per_cluster:
        return {
            "removed": 0,
            "affected_clusters": [],
            "meta_version": int(meta.get("version", 1)),
        }
    affected = sorted(per_cluster)
    survivors = (
        vectors.where(F.col("cluster").isin(affected))
        .join(ids_df, on=id_col, how="left_anti")
    )
    leftover = {
        int(r["cluster"]): int(r["n"])
        for r in survivors.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    nonempty = [c for c in affected if leftover.get(c)]
    if nonempty:
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        old_mode = spark.conf.get(mode_key, None)
        spark.conf.set(mode_key, "dynamic")
        try:
            (
                survivors.where(F.col("cluster").isin(nonempty))
                .write.mode("overwrite")
                .partitionBy("cluster")
                .parquet(f"{root}/vectors")
            )
        finally:
            if old_mode is None:
                spark.conf.unset(mode_key)
            else:
                spark.conf.set(mode_key, old_mode)
    # fully-emptied cluster directories: dynamic overwrite never sees a
    # row for them, so remove them explicitly
    for c in affected:
        if not leftover.get(c):
            path = f"{root}/vectors/cluster={c}"
            if os.path.exists(path):
                shutil.rmtree(path)
    meta["version"] = int(meta.get("version", 1)) + 1
    _write_meta(root, meta)
    return {
        "removed": int(sum(per_cluster.values())),
        "affected_clusters": affected,
        "meta_version": meta["version"],
    }


def compact_ann_index(
    spark: SparkSession,
    root: str,
    n_iters: int = 2,
    min_balance: float | None = None,
) -> dict:
    """Re-cluster a drifted index in place: run Lloyd iterations seeded
    from the STORED centroids over the stored quantized vectors (the
    same integer-exact update as `kmeans_codebook` — FLOOR over IEEE
    division of exact longs — but with no id-based seeding, so it works
    on any surviving id set after deletes), reassign every vector, and
    rewrite the cluster layout. The PQ codebook is intentionally kept:
    ADC distances depend only on (codes, codebook), so a full-probe
    search returns bit-identical results before and after compaction —
    compaction changes WHERE vectors live (directory pruning quality),
    never what they score (pinned in tests).

    min_balance: when set, compact only if the current balance factor
    (max cluster / mean cluster, `ann_index_stats`) exceeds it;
    otherwise return with {"compacted": False}. Writes to a temp layout
    and swaps under the commit protocol (module docstring): a pending
    manifest makes any crash inside the swap recoverable via
    recover_ann_index, and a version re-check under the lock aborts the
    compact (never the append) when a concurrent append/delete
    committed after the layout snapshot was taken. Bumps the meta
    version and stores the retrained centroids."""
    if not os.path.exists(f"{root}/meta.json"):
        raise ValueError(f"no ANN index at {root}; build_ann_index first")
    _check_no_pending(root, "compact_ann_index")
    # stale debris from a pre-protocol crash (tmp with no manifest is
    # always safe to drop; __old with no manifest means the swap
    # completed but the final sweep was interrupted — VERDICT r09 #7)
    with _maintenance_lock(root):
        for leftover in (_OLD_DIR, _TMP_DIR):
            p = os.path.join(root, leftover)
            if os.path.isdir(p) and not os.path.exists(
                os.path.join(root, _PENDING)
            ):
                shutil.rmtree(p)
    meta = load_ann_meta(root)
    v0 = int(meta.get("version", 1))
    if min_balance is not None:
        bal_row = (
            spark.read.option("basePath", f"{root}/vectors")
            .parquet(f"{root}/vectors")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                (
                    F.max("n").cast("double") / (F.sum("n") / F.count(F.lit(1)))
                ).alias("balance")
            )
            .collect()[0]
        )
        if bal_row["balance"] <= min_balance:
            return {
                "compacted": False,
                "balance_factor": float(bal_row["balance"]),
                "meta_version": int(meta.get("version", 1)),
            }

    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    cents = [(i, list(v)) for i, v in enumerate(meta["centroids"])]
    for _ in range(n_iters):
        assigned = vectors.select(
            _int_l2_argmin(cents, "quantized").alias("__c"), "quantized"
        ).select("__c", F.posexplode("quantized").alias("pos", "val"))
        stats = (
            assigned.groupBy("__c", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in stats:
            by_cluster.setdefault(int(r["__c"]), {})[int(r["pos"])] = int(
                math.floor(r["s"] / r["c"])
            )
        cents = [
            (
                cid,
                [by_cluster[cid][p] for p in range(len(old))]
                if cid in by_cluster
                else old,
            )
            for cid, old in cents
        ]

    recoded = vectors.drop("cluster").withColumn(
        "cluster", _int_l2_argmin(cents, "quantized")
    )
    # the expensive part runs OUTSIDE the lock (a live append stream is
    # not blocked for the duration of the re-cluster write); the swap
    # below re-checks the version it was computed from
    tmp = f"{root}/{_TMP_DIR}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    recoded.write.mode("overwrite").partitionBy("cluster").parquet(tmp)

    new_meta = dict(meta)
    new_meta["centroids"] = [[int(x) for x in cv] for _, cv in cents]
    new_meta["version"] = v0 + 1
    new_meta["codebook_source"] = "compacted"

    if _before_compact_commit_hook is not None:
        _before_compact_commit_hook()

    pending = os.path.join(root, _PENDING)
    old_dir = f"{root}/{_OLD_DIR}"
    with _maintenance_lock(root):
        _check_no_pending(root, "compact_ann_index commit")
        cur_v = int(load_ann_meta(root).get("version", 1))
        if cur_v != v0:
            # a concurrent append/delete committed after our layout
            # snapshot — its rows are not in tmp. The interleaved write
            # WINS; the compact aborts cleanly and can simply re-run.
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"index at {root} mutated during compaction (version "
                f"{v0} -> {cur_v}); the concurrent write is preserved — "
                "re-run compact_ann_index"
            )
        # commit intent BEFORE the first rename: once the manifest
        # exists, tmp is complete (written above) and recovery can
        # always roll FORWARD; every other mutation refuses to start
        tmp_pending = pending + ".tmp"
        with open(tmp_pending, "w") as fh:
            json.dump({"meta": new_meta}, fh)
        os.replace(tmp_pending, pending)
        os.rename(f"{root}/vectors", old_dir)
        os.rename(tmp, f"{root}/vectors")
        _write_meta(root, new_meta)
        shutil.rmtree(old_dir)
        os.remove(pending)
    return {"compacted": True, "meta_version": new_meta["version"]}


def recover_ann_index(root: str) -> dict:
    """Finish or roll back a crashed compaction swap (the documented
    resume path every mutation's refusal message points at). Driven by
    the `compact.pending` manifest, which is written only AFTER the
    temp layout is complete, so every state is decidable:

    - vectors/ present + tmp present  -> crash before the first rename:
      roll BACK (drop tmp; the live layout and meta were never touched)
    - vectors/ absent + tmp present   -> crash between the renames:
      roll FORWARD (tmp is complete by construction)
    - vectors/ present + tmp absent   -> crash after the swap: finish
      the commit (meta write is idempotent; sweep __old)
    - vectors/ absent + tmp absent + __old present -> roll back __old

    Without a pending manifest this only sweeps pre-protocol debris.
    Idempotent; safe to run at any time; takes the maintenance lock."""
    pending = os.path.join(root, _PENDING)
    vec = os.path.join(root, "vectors")
    tmp = os.path.join(root, _TMP_DIR)
    old = os.path.join(root, _OLD_DIR)
    with _maintenance_lock(root):
        if not os.path.exists(pending):
            swept = []
            for p in (tmp, old):
                if os.path.isdir(p) and os.path.isdir(vec):
                    shutil.rmtree(p)
                    swept.append(os.path.basename(p))
            return {"recovered": False, "swept": swept}
        with open(pending) as fh:
            new_meta = json.load(fh)["meta"]
        if not os.path.isdir(vec) and os.path.isdir(tmp):
            os.rename(tmp, vec)  # roll forward
        if os.path.isdir(vec):
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)  # roll back: swap never started
            else:
                # swap done (or just completed above): finish the commit
                cur = load_ann_meta(root)
                if int(cur.get("version", 1)) < int(new_meta["version"]):
                    _write_meta(root, new_meta)
                if os.path.isdir(old):
                    shutil.rmtree(old)
        elif os.path.isdir(old):
            os.rename(old, vec)  # neither new nor tmp: restore old
        os.remove(pending)
        return {
            "recovered": True,
            "meta_version": int(load_ann_meta(root).get("version", 1)),
        }
