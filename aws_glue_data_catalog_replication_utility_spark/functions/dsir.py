"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over the documents relation: pick raw-corpus
examples whose hashed-n-gram distribution looks like a TARGET corpus.

The published recipe, re-expressed as four relational steps:

1. **Features** (`dsir_features`): each document becomes hashed-n-gram
   counts — unigrams + bigrams hashed into `n_buckets` (the paper's
   10k) — i.e. a sparse (doc, bucket, c) relation. The hash is the
   engine-portable md5-prefix construction every cross-engine lane
   here uses (`dedup._base_hash`), so the pytest reference can
   reproduce it bit-for-bit.
2. **Bucket models** (`dsir_bucket_logratio`): fit bag-of-n-grams
   models for the target (p) and raw (q) corpora — bucket counts with
   add-alpha smoothing — and keep only their pointwise log ratio
   r_b = ln(p_b) - ln(q_b), a relation of at most `n_buckets` rows
   (broadcast-sized no matter the corpus).
3. **Importance weights** (`dsir_importance_weights`): per document,
   log w = sum_b c_b * r_b. The per-doc sum folds a bucket-SORTED
   list left-to-right (`F.aggregate`), so the float accumulation
   order is deterministic and engine-reproducible.
4. **Gumbel top-k resampling** (`dsir_resample`): sampling k docs
   without replacement with probability proportional to w^(1/T) ==
   taking the top k of log(w)/T + Gumbel noise (the Gumbel-max
   trick). The noise is seeded per (seed, doc id) through the same
   md5 construction — retry-stable, no RNG state, same discipline as
   `sampling.shuffle_assignment` (the reference's rejected
   wall-clock-keyed runs, SNSUtil.java:91-92, are the counterexample).

Scale shape at 100 TB: the gram explode aggregates map-side into
(doc, bucket) partial counts; corpus bucket totals shuffle on the
BUCKET key (cardinality n_buckets, not corpus size); the log-ratio
relation broadcasts; the per-doc weight is one aggregation keyed by
doc id; the final selection is a TakeOrderedAndProject top-k, never a
full sort. Zero Python in the hot path — every step is built-in
expressions.

Numeric contract (same as `text.unigram_logprob`): integer columns
(n_grams, counts) are engine-exact; log-valued doubles are
tolerance-checked against the pytest pure-Python reference (ln ulps
differ across engines); the SELECTION is compared as a set, with the
test asserting the decision margin dwarfs float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _base_hash

DSIR_SALT = "dsir:"


def _grams(text_col) -> F.Column:
    """Unigrams + bigrams of the whitespace tokenization, one array."""
    toks = F.split(F.trim(text_col), r"\s+")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Sparse hashed-n-gram counts: (id, bucket, c). The explode
    aggregates straight into (doc, bucket) with map-side combine —
    the wide gram stream never shuffles raw."""
    g = df.select(
        F.col(id_col), F.explode(_grams(F.col(text_col))).alias("__g")
    ).where(F.col("__g") != "")
    bucket = (
        _base_hash(F.concat(F.lit(salt), F.col("__g"))) % n_buckets
    ).alias("bucket")
    return g.select(F.col(id_col), bucket).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def dsir_bucket_logratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int = 10_000,
    alpha: float = 1e-4,
) -> DataFrame:
    """(bucket, log_ratio): ln p_b - ln q_b with add-alpha smoothing,
    p from the target corpus's features, q from the raw corpus's.
    Buckets unseen in BOTH corpora are omitted (their ratio is the
    constant ln(alpha/(Tp+alpha*B)) - ln(alpha/(Tq+alpha*B)) and they
    never match a document feature row, so the weight sum is
    unaffected). At most `n_buckets` rows — broadcast it."""
    tp = target_feats.groupBy("bucket").agg(F.sum("c").alias("tc"))
    rq = raw_feats.groupBy("bucket").agg(F.sum("c").alias("rc"))
    # grand totals as one-row broadcast relations, never a collect
    tt = target_feats.agg(F.sum("c").alias("tt"))
    rt = raw_feats.agg(F.sum("c").alias("rt"))
    joined = (
        tp.join(rq, on="bucket", how="full")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    a = F.lit(float(alpha))
    b = F.lit(float(n_buckets))
    logp = F.log(
        (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + a)
        / (F.col("tt").cast("double") + a * b)
    )
    logq = F.log(
        (F.coalesce(F.col("rc"), F.lit(0)).cast("double") + a)
        / (F.col("rt").cast("double") + a * b)
    )
    return joined.select("bucket", (logp - logq).alias("log_ratio"))


def dsir_importance_weights(
    feats: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, log_w): log importance weight per document,
    log_w = sum_b c_b * r_b. Buckets with no ratio row contribute 0
    (they were unseen in both model corpora). The sum folds the
    bucket-sorted contribution list LEFT-TO-RIGHT so the float result
    is order-deterministic — reproducible across runs and engines."""
    contrib = feats.join(F.broadcast(logratio), on="bucket", how="left").select(
        F.col(id_col),
        F.col("c"),
        F.struct(
            F.col("bucket"),
            (
                F.col("c").cast("double")
                * F.coalesce(F.col("log_ratio"), F.lit(0.0))
            ).alias("t"),
        ).alias("__s"),
    )
    return contrib.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.aggregate(
            F.sort_array(F.collect_list("__s")),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("log_w"),
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: str = "0",
    id_col: str = "doc_id",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k: k docs sampled WITHOUT replacement with
    probability proportional to w^(1/temperature), deterministically
    from `seed`. key = log_w/T + Gumbel(0,1), Gumbel noise derived
    per doc from the md5 hash of (seed, id) — no RNG state, stable
    under retries and repartitioning. Top-k executes as
    TakeOrderedAndProject (never a full sort). Returns (id, n_grams,
    log_w, key), highest key first."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    h = _base_hash(
        F.concat(
            F.lit("gum:"),
            F.lit(str(seed)),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    # h is uniform on [0, 2^32): map to the open unit interval
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.col("log_w") / F.lit(float(temperature)) + gumbel
    return (
        weights.select(F.col(id_col), "n_grams", "log_w", key.alias("key"))
        .orderBy(F.desc("key"), F.col(id_col))
        .limit(k)
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1e-4,
    seed: str = "0",
    temperature: float = 1.0,
) -> DataFrame:
    """The composed pipeline: features for both corpora -> bucket
    log-ratio model -> per-doc importance weights over `raw` ->
    Gumbel top-k. Returns the selected raw docs joined back to their
    text: (id, text, n_grams, log_w, key)."""
    rf = dsir_features(raw, id_col, text_col, n_buckets)
    tf = dsir_features(target, id_col, text_col, n_buckets)
    ratio = dsir_bucket_logratio(tf, rf, n_buckets, alpha)
    w = dsir_importance_weights(rf, ratio, id_col)
    picked = dsir_resample(w, k, seed, id_col, temperature)
    return picked.join(
        raw.select(id_col, text_col), on=id_col, how="inner"
    ).select(id_col, text_col, "n_grams", "log_w", "key").orderBy(
        F.desc("key"), F.col(id_col)
    )
