"""Model-based quality classifier: the fastText-filter slot.

Web-scale training corpora are filtered by a cheap linear classifier
over bag-of-words features (the GPT-3 / CCNet / RefinedWeb recipe:
train on seed "good" vs "bad" documents, keep the corpus rows the
model scores high). The heuristics in `functions/text.py` are
model-free; this module is the learned complement, built entirely
from the engine's own primitives:

- features are the SAME signed hashed-TF embeddings the ANN stack
  uses (`hashed_tf_embedding` — bit-exact cross-engine, zero Python
  in the hot path);
- training is MLlib `LogisticRegression` on the labeled seed set
  (driver holds O(dim) weights, never rows — the seed set is small
  by definition, the fit is one distributed pass per iteration);
- SCORING is a pure column expression: logit = bias + w . x via
  zip_with + aggregate over a literal weight array, map-only, no
  model object, no MLlib on the inference path, no shuffle beyond
  the embedding's own TF aggregation. The exported model is a plain
  dict (JSON-safe) — it rides config planes, not pickles.

At 100 TB the inference path is the one that matters: it is the
embedding pipeline (linear, two bounded shuffles) plus a codegen'd
dot product. The trained weights broadcast as literals inside the
plan itself.

Reference tie-in: the reference gates replication by static prefix
filters (TableWithPartitions dispatch); this is the same gate shape
with a learned predicate over content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot_expr(vec_col: Column, weights: list[float], bias: float) -> Column:
    """bias + w . x as a deterministic left-to-right fold (zip_with
    keeps per-element products in codegen; aggregate folds in array
    order, so a DuckDB twin reproduces the sum order)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec_col, w, lambda a, b: a * b),
        F.lit(float(bias)),
        lambda acc, x: acc + x,
    )


def train_quality_classifier(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 256,
    reg: float = 1e-4,
    max_iter: int = 100,
    normalize: bool = False,
) -> dict:
    """Fit the linear quality model on a labeled seed set (label 1 =
    keep-worthy, 0 = reject). Returns a JSON-safe model dict:
    {dim, normalize, weights[dim], bias, auc, n_pos, n_neg}. The
    embedding config (dim, normalize, L2) is captured IN the model so
    scoring cannot silently diverge from training features."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from .similarity import hashed_tf_embedding

    emb = hashed_tf_embedding(
        labeled, id_col=id_col, text_col=text_col, dim=dim,
        normalize=normalize, l2_normalize=True,
    )
    lab = labeled.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    train = emb.join(lab, on=id_col).select(
        array_to_vector(F.col("embedding")).alias("__x"), "__y"
    )
    # pinned before any action (r13, guide §5): the label census below
    # doubles as the cache fill, so LBFGS's own passes (summarizer,
    # instance blockification, the summary's AUC job) read cached
    # feature rows instead of re-running the embedding pipeline
    # (tokenize + explode + TF aggregation + join) once per pass
    train = train.persist()
    try:
        counts = {
            r["__y"]: r["n"]
            for r in train.groupBy("__y").agg(F.count("*").alias("n")).collect()
        }
        if set(counts) != {0.0, 1.0}:
            raise ValueError(
                f"need both labels 0 and 1 in {label_col}, got {sorted(counts)}"
            )
        # r12 (guide §2): size the training relation's partitioning from
        # its measured row count (already known from the label census)
        # instead of inheriting spark.sql.shuffle.partitions — every LBFGS
        # iteration is a treeAggregate over these partitions, so a 128-row
        # seed set on 64 config-sized slices paid ~64 near-empty tasks x
        # ~20 iterations of pure scheduling. Seed sets are small by
        # definition; a genuinely large labeled set still fans out (~50k
        # rows/slice, capped at 4x cores — and defaultParallelism scales
        # with the executor fleet on a real cluster).
        n_rows = int(sum(counts.values()))
        parts = max(
            1,
            min(
                n_rows // 50_000 + 1,
                labeled.sparkSession.sparkContext.defaultParallelism * 4,
            ),
        )
        lr = LogisticRegression(
            featuresCol="__x", labelCol="__y", regParam=reg, maxIter=max_iter,
            standardization=False,
        )
        m = lr.fit(train.coalesce(parts))
        return {
            "dim": dim,
            "normalize": normalize,
            "weights": [float(w) for w in m.coefficients.toArray()],
            "bias": float(m.intercept),
            "auc": float(m.summary.areaUnderROC),
            "n_pos": int(counts[1.0]),
            "n_neg": int(counts[0.0]),
        }
    finally:
        train.unpersist()


def score_quality(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Score every document with the trained model as PURE column
    expressions: (id_col, quality_logit, quality_prob) — plus
    `quality_keep` when `keep_threshold` is given (keep iff prob >=
    threshold). Embedding config comes from the model dict, so the
    features match training bit-for-bit. Map-only past the embedding's
    own aggregation; the weights are plan literals."""
    from .similarity import hashed_tf_embedding

    weights = model["weights"]
    if len(weights) != model["dim"]:
        raise ValueError(
            f"model dim {model['dim']} != {len(weights)} weights"
        )
    emb = hashed_tf_embedding(
        df, id_col=id_col, text_col=text_col, dim=model["dim"],
        normalize=bool(model.get("normalize", False)), l2_normalize=True,
    )
    logit = _dot_expr(F.col("embedding"), weights, model["bias"])
    out = emb.select(
        F.col(id_col),
        logit.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("quality_prob"),
    )
    if keep_threshold is not None:
        out = out.withColumn(
            "quality_keep", F.col("quality_prob") >= float(keep_threshold)
        )
    return out
