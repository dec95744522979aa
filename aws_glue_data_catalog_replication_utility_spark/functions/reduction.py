"""Embedding dimensionality reduction: distributed PCA.

The preprocessing stage in front of the similarity stack: a 768-d
embedding column costs 768 floats per row in every ANN shuffle,
codebook train, and index build; projecting to the top-k principal
components (k ~ 64-128 keeps most cosine structure) cuts that byte
volume proportionally BEFORE the expensive stages run. MLlib's PCA is
the right engine here and is used as-is: the fit is one distributed
pass (Gram-matrix accumulation via treeAggregate — O(dim^2) driver
state, never O(rows)), the transform is a map-only mat-vec that
whole-stage-pipelines with the downstream lanes.

`pca_reduce` wraps it array-in/array-out (the engine's embedding
type is `array<float>`, MLlib speaks VectorUDT — `array_to_vector` /
`vector_to_array` bridge without a Python UDF), returns the reduced
relation plus the explained-variance ratios so callers can pick k by
coverage, and optionally L2-renormalizes the output — cosine lanes
downstream assume unit vectors, and an orthogonal projection does NOT
preserve norms.

Semantics note (pinned in tests): MLlib derives the components from
the CENTERED covariance but applies the rotation to the RAW vectors —
`transform` does not subtract the mean. The map is therefore strictly
linear (a rotation + truncation), which is what the downstream cosine
lanes want; callers needing centered scores subtract the projected
mean themselves.

Tested against a numpy SVD oracle: component subspace agreement up to
sign (distinct eigenvalues), explained variance matched, and the
monotone-coverage property (more components never explain less)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pca_reduce(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    renormalize: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, list[float]]:
    """Project `vec_col` onto its top-`k` principal components.
    Returns (reduced_df, explained_variance_ratios): reduced_df is
    (id_col, vec_col array<float> of length k, *extra_cols);
    ratios[i] is component i's share of total variance. With
    `renormalize` (default) outputs are unit vectors, ready for the
    cosine/ANN lanes."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if k < 1:
        raise ValueError("k must be >= 1")
    feats = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "__features"
        ),
    )
    model = PCA(k=k, inputCol="__features", outputCol="__pca").fit(feats)
    arr = vector_to_array(F.col("__pca"))
    if renormalize:
        norm = F.sqrt(
            F.aggregate(
                arr, F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        arr = F.when(
            norm > 0, F.transform(arr, lambda x: x / norm)
        ).otherwise(arr)
    out = model.transform(feats).select(
        F.col(id_col),
        arr.cast("array<float>").alias(vec_col),
        *[F.col(c) for c in extra_cols],
    )
    return out, [float(v) for v in model.explainedVariance.toArray()]
