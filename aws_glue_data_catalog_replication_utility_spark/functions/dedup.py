"""Deduplication operators for training-data pipelines.

- exact_dedup: hash-groupBy keep-one (generalizes the reference's
  latest-wins upsert semantics to arbitrary keys).
- word_shingles + jaccard_pairs: exact n-gram Jaccard near-dup pairs via
  a shingle inverted-index join — the correctness baseline.
- minhash_signature: deterministic MinHash (md5-keyed min over shingles)
  whose LSH banding gives the 100 TB scale path: candidate generation is
  a band-key equi-join instead of the quadratic shingle join.

Determinism: all hashing is md5-of-string (identical in Spark and the
DuckDB oracle); no random seeds at runtime — seed strings are literals.

Scale notes: the shingle join's cost is sum over shingles of
(docs-per-shingle)^2, which explodes on hot shingles; minhash banding
bounds it by the band-bucket sizes. Both paths shuffle on the shingle /
band key; skewed hot buckets are handled by AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """One surviving row per distinct `cols` value: keeps the min id
    (deterministic, unlike dropDuplicates' arbitrary pick). Returns
    (cols..., keep_id, dup_count). Single hash aggregation."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count")
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Explode each document into its distinct word n-gram shingles.
    Returns (id_col, shingle). JVM-side: split + transform + explode
    (no Python)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # positions 0 .. size-n; explicitly empty when doc is shorter than n
    # tokens (sequence(0, negative) would count DOWN, not produce empty)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def jaccard_pairs(
    shingles: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard-similar pairs from a (id, shingle) relation.

    inverted-index self-join on shingle -> pair intersection counts ->
    join per-doc set sizes -> jaccard = inter / (|a|+|b|-inter).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """Deterministic MinHash signature: h_i(doc) = min over shingles of
    md5(i || ':' || shingle). One aggregation computes all hashes
    (map-side partial min). Returns (id, mh_0..mh_{k-1})."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_band_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band of the
    signature. bands*rows == num_hashes. Scale path: equi-join on the
    band key (shuffle bounded by bucket sizes), never the full n^2."""
    rows = num_hashes // bands
    assert rows * bands == num_hashes
    band_frames = []
    for b in range(bands):
        key = F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
        band_frames.append(
            signatures.select(
                F.col(id_col), F.lit(b).alias("band"), key.alias("band_key")
            )
        )
    banded = band_frames[0]
    for f in band_frames[1:]:
        banded = banded.unionByName(f)
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(b_, on=["band", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
