"""Corpus report: the dataset datasheet in one command.

Every released training corpus ships a data card (docs, tokens, size
distribution, language/source composition, duplication level, quality
profile). This module computes that card with the engine's own
column primitives in a FIXED number of passes regardless of corpus
size:

- pass 1: one global aggregation over a single projection — counts,
  token totals, exact + approximate distinct fingerprints (the exact
  distinct is one extra shuffle; `approx=True` swaps it for HLL++ and
  saves it), token-count percentiles (`percentile_approx`, driver gets
  a handful of doubles), quality-score moments;
- pass 2: one groupBy per requested composition axis (source, lang),
  each map-side combined, top-N by document count to the driver.

Driver traffic is O(axes x top_n) rows + one scalar row — never
documents. All heavy numbers integer or md5-derived, so the DuckDB
twin pins them exactly; percentiles are declared-approximate (the
100 TB-honest choice) and tolerance-checked against exact quantiles.

Reference tie-in: the reference's audit surface reports replication
status per table (DDBUtil status items); this is the same one-look
observability pointed at corpus content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import fingerprint, quality_score


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    axes: tuple[str, ...] = ("source", "lang"),
    top_n: int = 20,
    approx: bool = False,
) -> dict:
    """JSON-safe dataset card. `axes` lists composition columns to
    break down (absent columns are skipped silently — the card adapts
    to the schema); `approx=True` uses HLL++ for the duplicate count
    (rel err ~2%, one fewer shuffle at scale)."""
    t = F.col(text_col)
    toks = F.when(
        t.isNull() | (F.trim(t) == ""), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    proj = df.select(
        F.col(id_col).alias("__id"),
        t.isNull().cast("int").alias("__null_text"),
        toks.alias("__toks"),
        F.length(F.coalesce(t, F.lit(""))).alias("__chars"),
        fingerprint(F.coalesce(t, F.lit(""))).alias("__fp"),
        quality_score(F.coalesce(t, F.lit("")), rounded=False).alias("__q"),
    )
    distinct_fp = (
        F.approx_count_distinct("__fp")
        if approx
        else F.count_distinct("__fp")
    )
    row = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__null_text").alias("n_null_text"),
        F.sum("__toks").alias("total_tokens"),
        F.sum("__chars").alias("total_chars"),
        distinct_fp.alias("distinct_fingerprints"),
        F.percentile_approx(
            "__toks", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]),
            F.lit(10000),
        ).alias("tok_pcts"),
        F.min("__toks").alias("tok_min"),
        F.max("__toks").alias("tok_max"),
        F.avg("__q").alias("quality_mean"),
        F.min("__q").alias("quality_min"),
        F.max("__q").alias("quality_max"),
    ).collect()[0]

    n = int(row["n_docs"])
    if n == 0:
        return {
            "n_docs": 0,
            "n_null_text": 0,
            "total_tokens": 0,
            "total_chars": 0,
            "distinct_fingerprints": 0,
            "exact_dup_docs": 0,
            "exact_dup_rate": 0.0,
            "dup_count_method": "hll" if approx else "exact",
            "tokens": None,
            "quality": None,
            "axes": {},
        }
    dup_docs = n - int(row["distinct_fingerprints"])
    card: dict = {
        "n_docs": n,
        "n_null_text": int(row["n_null_text"]),
        "total_tokens": int(row["total_tokens"]),
        "total_chars": int(row["total_chars"]),
        "distinct_fingerprints": int(row["distinct_fingerprints"]),
        "exact_dup_docs": dup_docs,
        "exact_dup_rate": (dup_docs / n) if n else 0.0,
        "dup_count_method": "hll" if approx else "exact",
        "tokens": {
            "min": int(row["tok_min"]) if row["tok_min"] is not None else None,
            "p25": int(row["tok_pcts"][0]),
            "p50": int(row["tok_pcts"][1]),
            "p75": int(row["tok_pcts"][2]),
            "p95": int(row["tok_pcts"][3]),
            "max": int(row["tok_max"]) if row["tok_max"] is not None else None,
        },
        "quality": {
            "mean": float(row["quality_mean"]),
            "min": float(row["quality_min"]),
            "max": float(row["quality_max"]),
        },
        "axes": {},
    }

    cols = set(df.columns)
    tok_total = card["total_tokens"] or 1
    for axis in axes:
        if axis not in cols:
            continue
        rows = (
            df.select(F.col(axis).cast("string").alias("k"), toks.alias("__toks"))
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("__toks").alias("tokens"),
            )
            .orderBy(F.desc("docs"), F.asc("k"))
            .limit(top_n)
            .collect()
        )
        card["axes"][axis] = [
            {
                "value": r["k"],
                "docs": int(r["docs"]),
                "tokens": int(r["tokens"]),
                "token_share": int(r["tokens"]) / tok_total,
            }
            for r in rows
        ]
    return card
