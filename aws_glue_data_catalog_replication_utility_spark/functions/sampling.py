"""Deterministic sampling + sequence packing for training-data pipelines.

Reproducible corpus construction needs sampling that is a PURE FUNCTION
of the row — not Spark's `df.sample` (seeded per-partition RNG: the
kept set changes with partitioning/retries, unusable for an audited
corpus). Here membership is decided by a salted md5 of the row id:
stable across runs, partitionings, engines (the DuckDB oracle recomputes
the identical buckets), and trivially invertible for holdout splits
(`bucket >= rate`).

Sequence packing is the concat-and-chunk shape real LLM pipelines use:
documents are laid head-to-tail in a deterministic order and split into
fixed token windows; a document's bin is floor(prefix_sum / window).
Packing requires a total order, which would serialize on one window —
so it is done PER SHARD (`shard_col`): each shard packs independently
in parallel, the practical formulation at 100 TB (shards are files /
sources / date buckets).

Reference tie-in: the reference has no sampler, but its deterministic
object-key discipline (run ids injected, never wall-clock —
SNSUtil.java:91-92 is the counterexample we rejected) is the same
reproducibility contract applied here to row selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SALT = "smp:"


def hash_bucket(id_col: str, salt: str = SALT, buckets: int = 100) -> F.Column:
    """Deterministic bucket in [0, buckets): the salted id's base hash
    (dedup._base_hash — ONE definition of the engine-portable
    md5-prefix-to-int64 construction; DuckDB mirror is
    ('0x' || substring(md5(...), 1, 8))::BIGINT) modulo buckets."""
    from .dedup import _base_hash

    return _base_hash(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 5,
    salt: str = SALT,
) -> DataFrame:
    """Per-stratum Bernoulli sampling at integer-percent rates, decided
    by the deterministic hash bucket — row membership never depends on
    partitioning, task retries, or a seed. Narrow (no shuffle): a filter
    the optimizer pushes toward the scan."""
    rate = None
    for k, v in sorted(rates_pct.items()):
        cond = F.col(strata_col) == k
        rate = F.when(cond, v) if rate is None else rate.when(cond, v)
    rate = rate.otherwise(default_pct) if rate is not None else F.lit(default_pct)
    return df.where(hash_bucket(id_col, salt) < rate)


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    token_count: F.Column,
    window_tokens: int = 2048,
) -> DataFrame:
    """Greedy concat-and-chunk packing: within each shard, documents in
    `order_col` order are laid head-to-tail; a document belongs to bin
    floor(tokens_before_it / window_tokens). One shuffle on the shard
    key; each shard's running sum is a window cumsum (sorted within its
    partition only — no global order, no single-task bottleneck).
    `order_col` must be unique within a shard for the packing to be
    deterministic (doc ids are). Returns the input plus (n_tokens, bin)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn("n_tokens", token_count).withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / window_tokens
        ),
    )


def mix_corpora(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count: F.Column,
    salt: str = SALT,
) -> DataFrame:
    """Equal-token-budget corpus mixing: every source is downsampled to
    (approximately) the smallest source's token count, with integer
    percent rates derived FROM THE DATA — rate_s = clamp(1, 100,
    (100*min_tokens) DIV tokens_s) — and membership decided by the
    deterministic hash bucket. All integer arithmetic: the mix is
    engine-reproducible and re-runs identically.

    The rate is floored at 1: a source more than 100x the smallest
    source's token count keeps ~1% (over-represented relative to the
    equal-budget ideal, by at most 100x min_tokens) instead of being
    silently dropped from the mix — every non-empty source contributes
    (ADVICE r03). Finer budgets need finer-than-percent buckets.

    Plan: one agg on the source key (corpus-small), a global-window min
    for the budget (source-count rows, not corpus rows), broadcast the
    tiny rate table back, then the narrow hash filter. Returns ALL input
    columns of the kept rows (the mixed corpus is usable as-is) plus
    (n_tokens, rate_pct); column pruning keeps the rate-derivation agg
    narrow regardless."""
    d = df.withColumn("n_tokens", token_count)
    # a zero-token source would poison the budget (min would be 0 -> every
    # real source rated 0 pre-floor, and its own DIV-by-zero NULL would
    # slip past least()): it contributes nothing, so it is excluded
    tot = (
        d.groupBy(source_col)
        .agg(F.sum("n_tokens").alias("__toks"))
        .where(F.col("__toks") > 0)
    )
    rates = tot.withColumn(
        "__b", F.min("__toks").over(Window.partitionBy())
    ).select(
        source_col,
        # DIV (integer division), never `/`+floor: float rounding would
        # break cross-engine reproducibility of the rate itself
        F.greatest(
            F.lit(1), F.least(F.lit(100), F.expr("(100 * __b) DIV __toks"))
        ).alias("rate_pct"),
    )
    return d.join(F.broadcast(rates), on=source_col).where(
        hash_bucket(id_col, salt) < F.col("rate_pct")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    max_rows: int,
) -> DataFrame:
    """Deterministic per-group document cap — the domain-balancing step
    that stops one source dominating a training mix (the Common Crawl
    recipe: cap documents per registered domain before mixing): keep at
    most `max_rows` rows per group, chosen by ascending `id_col` so the
    kept set is a pure function of the data (re-runs and repartitions
    keep the same rows; df.limit per group would not). Returns the
    input columns plus `group_seq` (1-based position within the group).

    One window shuffle on the group key; at 100 TB hot groups are
    exactly the ones being capped, and the rank short-circuits via
    WindowGroupLimit pushdown (Spark emits at most max_rows per group
    from each sort run)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("group_seq", F.row_number().over(w))
        .where(F.col("group_seq") <= max_rows)
    )


def leakage_safe_split(
    df: DataFrame,
    splits: dict[str, int],
    labels: DataFrame | None = None,
    id_col: str = "doc_id",
    label_col: str = "label",
    salt: str = "split:",
) -> DataFrame:
    """Train/eval/test assignment that CANNOT leak near-duplicates
    across splits: the split is a pure function of the document's
    dedup-CLUSTER id, not the document id — two docs the dedup pipeline
    linked (`connected_components` / `connected_components_star`
    output as `labels`: (id, label)) land in the SAME split by
    construction, so a paraphrase of a training doc can never sit in
    the eval set inflating scores (the contamination mechanism the
    eval-decontamination screen exists for, applied at split time).

    `splits` maps name -> integer percent (must sum to 100); cumulative
    ranges over the salted md5 bucket of the cluster key decide
    membership — deterministic across runs, partitionings, and engines
    (same `hash_bucket` contract as `stratified_sample`; the DuckDB
    twin recomputes identical assignments). Docs absent from `labels`
    (or labels=None) are their own singleton cluster.

    Scale: ONE left equi-join against the label relation (broadcast-
    able — it is id->label pairs, far smaller than the corpus), then a
    pure projection; no other shuffle. Returns `df` + (cluster_key,
    split) columns."""
    total = sum(splits.values())
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    if any(v < 0 for v in splits.values()):
        raise ValueError("split percents must be non-negative")

    if labels is not None:
        lab = labels.select(
            F.col(id_col), F.col(label_col).alias("__lab")
        )
        out = df.join(lab, on=id_col, how="left").withColumn(
            "cluster_key",
            F.coalesce(F.col("__lab"), F.col(id_col)).cast("string"),
        ).drop("__lab")
    else:
        out = df.withColumn("cluster_key", F.col(id_col).cast("string"))

    bucket = hash_bucket("cluster_key", salt=salt)
    assign = None
    cum = 0
    for name, pct in splits.items():
        cum += pct
        cond = bucket < cum
        assign = F.when(cond, name) if assign is None else assign.when(
            cond, name
        )
    return out.withColumn("split", assign)


def shuffle_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf:",
) -> DataFrame:
    """Seeded global shuffle as a PURE FUNCTION of the row id — the
    dataloader-prep step of a training pipeline: examples must arrive
    in a reproducible pseudorandom order, split across `n_shards`
    balanced shard files. Spark's own randomness (df.orderBy(rand()) /
    df.sample) is per-partition-seeded — the order changes with
    partitioning and task retries, unusable for an audited corpus.
    Here shard = salted-md5(id) % n_shards and the within-shard order
    key is a SECOND salted md5 (independent salt namespace, 's:' vs
    'o:'), ties broken by id: the permutation is identical across
    runs, partitionings, and engines (the DuckDB twin recomputes it
    bit-for-bit).

    Returns the input plus (shard int, shuffle_key long). Narrow — no
    shuffle; the shuffle happens once, in the writer."""
    from .dedup import _base_hash

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sid = F.col(id_col).cast("string")
    return df.withColumn(
        "shard",
        (_base_hash(F.concat(F.lit(salt + "s:"), sid)) % n_shards).cast(
            "int"
        ),
    ).withColumn(
        "shuffle_key", _base_hash(F.concat(F.lit(salt + "o:"), sid))
    )


def write_shuffled_shards(
    df: DataFrame,
    out: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf:",
    mode: str = "error",
) -> dict:
    """Materialize the seeded shuffle: hive-partitioned parquet
    `out/shard=K/`, each shard ONE file whose row order is the shard's
    deterministic shuffle order (repartition on the shard key makes a
    shard's rows land in exactly one task; sortWithinPartitions orders
    them; the partitionBy writer then splits directories WITHOUT
    reordering — parquet files preserve write order). A dataloader
    streams shard files round-robin and gets the same global
    pseudorandom order every run.

    ONE shuffle total (the repartition); balance is multinomial —
    shards deviate from n/k by O(sqrt(n/k)), and there is no skew
    amplification because the shard key is a hash, not a data key.
    Returns {"shards": ..., "rows": ...}."""
    a = shuffle_assignment(df, id_col, n_shards, salt)
    (
        a.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out)
    )
    n = a.sparkSession.read.parquet(out).count()
    return {"shards": n_shards, "rows": int(n)}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count: F.Column,
    alpha: float = 0.5,
    salt: str = SALT,
) -> DataFrame:
    """Temperature-scaled corpus mixing — the multilingual sampling
    recipe (mBERT/XLM: keep probability of source s proportional to
    tokens_s^alpha): alpha=1 keeps everything (natural distribution),
    alpha=0 is the equal-token-budget mix (`mix_corpora`), values
    between damp the head sources without starving the tail. The
    realized budget is the largest achievable WITHOUT upsampling: the
    source with the highest share-to-size ratio keeps 100% and every
    other source's integer-percent rate scales down from it.

    Rates are computed on the DRIVER from the exact per-source token
    totals (O(sources) rows collected — the source list is small by
    definition) so fractional powers never have to reproduce across
    engines: the rates become plan literals, and row membership stays
    the deterministic salted-md5 bucket (`hash_bucket`) shared with
    every sampler in this module — kept sets are pure functions of
    the data, bit-reproducible in the DuckDB twin given the same
    literal rates (the rate math itself is pinned against a Python
    reference in tests). alpha=0 and alpha=1 short-circuit to exact
    integer arithmetic.

    Plan: one agg on the source key, one broadcast join of the tiny
    rate table, one narrow hash filter. Returns kept rows +
    (n_tokens, rate_pct)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    d = df.withColumn("n_tokens", token_count)
    totals = {
        r["src"]: r["toks"]
        for r in d.groupBy(F.col(source_col).alias("src"))
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
        if r["toks"] and r["toks"] > 0
    }
    if not totals:
        raise ValueError("no source has a positive token count")
    if alpha == 1.0:
        rates = {s: 100 for s in totals}
    elif alpha == 0.0:
        m = min(totals.values())
        rates = {
            s: max(1, min(100, (100 * m) // t)) for s, t in totals.items()
        }
    else:
        shares = {s: float(t) ** alpha for s, t in totals.items()}
        z = sum(shares.values())
        # largest budget with no source oversampled: the binding
        # source keeps exactly 100%
        budget = min(t * z / shares[s] for s, t in totals.items())
        rates = {
            s: max(1, min(100, int((100.0 * shares[s] * budget / z) // t)))
            for s, t in totals.items()
        }
    rate_rows = [(s, r) for s, r in sorted(rates.items())]
    rate_df = d.sparkSession.createDataFrame(
        rate_rows, f"{source_col} string, rate_pct int"
    )
    return d.join(F.broadcast(rate_df), on=source_col).where(
        hash_bucket(id_col, salt) < F.col("rate_pct")
    )


def pack_examples(
    df: DataFrame,
    tokens_col: str,
    shard_col: str,
    order_col: str,
    window_tokens: int = 2048,
    drop_last: bool = False,
) -> DataFrame:
    """The last mile of the training pipeline: token arrays in,
    FIXED-LENGTH training examples out. Documents are first binned by
    the greedy concat-and-chunk rule (`pack_sequences` — one window
    shuffle per shard, no global order), then each (shard, bin)'s
    documents are laid head-to-tail in `order_col` order and cut into
    `window_tokens`-sized examples. Bins are bounded by construction
    (~window + one document), so the per-bin concat array that the
    cutting HOF walks is small no matter the corpus size — the packing
    never builds a shard-wide array.

    Semantics (pinned against a Python reference in tests): windows
    never cross BIN boundaries (a document's tokens can span examples
    WITHIN its bin — the standard causal-LM packing — but the final
    short window of each bin is emitted as-is, or dropped with
    `drop_last=True`). Lossless with drop_last=False: concatenating
    every example of a bin reproduces the bin's token stream exactly.

    Returns (shard_col, bin, example_idx, tokens array, n_tokens).
    Plan: pack_sequences' window shuffle + ONE groupBy(shard, bin)
    with sort_array+flatten (map-side combined), then a posexplode —
    all codegen, no Python."""
    packed = pack_sequences(
        df.select(shard_col, order_col, tokens_col),
        shard_col,
        order_col,
        F.size(F.col(tokens_col)),
        window_tokens,
    )
    binned = packed.groupBy(shard_col, "bin").agg(
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col(order_col).alias("o"),
                                 F.col(tokens_col).alias("t"))
                    )
                ),
                lambda s: s["t"],
            )
        ).alias("__stream")
    )
    n_win = F.ceil(F.size("__stream") / F.lit(window_tokens)).cast("int")
    # sequence(0, -1) is DESCENDING, not empty (the train_bpe lesson):
    # an all-empty bin must yield no examples
    idx = F.when(n_win >= 1, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx,
        lambda i: F.slice(
            F.col("__stream"), i * window_tokens + 1, window_tokens
        ),
    )
    out = binned.select(
        shard_col,
        "bin",
        F.posexplode(chunks).alias("example_idx", "tokens"),
    ).withColumn("n_tokens", F.size("tokens"))
    if drop_last:
        out = out.where(F.col("n_tokens") == window_tokens)
    return out
