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

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegralType, StringType, StructField, StructType


def _env_int(name: str, default: int) -> int:
    """Integer env knob with a descriptive failure (ADVICE r12): a
    malformed value raises a config error naming the variable instead
    of a bare ValueError deep inside a query plan."""
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    try:
        return int(v)
    except ValueError as e:
        raise ValueError(
            f"environment variable {name} must be an integer, got {v!r}"
        ) from e


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """One surviving row per distinct `cols` value: keeps the min id
    (deterministic, unlike dropDuplicates' arbitrary pick). Returns
    (cols..., keep_id, dup_count). Single hash aggregation."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count")
    )


def normalize_text(col) -> F.Column:
    """The standard near-dup / decontamination normalization (the
    RefinedWeb/Dolma recipe, VERDICT r05 #5): casefold, punctuation ->
    space, digit runs -> a single '0'. Without it a case- or
    punctuation-variant duplicate escapes every shingle lane (the raw
    tokens differ). Pure regexp expressions, chosen to be DuckDB-
    reproducible bit-for-bit: lower() + RE2-compatible classes, with
    the oracle using regexp_replace(..., 'g')."""
    c = F.lower(col if not isinstance(col, str) else F.col(col))
    c = F.regexp_replace(c, "[^0-9a-z\\s]+", " ")
    return F.regexp_replace(c, "[0-9]+", "0")


def _token_expr(text_col: str, normalize: bool) -> F.Column:
    """The tokenization both the shingle builder and its eligibility
    filter must share (a doc's token count decides whether it shingles
    at all, so the two sides may not disagree on normalization)."""
    base = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return F.split(F.trim(base), r"\s+")


def shingle_array(
    text_col: str, n: int = 5, distinct: bool = True, normalize: bool = False
) -> F.Column:
    """Column expression: the word n-gram shingles of a text column, as
    an array (distinct by default). Pure narrow expression (split +
    transform), whole-stage codegen, no Python, no explode.

    distinct=False skips the array_distinct pass — correct whenever the
    consumer is duplicate-insensitive (a MIN over the shingles), and
    measured at ~half the cost of the signature lane.

    normalize=True applies `normalize_text` first (default off: the
    historical lanes and their pinned oracles shingle raw tokens)."""
    toks = _token_expr(text_col, normalize)
    # positions 0 .. size-n; explicitly empty when doc is shorter than n
    # tokens (sequence(0, negative) would count DOWN, not produce empty)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh) if distinct else sh


# Java's \s is exactly [ \t\n\x0B\f\r]; RE2 (pyarrow) \s lacks \x0B, so
# the Arrow shingle lane spells the class out to match _token_expr's
# split("\\s+") byte-for-byte.
_JAVA_WS_RE2 = "[ \\t\\n\\x0B\\f\\r]+"


def _shingle_gen_arrow(n: int):
    """mapInArrow generator: the vectorized twin of
    explode(shingle_array(...)) (pinned bit-identical by
    test_shingle_arrow_lane_matches_expression_lane). Per batch, all
    n-grams are built in three Arrow kernels — regex split to a flat
    token buffer, n zero-copy slices joined element-wise, one group_by
    for the per-doc distinct — instead of an interpreted
    per-element transform+slice+concat tree (guide §4.2; measured ~6x
    on the sf0.1 documents table). Tokenization parity with Spark's
    split(trim(text), '\\s+'): trim strips ASCII space only, the split
    keeps leading/trailing empty tokens (Java limit=-1 == RE2 split),
    and NULL text yields zero shingles."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(0)
            text = batch.column(1)
            valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
            toks = pc.split_pattern_regex(
                pc.utf8_trim(pc.fill_null(text, ""), " "), _JAVA_WS_RE2
            )
            if isinstance(toks, pa.ChunkedArray):  # pragma: no cover
                toks = toks.combine_chunks()
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            flat = toks.values
            counts = np.maximum(offs[1:] - offs[:-1] - (n - 1), 0)
            counts[~valid] = 0  # NULL text -> no shingles (matches F.when)
            if not counts.sum():
                continue
            # every candidate start in the flat buffer, then mask to the
            # starts whose n tokens stay inside one document
            m = len(flat) - (n - 1)
            joined = pc.binary_join_element_wise(
                *[flat.slice(k, m) for k in range(n)], " "
            )
            nz = counts > 0
            starts = np.repeat(offs[:-1][nz], counts[nz])
            within = np.concatenate([np.arange(c) for c in counts[nz]])
            sh = joined.take(pa.array(starts + within))
            out_ids = ids.take(pa.array(np.repeat(np.flatnonzero(nz), counts[nz])))
            distinct = pa.table({"__id": out_ids, "shingle": sh}).group_by(
                ["__id", "shingle"], use_threads=False
            ).aggregate([])
            yield from distinct.to_batches()

    return gen


def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    normalize: bool = False,
    lane: str = "arrow",
) -> DataFrame:
    """Explode each document into its distinct word n-gram shingles.
    Returns (id_col, shingle). The exploded relation feeds the
    inverted-index joins (jaccard_pairs, prune_hot_shingles).
    normalize=True casefolds/strips per `normalize_text` so case- and
    punctuation-variant duplicates land on the same shingles.

    lane="arrow" (default, r12): generation runs vectorized in pyarrow
    (`_shingle_gen_arrow`); normalization stays a JVM regexp projection
    BEFORE the boundary so only (id, text) crosses, and the map is
    narrow — partitioning of the input (e.g. a split-guard's hash
    repartition) is preserved and no extra exchange is introduced.
    lane="expr" keeps the pure-expression explode — the documented
    equivalence anchor (the DuckDB oracles twin IT), same rows
    bit-for-bit (pinned by test)."""
    if lane == "expr":
        return df.select(
            F.col(id_col),
            F.explode(shingle_array(text_col, n, normalize=normalize)).alias("shingle"),
        )
    base = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    src = df.select(F.col(id_col), base.alias("__text"))
    id_type = src.schema[id_col].dataType.simpleString()
    return src.mapInArrow(
        _shingle_gen_arrow(n), f"`{id_col}` {id_type}, shingle string"
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


# universal-hash family for MinHash: mh_i = min((a_i*h + b_i) mod P) over
# the shingles' base hashes h (first 8 md5 hex chars as int64). ONE md5
# per shingle + k integer permutations — the textbook construction
# (pairwise-independent family), ~k/1 cheaper than k salted md5 calls.
# P = 2^61-1 (Mersenne); a_i < 2^28 keeps a*h < 2^60: no int64 overflow,
# so DuckDB's BIGINT arithmetic reproduces every value bit-exactly.
# Mersenne modulus for the MinHash permutation family. MUST be small
# enough that a_i*h + b_i actually WRAPS: with the 2^61-1 modulus this
# family originally used, a <= ~2e8 and h < 2^32 gave a*h + b < P
# ALWAYS, so every "permutation" was monotone in h, all num_hashes
# components shared one argmin shingle, and the Jaccard estimator
# degenerated to {0, 1} ("do the docs share the globally-min-md5
# shingle") — exact-dup pairs and the DuckDB twins still agreed (both
# sides computed the same degenerate value), which is how it survived
# seven rounds. With 2^31-1 the products (~8.6e17) wrap ~4e8 times
# while staying far inside int64 (and DuckDB BIGINT), restoring a real
# min-wise family with est granularity 1/num_hashes.
MINHASH_P = (1 << 31) - 1
MINHASH_AB: tuple[tuple[int, int], ...] = (
    (87178291, 40014), (143906717, 2531011), (16807, 9999999),
    (48271, 1013904223), (69621, 1655692), (181081, 97531),
    (205891, 134775813), (233317, 7919), (99990001, 65537),
    (33554467, 1234567), (67867967, 362437), (198491317, 50331653),
)


def _base_hash(col) -> F.Column:
    """First 8 md5 hex chars of a string column, as int64 (identical in
    DuckDB: ('0x' || substring(md5(x), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signature(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """Deterministic MinHash signature over a (id, shingle) relation:
    mh_i(doc) = min over shingles of (a_i*h + b_i) mod P. One
    aggregation computes all hashes (map-side partial min). Returns
    (id, mh_0..mh_{k-1}) as int64 columns."""
    assert num_hashes <= len(MINHASH_AB)
    h = _base_hash(F.col("shingle"))
    base = shingles.select(F.col(id_col), h.alias("__h"))
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % MINHASH_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return base.groupBy(id_col).agg(*aggs)


def ensure_min_parallelism(
    df: DataFrame, fraction: float = 1.0, keys: list[str] | None = None
) -> DataFrame:
    """Round a CPU-heavy narrow plan's parallelism up toward the
    cluster's cores. A shuffle-free projection inherits its parallelism
    from input splits; when the source is fewer splits than cores (one
    small parquet file locally; a handful of giant row groups in the
    wild) the whole compute serializes onto those few tasks. The
    repartition shuffles only the COMPACT input rows (documents, not
    their exploded shingles), and is skipped entirely when splits
    already cover the target — at 100 TB the scan has ~million splits
    and this is a no-op.

    fraction tunes the target: 1.0 (all cores) for a single-stage
    narrow projection; smaller (e.g. 0.25) when the result feeds a
    CACHED relation consumed by many downstream stages — every stage
    over the cache schedules one task per cached partition, so fewer,
    fatter partitions amortize per-stage scheduling overhead across the
    fan-out.

    keys (r12, guide §2.5): deterministic high-cardinality columns to
    hash-partition on instead of round-robin. Keyless repartition(n)
    pays a LOCAL SORT of its whole input first (sortBeforeRepartition,
    on by default since SPARK-23207, so retried tasks reproduce the
    same row placement); hashing a deterministic key needs no sort AND
    is retry-safe by construction (measured on the q01 shape: 2.03s ->
    1.53s median). Pass the relation's natural unique key; hash spread
    over xxhash64 is uniform for any cardinality >> partitions.

    Size cap (r13, guide §2 "derive partitioning from input size"):
    the core-derived target is additionally capped so every task gets
    at least SPARK_GRAFT_SPLIT_TASK_BYTES of input (default 128 KiB).
    Every partition of the downstream stage costs a fixed scheduling +
    Python-worker/Arrow-stream setup overhead on top of its compute;
    slicing a tiny relation all the way to the core count pays that
    overhead for no compute and SLOWED the 32-core bench below its
    8-core reading (r12 driver scaling block; reproduced quiet+ABBA:
    q16 0.93s at 32 slices of a 594 KB scan vs 0.35s at 4; q19 3.0 ->
    1.7, q27 0.60 -> 0.48). At real scale the cap never binds: any
    multi-GB input's size target exceeds the core count, and a scan
    with >= target splits skips the repartition entirely."""
    spark = df.sparkSession
    target = max(1, int(spark.sparkContext.defaultParallelism * fraction))
    # probe via the JVM RDD directly: df.rdd would additionally build
    # the Python-serialization pipeline on every call (~2x the cost,
    # VERDICT r04); the JVM probe only forces physical planning
    if df._jdf.rdd().getNumPartitions() < target:
        if target > 1:
            # the optimizer already ran for the partition probe above,
            # so the stats visit is a cheap cached-plan walk. Unknown
            # sizes surface as huge defaults (spark.sql.defaultSizeInBytes
            # = Long.Max) and leave the core-derived target in charge.
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            task_bytes = _env_int("SPARK_GRAFT_SPLIT_TASK_BYTES", 128 * 1024)
            if task_bytes > 0:
                target = max(1, min(target, -(-size // task_bytes)))
    if df._jdf.rdd().getNumPartitions() < target:
        if keys:
            return df.repartition(target, F.xxhash64(*[F.col(k) for k in keys]))
        return df.repartition(target)
    return df


def minhash_signature_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 12,
    ensure_parallelism: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """Shuffle-free MinHash: signatures computed per row from the
    document's shingle array (`array_min` over `transform`) instead of
    exploding shingles through a groupBy. Identical values to
    `minhash_signature` (integer min of the same universal-hash family
    (a_i*h + b_i) mod P over each shingle's md5-prefix base hash; docs
    with zero shingles are excluded on both paths) and the projection
    itself is a single narrow map in whole-stage codegen.

    ensure_parallelism=True (default) inserts a repartition SHUFFLE of
    the compact input rows when the source has fewer splits than cores
    (the local small-file case) — so "shuffle-free" holds exactly when
    input splits already cover the cluster, which a 100 TB scan always
    does. Pass False for a strictly shuffle-free plan (e.g. streaming
    DataFrames, where the split-guard's df.rdd probe is unsupported).
    Returns (id, mh_0..mh_{k-1})."""
    assert num_hashes <= len(MINHASH_AB)
    if ensure_parallelism:
        df = ensure_min_parallelism(df, keys=[id_col])
    # exclusion filter on the CHEAP precondition (token count >= n,
    # equivalent to "has shingles") BEFORE the shingle projection: a
    # filter on the shingle array itself would be substituted through
    # the projection by Catalyst and build every array twice (measured
    # 3x this lane's cost). distinct=False because MIN over shingles is
    # duplicate-insensitive — array_distinct would buy nothing for ~half
    # the lane's cost.
    eligible = df.where(F.size(_token_expr(text_col, normalize)) >= n)
    tmp = eligible.select(
        F.col(id_col),
        shingle_array(text_col, n, distinct=False, normalize=normalize).alias("__sh"),
    )
    # one md5 per shingle, then k integer permutations over the int array
    hashed = tmp.select(
        F.col(id_col),
        F.transform("__sh", lambda s: _base_hash(s)).alias("__h"),
    )
    return hashed.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform("__h", lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
        ],
    )


def prune_hot_shingles(
    shingles: DataFrame, max_df: int, id_col: str = "doc_id"
) -> DataFrame:
    """Drop shingles whose document frequency exceeds `max_df` before the
    inverted-index self-join. THE scale guard for exact Jaccard: the
    join's cost is Σ(docs-per-shingle)², so one stopword-like shingle in
    10^6 docs is 10^12 candidate rows — capping df bounds every bucket.
    Standard near-dup practice (hot shingles carry no discriminative
    signal); the resulting Jaccard is computed over the pruned sets."""
    df_counts = shingles.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__df")  # shingles are distinct per doc
    )
    return shingles.join(
        df_counts.where(F.col("__df") <= max_df).select("shingle"),
        on="shingle",
        how="left_semi",
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Token-level SimHash as a BIGINT: every token votes +1/-1 on each
    of `bits` bit positions according to the first `bits` bits of
    md5(token); output bit i is 1 iff the vote sum is positive.

    One explode + one aggregation (map-side partial sums) — same shuffle
    profile as minhash_signature. Token multiplicity = tf weighting.
    Returns (id, simhash)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    # first 4 hex chars of md5 = 16 deterministic bits, same in DuckDB
    val = F.conv(F.substring(F.md5("tok"), 1, bits // 4), 16, 10).cast("long")
    votes = toks.select(F.col(id_col), val.alias("v")).groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("v"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming between
    SimHash signatures — via the pigeonhole banding trick: split the
    `bits` into `bands` chunks; any pair within distance bands-1 agrees
    exactly on at least one chunk, so candidates come from `bands`
    equi-joins on the chunk value (the 100 TB path — never all-pairs),
    then the exact bit_count(xor) filter. With bands > max_hamming the
    banding is LOSSLESS (recall 1.0 by pigeonhole), unlike MinHash LSH.
    Returns (id_a, id_b, hamming)."""
    assert bands > max_hamming, "pigeonhole needs bands > max_hamming"
    chunk = bits // bands
    mask = (1 << chunk) - 1
    # single scan: posexplode one per-row array of chunk values instead
    # of `bands` unioned projections (each union re-ran the upstream
    # signature subplan; the exploded form scans it once per join side
    # and the band shuffle is reused across sides)
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), j * chunk).bitwiseAND(F.lit(mask))
            for j in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(chunks).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["band", "band_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def minhash_band_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band of the
    signature. bands*rows == num_hashes. Scale path: equi-join on the
    band key (shuffle bounded by bucket sizes), never the full n^2.

    Plan shape: ONE posexplode of the per-row band-key array — a single
    scan of the signature relation — instead of `bands` unioned
    projections (which re-executed the whole upstream signature subplan
    once per band per join side: 8x for 4 bands). Both join sides share
    the identical exploded subplan, so the band-key shuffle is built
    once and reused (ReusedExchange)."""
    rows = num_hashes // bands
    assert rows * bands == num_hashes
    keys = F.array(
        *[
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.posexplode(keys).alias("band", "band_key")
    )
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


def _iteration_partitions(n_rows: int, spark) -> int:
    """Partition count for an iterative algorithm's per-round state
    (guide §2: scale-adaptive partitioning, never a config constant).
    ~2M rows per slice keeps partitions comfortably sized; the floor of
    1 collapses bench-scale graphs to single-task rounds, and the cap
    (32 slices per core) only bounds pathological row counts — a 100 TB
    edge set still gets tens of thousands of slices on a real cluster
    because defaultParallelism scales with the executor fleet."""
    cap = max(1, spark.sparkContext.defaultParallelism * 32)
    return max(1, min((int(n_rows) // 2_000_000) + 1, cap))


_CC_LOCAL_EDGES_DEFAULT = 100_000


def _cc_local_edges() -> int:
    """Edge-count threshold under which connected components close as a
    driver-local union-find instead of an iterative distributed tower.
    The default (100k edges — a few MB of driver traffic, the same
    order as the skip-index file-list collects) is deploy-tunable via
    ``SPARK_GRAFT_CC_LOCAL_EDGES``; 0 disables the fast path."""
    return _env_int("SPARK_GRAFT_CC_LOCAL_EDGES", _CC_LOCAL_EDGES_DEFAULT)


def _local_min_labels(rows) -> list | None:
    """Union-find (path-halving) over collected edge rows; returns
    [(id, min member id of its component)] covering every endpoint, or
    None if any endpoint is NULL (caller falls back to the distributed
    lane rather than reproducing NULL-join semantics locally)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        u, v = r[0], r[1]
        if u is None or v is None:
            return None
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    return [(x, comp_min[find(x)]) for x in parent]


def _cc_local_labels(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    local_edges: int | None,
    vertices_only: bool = False,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Driver-local fast path shared by BOTH connected-component
    formulations (r12, guide §2/§3: a size-adaptive strategy switch, the
    same decision class as a broadcast join). A bounded pair set is
    cheaper to close with a union-find on the driver than to iterate
    over with distributed rounds — each round costs 1–2 scheduled jobs
    REGARDLESS of data size, so a small graph pays pure scheduling.

    Returns ``(labels, pinned)``. ``labels`` is None when the graph is
    ineligible (over the threshold, NULL endpoint, or a non-integral/
    non-string id type) and the caller must run its distributed rounds.
    ``pinned`` is a persist() handle this function took on ``pairs``
    (r13, ADVICE r12): for an UN-cached input, an early-exit
    ``limit(T+1)`` probe would still execute the pair plan's shuffle
    map stages and cache nothing it consumes partially — so on the
    large-graph path the (possibly expensive) jaccard/LSH pair plan ran
    roughly twice. Instead the relation is pinned and ONE full count
    fills the cache and decides eligibility; the local collect and the
    distributed lane's edge build both read cached blocks. A caller
    that receives ``labels=None`` with ``pinned`` set must unpersist it
    once its own edge relation is materialized. Already-cached inputs
    (e.g. q53's persisted pairs) keep the cheaper bounded limit-probe.

    Label semantics are identical by construction — label = smallest
    member id of the component; Python's str ordering matches Spark's
    UTF8String binary ordering because UTF-8 is code-point-order
    preserving — pinned by the lane-parity tests and the q53 oracle
    (which exercises this lane at every driver-checked scale factor).
    vertices_only=True restricts the output to ``vertices`` rows (the
    star formulation's vertex left join drops pair endpoints absent
    from `vertices`; the min-label formulation labels them too — each
    entry point passes its own distributed lane's semantics so the
    env-tunable threshold never changes a result, ADVICE r12)."""
    if local_edges is None:
        local_edges = _cc_local_edges()
    if local_edges <= 0:
        return None, None
    a_t = pairs.schema[a_col].dataType
    if a_t != pairs.schema[b_col].dataType or not isinstance(
        a_t, (IntegralType, StringType)
    ):
        return None, None
    pinned = None
    if pairs.is_cached:
        # cached input: the early-exit probe re-reads bounded blocks
        rows = pairs.select(a_col, b_col).limit(local_edges + 1).collect()
        if len(rows) > local_edges:
            return None, None
    else:
        pinned = pairs.persist()
        if pairs.count() > local_edges:
            return None, pinned
        rows = pairs.select(a_col, b_col).collect()
    labeled = _local_min_labels(rows)
    if labeled is None:
        return None, pinned
    labels = pairs.sparkSession.createDataFrame(
        labeled,
        StructType([StructField("id", a_t), StructField("label", a_t)]),
    )
    if vertices_only:
        # star semantics: one broadcast left join over vertices — rows
        # absent from `vertices` are dropped, exactly like the star
        # fixed point's vertex join
        out = (
            vertices.select(F.col(id_col).alias("id"))
            .join(F.broadcast(labels), on="id", how="left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
            .persist()
        )
    else:
        # min-label semantics: singleton attach + labeled participants
        # (including endpoints absent from vertices); persist carries
        # the same ownership contract as the distributed lanes (caller
        # unpersists); the anti-join broadcasts the bounded label
        # relation, so `vertices` stays distributed
        out = (
            vertices.select(F.col(id_col).alias("id"))
            .join(labels, on="id", how="left_anti")
            .select("id", F.col("id").alias("label"))
            .unionByName(labels)
            .persist()
        )
    if pinned is not None:
        pinned.unpersist()
    return out, None


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    local_edges: int | None = None,
) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over an
    undirected pair relation by iterative min-label propagation — the
    step a dedup pipeline needs after pair generation (keep ONE doc per
    cluster, not per pair). Returns (id, label) where label is the
    smallest member id of the component (any orderable id type — min is
    lexicographic for strings); vertices absent from any pair keep
    their own id (singleton clusters).

    Each iteration is one equi-join + one min-aggregation, fully
    distributed; the driver sees only a per-iteration scalar (the exact
    count of labels that changed — no type-dependent checksum).
    Iteration count is the component DIAMETER — small for near-dup
    clusters by construction. For adversarially long chains at 100 TB
    the alternating large-star/small-star formulation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") drops rounds to
    O(log n); this direct form keeps the plan minimal.

    The returned frame is persist()ed (its lineage is the whole
    iteration tower) — ownership transfers to the caller, who should
    unpersist() it when done.

    Round cost (r05 rework): the iteration runs over EDGE-PARTICIPATING
    vertices only — at 100 TB the duplicate graph is a few percent of
    the corpus, so propagating labels for every singleton each round
    wasted the data plane; singletons join the result once at the end.
    And each round is ONE checkpoint job plus a cheap scan: the old
    label rides through the min-aggregation (msgs rows carry NULL old,
    so min(old) ignoring nulls restores it), making the changed-count a
    filter over the freshly checkpointed blocks instead of a join job.

    r12: a bounded pair set (<= `local_edges`, default
    SPARK_GRAFT_CC_LOCAL_EDGES or 100k) closes driver-locally instead —
    see _cc_local_labels; pass local_edges=0 to force the distributed
    min-label rounds."""
    local, pinned = _cc_local_labels(
        pairs, vertices, id_col, a_col, b_col, local_edges
    )
    if local is not None:
        return local
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates()
        .persist()
    )
    # r12 (guide §2): size the ITERATION relations from the measured
    # edge count, not spark.sql.shuffle.partitions — every round
    # materializes a checkpoint whose partition count becomes the task
    # count of every later round's jobs, and a config-sized 64-slice
    # checkpoint of a few-hundred-row label relation made each of the
    # ~2 jobs/round schedule 64 near-empty tasks (measured: the whole
    # tower is round-overhead-bound at bench scale). The count also
    # fills the edge cache the first round would otherwise fill.
    parts = _iteration_partitions(edges.count(), pairs.sparkSession)
    if pinned is not None:
        # the probe's pin served its purpose: the symmetric edge set is
        # materialized, nothing reads `pairs` again
        pinned.unpersist()
    # r12: seed each participant with min(id, min neighbor) — exactly
    # what the first propagation round computes from identity labels,
    # for the same one-exchange price the identity init paid (the
    # symmetric edge set keys every participant as src), so the loop
    # below starts one round further along and singleton-free graphs
    # converge a full round (2 jobs) earlier. Fixed point unchanged.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__mn")).alias("label"),
        )
        .coalesce(parts)
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
        )
        # localCheckpoint, not persist: each round references the prior
        # round's frame several times (union + join), so a lazy lineage
        # would grow EXPONENTIALLY in plan nodes with the round count
        # (persist caches execution but not the logical plan) — the
        # checkpoint resets the plan to a materialized leaf every round
        new_labels = (
            labels.select("id", "label", F.col("label").alias("__old"))
            .unionByName(
                msgs.select(
                    "id", "label", F.lit(None).cast(msgs.schema["label"].dataType).alias("__old")
                )
            )
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
            .coalesce(parts)
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("label") != F.col("__old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter too large — use connected_components_star, "
            "which converges in O(log n) rounds on chain-shaped graphs)"
        )
    # singletons (no pair membership) keep their own id, attached once
    all_labels = (
        vertices.select(F.col(id_col).alias("id"))
        .join(labels, on="id", how="left_anti")
        .select("id", F.col("id").alias("label"))
        .unionByName(labels)
        .persist()
    )
    return all_labels


def connected_components_star(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
    local_edges: int | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rewrites (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the adversarial-diameter escape hatch for the
    min-label-propagation form above: a path graph of n nodes needs
    ~n rounds of label propagation but only O(log n) alternating star
    rounds, because every round POINTS NODES AT THEIR NEIGHBORHOOD MIN,
    halving tree depth instead of walking it.

    Per round, each phase is ONE window-min shuffle over the CURRENT
    edge set (which only shrinks toward star shape — never the
    quadratic blow-up of path doubling), and the driver sees one scalar
    per round (the structural fixed-point probe). Same contract as
    connected_components: returns (id, label), label = smallest member
    id of the component (any orderable id type), singletons keep their
    own id; result is persist()ed, ownership transfers to the caller.

    large-star(u): every neighbor v > u is re-pointed at
    m = min(N(u) ∪ {u}); small-star(u): every neighbor v < u (and u
    itself) is re-pointed at m = min(N(u) ∪ {u}) restricted to the
    smaller-side neighborhood. Both preserve connectivity; the fixed
    point is a star per component centered on its minimum.

    r12: a bounded pair set (<= `local_edges`, default
    SPARK_GRAFT_CC_LOCAL_EDGES or 100k) closes driver-locally instead —
    see _cc_local_labels; pass local_edges=0 to force the star rounds."""
    local, pinned = _cc_local_labels(
        pairs, vertices, id_col, a_col, b_col, local_edges, vertices_only=True
    )
    if local is not None:
        local._cc_rounds = 0  # observability parity with the star lane
        return local

    from pyspark.sql import Window

    # per-u neighborhood minimum via a WINDOW over the partition key
    # instead of groupBy + join-back: one shuffle per phase where the
    # agg+join form paid two (the round is stage-latency bound — at
    # 100 TB both forms shuffle the same edge bytes on the same key,
    # but the window keeps them in one exchange)
    def _large_star(e: DataFrame) -> DataFrame:
        # symmetric neighbor relation
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        w = Window.partitionBy("u")
        with_m = nbrs.select(
            "u", "v", F.least(F.min("v").over(w), F.col("u")).alias("m")
        )
        return (
            with_m.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # key every edge by its LARGER endpoint
        dir_e = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        w = Window.partitionBy("u")
        joined = dir_e.select("u", "v", F.min("v").over(w).alias("m"))
        repointed = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
        self_edge = joined.select("u", F.col("m").alias("v"))
        return (
            repointed.unionByName(self_edge)
            .where(F.col("u") != F.col("v"))
            .dropDuplicates()
        )

    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
        .persist()
    )
    # r12: round-state partition count derived from the edge count (see
    # _iteration_partitions / connected_components) — the count also
    # fills the edge cache before the first star round
    parts = _iteration_partitions(edges.count(), pairs.sparkSession)
    if pinned is not None:
        # probe pin released once the star edge set is materialized
        pinned.unpersist()
    def _is_min_star_forest(e: DataFrame) -> bool:
        """True iff `e` (oriented u > v by construction of the star
        phases) is a fixed point: a forest of stars centered on each
        component's minimum. Equivalent structural test — (a) no node
        appears as both a leaf (u) and a center (v), and (b) every leaf
        has exactly one edge — checked in ONE tiny aggregation job.
        Either violation implies a further round changes the edge set;
        both holding implies every leaf points at its component min
        (all u > v and centers never chain). Detecting the fixed point
        STRUCTURALLY on the fresh round output saves the extra
        confirmation round (and the two exceptAll set-difference jobs
        per round) the old new==old comparison paid (r05)."""
        sides = e.select(
            F.col("u").alias("n"), F.lit(1).alias("us"), F.lit(0).alias("vs")
        ).unionByName(
            e.select(F.col("v").alias("n"), F.lit(0).alias("us"), F.lit(1).alias("vs"))
        )
        bad = (
            sides.groupBy("n")
            .agg(F.sum("us").alias("us"), F.sum("vs").alias("vs"))
            .where(((F.col("us") > 0) & (F.col("vs") > 0)) | (F.col("us") > 1))
            .limit(1)
            .count()
        )
        return bad == 0

    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # localCheckpoint, not persist: one star round references the
        # input edge frame ~16 times (two unions + two groupBy-join
        # pairs), so lazy lineage grows ~16^rounds plan nodes — the
        # checkpoint resets the plan to a materialized leaf every round
        new_edges = (
            _small_star(_large_star(edges)).coalesce(parts)
            .localCheckpoint(eager=True)
        )
        edges.unpersist()
        edges = new_edges
        if _is_min_star_forest(edges):
            converged = True
            break
    if not converged:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixed point: every non-min node has exactly the edge (node, min).
    labels = (
        vertices.select(F.col(id_col).alias("id"))
        .join(
            edges.groupBy("u").agg(F.min("v").alias("__m")),
            on=F.col("id") == F.col("u"),
            how="left",
        )
        .select(
            "id", F.coalesce(F.col("__m"), F.col("id")).alias("label")
        )
        .persist()
    )
    labels.count()
    edges.unpersist()
    labels._cc_rounds = rounds  # observability for tests/benchmarks
    return labels


def contamination_pairs(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    min_containment: float = 0.5,
    max_df: int | None = None,
    normalize: bool = False,
    bloom_bits: int | None = None,
    bloom_k: int = 5,
) -> DataFrame:
    """Benchmark-contamination screen — the train/test overlap check an
    LLM data pipeline runs before training (the published recipe:
    flag a training document that shares long word n-grams with an
    evaluation document; n=8 is the conventional choice). Returns
    (doc_id, eval_id, overlap, eval_sz, containment) for pairs with
    containment = |shared n-grams| / |eval doc's distinct n-grams|
    >= min_containment.

    Shape: both sides explode to distinct (id, shingle) rows and meet
    in an inverted-index EQUI-join on the shingle — never a doc x eval
    cross product; overlap counts partial-aggregate map-side, and the
    eval sizes broadcast (the eval set is benchmark-sized). At 100 TB
    the only large shuffle keys on the shingle; pass max_df to drop
    corpus-universal shingles (boilerplate) before the join, bounding
    every join bucket exactly like the q37 hot-shingle cap — overlap
    then undercounts by at most the pruned shingles while containment
    stays w.r.t. the FULL eval set (conservative: pruning can only
    lower a score, never manufacture contamination).

    Integer overlap / integer eval_sz -> the containment double is
    engine-exact (oracle-verifiable bit-for-bit)."""
    sh_docs = word_shingles(docs, id_col, text_col, n=n, normalize=normalize)
    if max_df is not None:
        sh_docs = prune_hot_shingles(sh_docs, max_df=max_df)
    sh_eval = word_shingles(
        eval_docs, eval_id_col, eval_text_col, n=n, normalize=normalize
    ).select(
        F.col(eval_id_col), "shingle"
    )
    if bloom_bits is not None:
        # map-only pre-filter on the corpus side: a bloom bitset over
        # the eval shingles (NO false negatives -> results unchanged
        # bit-for-bit) drops the vast non-overlapping majority BEFORE
        # the shuffle, at ~10 bits/eval-shingle of broadcast
        bloom = shingle_bloom(sh_eval, m_bits=bloom_bits, k=bloom_k)
        sh_docs = bloom_filter_shingles(sh_docs, bloom, m_bits=bloom_bits, k=bloom_k)
    eval_sz = sh_eval.groupBy(eval_id_col).agg(F.count(F.lit(1)).alias("eval_sz"))
    overlap = (
        sh_docs.join(sh_eval, on="shingle")
        .groupBy(id_col, eval_id_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        overlap.join(F.broadcast(eval_sz), on=eval_id_col)
        .withColumn("containment", F.col("overlap") / F.col("eval_sz"))
        .where(F.col("containment") >= min_containment)
        .select(id_col, eval_id_col, "overlap", "eval_sz", "containment")
    )


def positional_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    normalize: bool = False,
) -> DataFrame:
    """Every length-`n` token window of every document, WITH its token
    position: (id, pos, win_hash) where win_hash = md5 of the window's
    space-joined tokens (full 128-bit hex — corpus-wide window identity
    must not collide, unlike the MinHash lanes' 32-bit base hashes
    whose collisions only perturb a min). One narrow projection builds
    the hash array in codegen; one posexplode emits a row per token
    position — the same volume the shingle lanes already shuffle.

    normalize=True hashes `normalize_text` tokens; positions then index
    the NORMALIZED token stream (cut_spans must be called with the same
    flag so positions and tokens agree)."""
    toks = _token_expr(text_col, normalize)
    hashes = F.transform(
        F.sequence(F.lit(0), F.size(F.col("__t")) - n),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__t"), i + 1, n))),
    )
    return (
        df.where(F.size(toks) >= n)
        .select(F.col(id_col), toks.alias("__t"))
        .select(F.col(id_col), F.posexplode(hashes).alias("pos", "win_hash"))
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    normalize: bool = False,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans, the distributed n-gram-anchored
    form of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    substring of >= n tokens appearing `min_occurrences`+ times in the
    corpus has ALL its length-n windows duplicated, so merging each
    document's overlapping flagged windows recovers the full maximal
    duplicated region — finer-grained than `dedup_paragraphs` (which
    needs the duplicate to BE a paragraph) and keyed on content, not
    layout.

    Keep-one semantics: per duplicated window hash, the occurrence with
    the smallest (id, pos) is the keeper and is never flagged; every
    other occurrence joins a span. Both decisions are window functions
    over a single shuffle on win_hash (count + row_number in one
    Window spec — no join-back); the span merge is one more shuffle on
    the document id (classic interval merge: running max of span end
    over preceding rows -> new-span flag -> prefix-sum span ids).

    Scale: the win_hash shuffle moves one 32-hex-char row per corpus
    token — the same order as the MinHash banding shuffle. A
    boilerplate window duplicated across millions of docs lands in one
    hash partition; its per-key sort is linear and AQE skew-join
    splitting does not apply to windows, so for pathological corpora
    cap df upstream (drop win_hashes above a document-frequency bound
    the way `prune_hot_shingles` does — they would merge into
    full-document spans anyway).

    Returns (id, span_start, span_end, n_windows): token positions
    [span_start, span_end) duplicated, n_windows flagged windows
    merged into the span."""
    from pyspark.sql import Window

    wins = positional_windows(df, id_col, text_col, n=n, normalize=normalize)
    wh = Window.partitionBy("win_hash")
    flagged = (
        wins.select(
            F.col(id_col),
            "pos",
            F.count(F.lit(1)).over(wh).alias("__cnt"),
            F.row_number()
            .over(wh.orderBy(F.col(id_col), F.col("pos")))
            .alias("__rn"),
        )
        .where((F.col("__cnt") >= min_occurrences) & (F.col("__rn") > 1))
        .select(id_col, "pos")
    )
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    prev_end = (
        F.max(F.col("pos") + n)
        .over(wdoc.rowsBetween(Window.unboundedPreceding, -1))
    )
    spans = (
        flagged.withColumn(
            "__new",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
        )
        .withColumn(
            "__span",
            F.sum("__new").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", "n_windows")
    )
    return spans


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """Remove `duplicated_spans` regions from each document's token
    stream. Adds text_dedup (the surviving tokens re-joined with single
    spaces; documents with NO spans keep `text_col` byte-identical —
    whitespace is only normalized where a cut actually happened) and
    tokens_removed. Pass the SAME normalize flag as the span pass:
    positions index that token stream, and under normalize=True the cut
    text is the normalized text (punctuation tokenization differs, so
    raw positions would not line up).

    Pure higher-order functions per row (spans collected to a per-doc
    array — bounded by doc length / n): filter over the indexed token
    array with an exists probe per span. No Python, no UDF; the only
    shuffles are the per-doc collect_list and the left join back."""
    spans_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = _token_expr(text_col, normalize)
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
        ),
    )
    base = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.join(spans_arr, on=id_col, how="left")
        .withColumn(
            "text_dedup",
            F.when(F.col("__spans").isNull(), base).otherwise(
                F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
            ),
        )
        .withColumn(
            "tokens_removed",
            F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
                F.size(toks) - F.size(kept)
            ),
        )
        .drop("__spans")
    )


def shingle_bloom(
    shingles: DataFrame,
    m_bits: int,
    k: int = 5,
    value_col: str = "shingle",
) -> DataFrame:
    """Build a bloom filter over a shingle relation as a ONE-ROW
    DataFrame holding the packed bitset (`bloom` array<long>, densified
    to ceil(m_bits/64) words). k hash functions are xxhash64 with
    literal seed columns — k integer expressions per shingle, all in
    whole-stage codegen; the bitset assembles via explode -> bit_or
    groupBy on the word index (map-side combined: at most W distinct
    keys reach the shuffle regardless of input size).

    Why bloom and not broadcasting the shingles themselves: the bitset
    is ~10 bits per element vs ~100+ bytes per broadcast-joined shingle
    string — the membership side stays broadcastable long after the raw
    relation outgrows the broadcast threshold."""
    n_words = (m_bits + 63) // 64
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(value_col)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    bits = shingles.select(F.explode(probes).alias("__bit")).select(
        (F.col("__bit") / 64).cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("__bit") % 64).cast("int")
        ).alias("__mask"),
    )
    # densify: every word index present even when no bit lands in it,
    # so the packed array's positions line up with element_at probes
    zeros = (
        shingles.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("word_idx"))
        .withColumn("__mask", F.lit(0).cast("long"))
    )
    words = (
        bits.unionByName(zeros)
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )
    return words.agg(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))).alias("__s")
    ).select(F.transform("__s", lambda x: x["word"]).alias("bloom"))


def bloom_filter_shingles(
    shingles: DataFrame,
    bloom: DataFrame,
    m_bits: int,
    k: int = 5,
    value_col: str = "shingle",
) -> DataFrame:
    """Drop shingle rows that are definitely NOT in the bloom filter
    (`shingle_bloom` output). NO false negatives — every true member
    survives — so any exact join downstream returns bit-identical
    results on the filtered relation; false positives only cost the
    join some extra probe rows.

    The one-row bitset joins in via a broadcast nested-loop join of a
    single row (the declared-broadcast idiom): each input row then
    evaluates k element_at/bitwise-AND probes in codegen — no shuffle,
    no Python, no per-row UDF. At 100 TB this runs as a map-only
    pre-filter on the scan, cutting the shuffled shingle volume to the
    (eval-sized) bloom-positive subset."""
    probed = shingles.crossJoin(F.broadcast(bloom))
    checks = [
        (
            F.element_at(
                F.col("bloom"),
                (
                    F.pmod(F.xxhash64(F.lit(i), F.col(value_col)), F.lit(m_bits))
                    / 64
                ).cast("int")
                + 1,
            ).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col(value_col)), F.lit(m_bits)
                        )
                        % 64
                    ).cast("int"),
                )
            )
            != 0
        )
        for i in range(k)
    ]
    keep = checks[0]
    for c in checks[1:]:
        keep = keep & c
    return probed.where(keep).drop("bloom")
