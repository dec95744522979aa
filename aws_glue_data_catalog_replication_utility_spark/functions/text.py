"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (no UDFs — everything stays in whole-stage
codegen and is portable to the DuckDB oracle). The reference's string
surface is only lower/startsWith/concat (SURVEY.md §2A #16-19); these
generalize it to the document plane.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# deterministic per-language stopword lists for the n-gram/stopword
# language heuristic; fixed priority order breaks ties
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "es": ("el", "la", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "et", "un", "est", "que", "les", "des", "du"),
}
LANG_PRIORITY = ("en", "de", "es", "fr")


def _tokens(text: str | Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text))


def regex_token_count(text: str | Column, pattern: str = r"[A-Za-z]+|[0-9]+") -> Column:
    """BPE-ish token count: number of matches of a word/number pattern.

    Kept to a regex subset with identical semantics in Java regex (Spark)
    and RE2 (DuckDB oracle).
    """
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(pattern))


def punct_ratio(text: str | Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    t = F.col(text) if isinstance(text, str) else text
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    return F.when(F.length(t) > 0, punct / F.length(t)).otherwise(F.lit(0.0))


def _stopword_hits(text: str | Column, words: tuple[str, ...]) -> Column:
    toks = _tokens(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def stopword_ratio(text: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = _tokens(text)
    return _stopword_hits(text, STOPWORDS[lang]) / F.size(toks)


def quality_score(text: str | Column, rounded: bool = True) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs with
    some stopword mass and low punctuation density. Deterministic double
    arithmetic. Pass rounded=False for hash-checked outputs (round()
    implementations can differ across engines; the raw double fold is
    bit-exact)."""
    t = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(t).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_ratio(t, "en")
    sw_score = F.least(sw * F.lit(5.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(t) * F.lit(10.0), F.lit(1.0))
    raw = F.lit(0.5) * len_score + F.lit(0.5) * sw_score - F.lit(0.25) * punct_pen
    return F.round(raw, 6) if rounded else raw


def lang_guess(text: str | Column) -> Column:
    """Stopword-vote language ID: argmax of per-language stopword hits
    with fixed priority tie-break; 'und' (undetermined) when no list
    scores > 0."""
    scores = {lg: _stopword_hits(text, STOPWORDS[lg]) for lg in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build when-chain in reverse priority so earlier langs win ties
    for lg in reversed(LANG_PRIORITY):
        expr = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def fingerprint(text: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the casefolded,
    whitespace-collapsed text. Identical duplicates collide; both Spark
    and DuckDB compute the same hex digest."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))


def redact(
    text: str | Column,
    pattern: str,
    replacement: str = "[MASKED]",
) -> Column:
    """Replace every match of `pattern` (PII scrubbing shape: emails,
    phone numbers, sensitive vocabulary). Pure column expression —
    regexp_replace in whole-stage codegen. Keep patterns to the
    Java-regex/RE2 common subset so the DuckDB oracle (regexp_replace
    with the 'g' flag) computes the identical result."""
    return F.regexp_replace(
        F.col(text) if isinstance(text, str) else text, pattern, replacement
    )


def redaction_count(text: str | Column, pattern: str) -> Column:
    """How many spans `redact` would mask (the audit counter a scrubbing
    pipeline reports per batch)."""
    return F.regexp_count(
        F.col(text) if isinstance(text, str) else text, F.lit(pattern)
    )


def distinctive_terms(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 3
):
    """The k most DISTINCTIVE terms of each document: its distinct tokens
    ranked by corpus document frequency ascending (rarest first, term as
    the total tie-break). The IDF idea with integer-only outputs — no
    transcendental functions, so the DuckDB oracle matches hash-exactly.

    Plan: explode distinct tokens -> df aggregation on the token key
    (shuffle bounded by VOCABULARY size, not corpus size) -> join back
    (vocabulary is corpus-small: broadcast or sort-merge, Catalyst
    picks) -> per-document window top-k. Returns (id, term, df, rank).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("term"),
    )
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "term")
    return (
        toks.join(dfreq, on="term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "df", "rank")
    )


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
):
    """Split documents into overlapping token-window chunks (the passage
    shape retrieval and pretraining pipelines feed downstream): chunk i
    covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may run short; a doc
    shorter than one window yields exactly one chunk.

    Pure column algebra — tokenize once, posexplode a chunk-index
    sequence, slice per chunk. No shuffle: parallelism follows input
    splits (wrap the source with ensure_min_parallelism for
    degenerate-split inputs). All index math is exact-integer (modulo
    trick instead of float division) so the DuckDB oracle reproduces
    chunk boundaries bit-exactly. Returns (id, chunk_idx, chunk_len,
    chunk_md5), the md5 fingerprinting the chunk's space-joined tokens.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    base = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    # ceil((sz - overlap) / stride) as exact integers: subtract the
    # remainder before dividing, so the division is an exact multiple
    num = F.size("__toks") - overlap + (stride - 1)
    n_chunks = F.greatest(
        ((num - num % stride) / stride).cast("int"), F.lit(1)
    )
    exploded = base.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    length = F.least(F.lit(chunk_tokens), F.size("__toks") - start)
    chunk = F.slice("__toks", start + 1, length)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(chunk).alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def dedup_paragraphs(
    docs,
    max_df: int = 1,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hot_broadcast: int | None = 2_000_000,
):
    """Corpus-level paragraph deduplication — the RefinedWeb/FineWeb
    cleaning step: a paragraph (text split on `sep`, a Java-regex
    pattern — the default '\\n' is literal) whose EXACT content
    appears in more than `max_df` distinct documents is boilerplate
    (nav bars, cookie banners, license footers) and is removed from
    every document; each document is reassembled from its surviving
    paragraphs in original order. Returns (id, text, n_paragraphs,
    n_removed) — documents whose paragraphs all vanish keep a row with
    empty text, so the output is row-for-row with the input.

    Shape at 100 TB: posexplode paragraphs -> per-document distinct ->
    one map-side-combined groupBy on the paragraph hash counts document
    frequency (never a self-join); the hot-hash set (df > max_df) is
    the SMALL side — boilerplate is by definition few distinct strings
    — so the anti join broadcasts; reassembly is one groupBy(doc) with
    an array_sort over (pos, paragraph) structs, deterministic in any
    row order. All hashing is md5 (engine-portable; the pytest pins a
    DuckDB twin bit-for-bit).

    The broadcast assumption is BOUNDED (VERDICT r05 #6): max_df is
    caller-settable, and on a pathological corpus the df > max_df set
    need not be small. With `max_hot_broadcast` set (the default), one
    limit-bounded scalar job counts the hot set up front and, above
    the bound, the anti join falls back to a shuffled join instead of
    broadcasting an unbounded relation — same rows either way. Pass
    None to skip the guard job (and keep the function fully lazy) when
    the caller owns the boilerplate-is-small contract. NULL text reads
    as empty text, so the row-for-row output contract holds for NULL
    docs too (ADVICE r05)."""
    from pyspark.sql import DataFrame  # noqa: F401  (signature clarity)

    base = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("pos", "para"),
    ).withColumn("__h", F.md5(F.col("para")))
    dfreq = (
        base.select(id_col, "__h")
        .dropDuplicates([id_col, "__h"])
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    hot = dfreq.where(F.col("__df") > max_df).select("__h")
    if max_hot_broadcast is not None:
        hot_small = (
            hot.limit(max_hot_broadcast + 1).count() <= max_hot_broadcast
        )
    else:
        hot_small = True
    kept = base.join(
        F.broadcast(hot) if hot_small else hot, on="__h", how="left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = base.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paragraphs"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("__text", F.lit("")).alias(text_col),
            "n_paragraphs",
            (F.col("n_paragraphs") - F.coalesce("__n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def repetition_stats(
    text: str | Column, sep: str = "\n", n: int = 2
) -> Column:
    """Gopher-style intra-document repetition signals as ONE struct
    column (pure expressions, whole-stage codegen, no explode):

    - n_lines / dup_line_frac: fraction of `sep`-separated lines that
      are repeats of an earlier line (0.0 when <= 1 line);
    - top_ngram_frac: the share of the document's word n-grams taken by
      its single most frequent n-gram (1.0 for a fully-looping doc,
      ~1/count for diverse text; 0.0 when no n-gram fits).

    The published Gopher rules threshold these (e.g. drop docs whose
    top 2-gram exceeds 20%); thresholds stay with the caller. The mode
    computation is O(distinct x total) per row — bounded by document
    length, the standard per-row budget of this module's expressions.
    Token n-grams use the same split/slice construction as the dedup
    lane's shingle_array (functions/dedup.py) so the two surfaces agree
    on tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, sep)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines <= 1, F.lit(0.0)
    ).otherwise(
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    )
    toks = F.split(F.trim(c), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))
    top = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda v: F.size(F.filter(grams, lambda x: x == v)),
        )
    )
    top_frac = F.when(
        F.size(grams) > 0, top / F.size(grams)
    ).otherwise(F.lit(0.0))
    return F.struct(
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        top_frac.alias("top_ngram_frac"),
    )


# published-recipe default thresholds (Gopher/C4-family); callers tune
FILTER_DEFAULTS = {
    "min_tokens": 5,
    "max_punct_ratio": 0.3,
    "min_stopword_ratio": 0.02,
    "max_top_2gram_frac": 0.20,
    "max_dup_line_frac": 0.30,
}


def quality_filter_verdict(
    text: str | Column, thresholds: dict | None = None
) -> Column:
    """The composed keep/drop gate an LLM cleaning pipeline actually
    runs: evaluates the published rule family (minimum length,
    punctuation density, stopword floor, Gopher repetition caps) over
    one document column and returns a struct (keep boolean, reasons
    array<string>) — reasons name every violated rule, empty when the
    document passes, so downstream audits can histogram WHY the corpus
    shrank (the same failure-audit discipline as the import plane).

    One narrow projection per document — every signal is a pure column
    expression (token_count / punct_ratio / stopword_ratio /
    repetition_stats), no UDF, no shuffle; the verdict composes in
    whole-stage codegen. Threshold dict overrides individual defaults
    (FILTER_DEFAULTS)."""
    t = dict(FILTER_DEFAULTS, **(thresholds or {}))
    rep = repetition_stats(text)
    checks = [
        (token_count(text) < t["min_tokens"], "too_few_tokens"),
        (punct_ratio(text) > t["max_punct_ratio"], "punct_ratio"),
        (stopword_ratio(text) < t["min_stopword_ratio"], "stopword_ratio"),
        (rep["top_ngram_frac"] > t["max_top_2gram_frac"], "top_2gram_frac"),
        (rep["dup_line_frac"] > t["max_dup_line_frac"], "dup_line_frac"),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for cond, name in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return F.struct(
        (F.size(reasons) == 0).alias("keep"), reasons.alias("reasons")
    )


def unigram_logprob(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
):
    """Corpus-statistics quality scoring — the KenLM-perplexity-filter
    slot of an LLM data pipeline, with the LM reduced to the corpus's
    own unigram distribution (no external model exists in this
    environment, and the plan shape is identical for any order-n model
    whose table joins on the token key): per document,

        logprob_sum = sum over tokens of ln(term_total / corpus_total)
        avg_logprob = logprob_sum / n_tokens

    where term_total counts the term's occurrences corpus-wide. Terms
    whose term_total < min_df score as out-of-vocabulary at
    ln(1 / corpus_total) and are counted in n_oov. Gibberish scores low
    (rare terms), boilerplate scores high — threshold avg_logprob to
    filter, exactly like a perplexity cut.

    Plan at 100 TB: explode tokens -> per-(doc, term) counts (map-side
    combine) -> term-total aggregation shuffles on the VOCABULARY key,
    not the corpus -> join back on term (vocab-bounded) -> one per-doc
    aggregation. corpus_total rides a broadcast one-row relation, never
    a driver collect. Integer columns (n_tokens, n_oov) are engine-
    exact; the log columns are IEEE doubles whose cross-engine parity
    is tolerance-checked in pytest (ln ulps and sum order differ by
    engine — same reason distinctive_terms stays integer-only for its
    hash-checked lane).

    Returns (id, n_tokens, n_oov, logprob_sum, avg_logprob)."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("term_total"))
    total = toks.agg(F.sum(F.lit(1)).alias("corpus_total"))
    known = F.col("term_total").isNotNull() & (
        F.col("term_total") >= F.lit(min_df)
    )
    scored = (
        tc.join(vocab.where(F.col("term_total") >= min_df), on="term", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "c",
            known.alias("__known"),
            (
                F.col("c").cast("double")
                * (
                    F.log(
                        F.when(known, F.col("term_total")).otherwise(F.lit(1))
                        .cast("double")
                    )
                    - F.log(F.col("corpus_total").cast("double"))
                )
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(~F.col("__known"), F.col("c")).otherwise(F.lit(0))).alias(
            "n_oov"
        ),
        F.sum("__lp").alias("logprob_sum"),
        (F.sum("__lp") / F.sum("c")).alias("avg_logprob"),
    )


def lm_buckets(
    df,
    buckets: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
):
    """CCNet-style perplexity bucketing: score every document with the
    corpus unigram LM (`unigram_logprob`) and split the corpus into
    quality tiers by exact score quantiles — the head/middle/tail
    partition CCNet feeds to different training budgets (head = most
    fluent, sampled hardest; tail = kept for diversity or dropped).

    `buckets` maps name -> integer percent, ORDERED WORST TO BEST
    (ascending avg_logprob; default tail/middle/head thirds). Cutoffs
    are Spark's exact `percentile` (linear interpolation — matches
    DuckDB quantile_cont up to float tolerance, pinned in tests); a doc
    lands in the first bucket whose cutoff its score does not exceed,
    so the assignment is monotone in the score by construction and
    deterministic for every doc (boundary docs go to the worse tier).

    Plan at 100 TB: the scorer's own shuffles (vocab-keyed), then ONE
    exact-percentile aggregation over (docs x 1 double) and a one-row
    broadcast join back — no sort of the corpus, no window over a
    global order. Returns `unigram_logprob`'s columns + `lm_bucket`."""
    if buckets is None:
        buckets = {"tail": 34, "middle": 33, "head": 33}
    total = sum(buckets.values())
    if total != 100:
        raise ValueError(f"bucket percents must sum to 100, got {total}")
    if any(v <= 0 for v in buckets.values()):
        raise ValueError("bucket percents must be positive")
    names = list(buckets)
    scored = unigram_logprob(df, id_col=id_col, text_col=text_col, min_df=min_df)
    fracs, cum = [], 0
    for name in names[:-1]:
        cum += buckets[name]
        fracs.append(cum / 100.0)
    if not fracs:  # single bucket: no cutoffs needed
        return scored.withColumn("lm_bucket", F.lit(names[0]))
    cuts = scored.agg(
        F.percentile(
            F.col("avg_logprob"), F.array(*[F.lit(f) for f in fracs])
        ).alias("__cuts")
    )
    assign = None
    for i, name in enumerate(names[:-1]):
        cond = F.col("avg_logprob") <= F.element_at(F.col("__cuts"), i + 1)
        assign = F.when(cond, name) if assign is None else assign.when(cond, name)
    assign = assign.otherwise(names[-1])
    return scored.crossJoin(F.broadcast(cuts)).withColumn(
        "lm_bucket", assign
    ).drop("__cuts")
