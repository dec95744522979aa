"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The tokenizer-training slot of an LLM data pipeline: learn a byte-pair
-encoding merge table FROM the corpus, then tokenize with it. The key
scale observation (same one SentencePiece exploits) is that BPE trains
on the WORD-FREQUENCY relation, not the corpus: 100 TB of text folds
into ~10^7 distinct words in one map-side-combined aggregation, and
every merge round after that is a small distributed job over that
bounded relation. What stays distributed here (vs the single-node
trainers) is exactly that fold and the per-round pair counting — the
corpus itself is touched ONCE.

- `train_bpe(df, n_merges)`: word counts (one shuffle on the word
  key), symbol arrays = characters + an end-of-word marker, then per
  round: explode adjacent pairs (weighted by word count) -> one
  groupBy(pair) sum -> argmax with a DETERMINISTIC tie-break (count
  desc, pair lexicographic) -> apply the merge as a pure left-fold
  expression (`aggregate`) over every word's symbols. The fold IS the
  classic greedy non-overlapping left-to-right replacement: a merged
  symbol is a new token, so ("a","a") over "aaa" yields ["aa","a"] —
  pinned against the Python reference in tests. `localCheckpoint`
  per round keeps the plan constant across hundreds of rounds.
- `bpe_encode(df, merges)`: tokenize with the learned table. Encoding
  is inherently sequential per word (each merge depends on the last),
  so this is a DECLARED Arrow lane (`mapInPandas`, rank-table BPE),
  not an expression tower of n_merges nested transforms; the batch
  shape is documents in, token arrays + counts out, linear scale-out.

Driver state is O(1) per round (the argmax row) plus the O(n_merges)
merge table — never words, never rows.

Reference tie-in: the reference precomputes per-table schema maps
once and reuses them per message (GlueUtil.java table batches); same
train-once-apply-everywhere split here, with the merge table as the
schema."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

EOW = "▁"  # end-of-word marker (SentencePiece's block char)

_BPE_LOCAL_WORDS_DEFAULT = 4096


def _bpe_local_words() -> int:
    """Distinct-word threshold under which the MERGE LOOP runs on the
    driver over the collected word-frequency relation (the corpus fold
    always stays distributed — that is the data-scaling part). This is
    the split every production BPE trainer makes (SentencePiece /
    HuggingFace hold the word table in memory); the distributed rounds
    remain the lane for vocabularies that do not fit. Deploy-tunable
    via ``SPARK_GRAFT_BPE_LOCAL_WORDS``; 0 disables the fast path."""
    from .dedup import _env_int

    return _env_int("SPARK_GRAFT_BPE_LOCAL_WORDS", _BPE_LOCAL_WORDS_DEFAULT)


def _local_merge_rounds(
    rows, n_merges: int, min_pair_count: int
) -> list[list[str]]:
    """Driver-local merge rounds over a bounded collected (n, syms)
    word relation — the same greedy argmax, the same deterministic
    tie-break (count desc, pair lexicographic: Python tuple/str order
    equals Spark's, UTF-8 preserves code-point order), and the same
    greedy non-overlapping left-to-right fold as the distributed
    rounds, so the learned table is identical by construction (pinned
    by the lane-parity test and the pure-Python reference suite)."""
    words = [[r[0], list(r[1])] for r in rows]
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pc: dict = {}
        for n, s in words:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append([a, b])
        ab = a + b
        for t in words:
            s = t[1]
            out: list[str] = []
            for x in s:
                # same acc-tail rule as _merge_fold: the merged token
                # is a NEW symbol and never re-merges this round
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            t[1] = out
    return merges


def _merge_fold(col: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b as a
    pure expression: fold symbols, replacing acc's tail when it is
    `a` and the next symbol is `b`. The merged token is a NEW symbol,
    so it never re-merges with the following element in this round —
    exactly the reference algorithm's non-overlapping semantics."""
    merged = F.lit(a + b)
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, syms): whitespace-token frequencies with each word as
    a character array ending in the EOW-marked final char."""
    from .dedup import _token_expr

    toks = F.filter(_token_expr(text_col, False), lambda t: t != F.lit(""))
    words = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select(
        "word",
        "n",
        F.concat(
            F.slice(chars, 1, F.greatest(F.length("word") - 1, F.lit(0))),
            F.array(F.concat(F.col("word").substr(F.length("word"), F.lit(1)), F.lit(EOW))),
        ).alias("syms"),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    local_words: int | None = None,
) -> dict:
    """Learn `n_merges` BPE merges from the corpus. Returns a JSON-safe
    {"merges": [[a, b], ...], "eow": EOW} — merge i was the most
    frequent adjacent symbol pair at round i (ties: lexicographic on
    the pair, so training is deterministic). Stops early when no pair
    reaches `min_pair_count` (merging singletons is memorization).

    One corpus-wide shuffle total; each round is a pair-count agg over
    the word relation + one argmax row to the driver.

    r12: when the DISTINCT-WORD count is bounded (<= `local_words`,
    default SPARK_GRAFT_BPE_LOCAL_WORDS or 4096), the merge rounds run
    on the driver over the collected word relation instead — each
    distributed round costs a scheduled job regardless of vocabulary
    size, so a bounded vocabulary paid pure scheduling. The corpus fold
    (the data-scaling part) stays distributed either way; pass
    local_words=0 to force the distributed rounds."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    from .dedup import _iteration_partitions

    syms = _word_symbols(df, text_col).localCheckpoint()
    n_words = syms.count()
    if local_words is None:
        local_words = _bpe_local_words()
    if 0 < n_words <= local_words:
        rows = syms.select("n", "syms").collect()
        return {
            "merges": _local_merge_rounds(rows, n_merges, min_pair_count),
            "eow": EOW,
        }
    # r12 (guide §2): the per-round relation is the WORD table (~10^7
    # rows at 100 TB, a few thousand locally) — size its partitioning
    # from the measured count instead of spark.sql.shuffle.partitions,
    # so each round's jobs schedule tasks proportional to the data
    # (the count reads the just-materialized checkpoint blocks)
    syms = syms.coalesce(_iteration_partitions(n_words, df.sparkSession))
    merges: list[list[str]] = []
    # checkpoint every K rounds, not every round: the fold lineage is
    # LINEAR (each round adds one projection over the previous), so a
    # bounded chain of <= K folds re-executes cheaply inside the next
    # rounds' pair-count jobs, while each skipped checkpoint saves a
    # whole materialization job. K=4 keeps the analyzed plan shallow
    # at hundreds of rounds and halves-to-quarters the round job count.
    _CHECKPOINT_EVERY = 4
    pending = 0
    for _ in range(n_merges):
        # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — a
        # single-symbol word (fully merged) must yield no pairs, hence
        # the explicit guard
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = syms.select(
            "n",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append([a, b])
        syms = syms.select(
            "word", "n", _merge_fold(F.col("syms"), a, b).alias("syms")
        )
        pending += 1
        if pending >= _CHECKPOINT_EVERY:
            syms = syms.localCheckpoint()
            pending = 0
    return {"merges": merges, "eow": EOW}


def bpe_encode(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a trained merge table: (id_col, bpe_tokens
    array<string>, bpe_token_count). Rank-table BPE per word inside an
    Arrow batch (encoding is sequential per word by nature — the
    declared-Python-lane exception, batched, never per-row UDF)."""
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    eow = model.get("eow", EOW)
    schema = f"{id_col} long, bpe_tokens array<string>, bpe_token_count int"

    def encode(batches):
        import pandas as pd

        def enc_word(word: str, cache: dict) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word[:-1]) + [word[-1] + eow]
            while len(syms) > 1:
                cand = [
                    (ranks.get((syms[i], syms[i + 1])), i)
                    for i in range(len(syms) - 1)
                ]
                cand = [(r, i) for r, i in cand if r is not None]
                if not cand:
                    break
                r, _ = min(cand)
                out, i = [], 0
                a, b = model["merges"][r]
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        for pdf in batches:
            cache: dict = {}
            toks_col, counts = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").split():
                    toks.extend(enc_word(w, cache))
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_col,
                    "bpe_token_count": counts,
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema)
