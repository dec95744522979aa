"""Scalar / document-level function library.

JVM-side column expressions wherever possible (whole-stage codegen);
Pandas UDFs only where arrays of bytes must cross into Python
(multimodal decode). Every function here is deterministic so the
DuckDB oracle can replicate it.
"""

from .text import (
    token_count,
    regex_token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    lang_guess,
    fingerprint,
    STOPWORDS,
)
from .dedup import (
    exact_dedup,
    word_shingles,
    jaccard_pairs,
    minhash_signature,
)
from .similarity import cosine_topk, dot_udf_available

__all__ = [
    "token_count",
    "regex_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "STOPWORDS",
    "exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signature",
    "cosine_topk",
    "dot_udf_available",
]
