"""Scalar / document-level function library.

JVM-side column expressions wherever possible (whole-stage codegen);
Pandas UDFs only where arrays of bytes must cross into Python
(multimodal decode, BLAS cosine lane). Every hash-checked function here
is deterministic so the DuckDB oracle can replicate it.
"""

from .text import (
    dedup_paragraphs,
    unigram_logprob,
    redact,
    repetition_stats,
    quality_filter_verdict,
    FILTER_DEFAULTS,
    redaction_count,
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
    contamination_pairs,
    ensure_min_parallelism,
    exact_dedup,
    normalize_text,
    shingle_array,
    word_shingles,
    jaccard_pairs,
    minhash_signature,
    minhash_signature_arrays,
    minhash_band_pairs,
    prune_hot_shingles,
    simhash,
    simhash_pairs,
)
from .similarity import (
    cosine_topk,
    cosine_topk_pandas,
    cosine_pairs,
    sign_lsh_candidates,
    semantic_dedup,
    ivf_assignments,
    dot_udf_available,
)
from .layout import (
    zorder_bucket,
    zorder_layout,
    zorder_value,
)
from .sampling import (
    cap_per_group,
    hash_bucket,
    pack_sequences,
    stratified_sample,
)
from .multimodal import attach_blob, blob_features, decode_image

__all__ = [
    "cap_per_group",
    "hash_bucket",
    "pack_sequences",
    "stratified_sample",
    "redact",
    "redaction_count",
    "token_count",
    "regex_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "STOPWORDS",
    "ensure_min_parallelism",
    "exact_dedup",
    "contamination_pairs",
    "dedup_paragraphs",
    "repetition_stats",
    "quality_filter_verdict",
    "unigram_logprob",
    "FILTER_DEFAULTS",
    "normalize_text",
    "shingle_array",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signature",
    "minhash_signature_arrays",
    "minhash_band_pairs",
    "prune_hot_shingles",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "cosine_topk_pandas",
    "cosine_pairs",
    "sign_lsh_candidates",
    "semantic_dedup",
    "ivf_assignments",
    "zorder_bucket",
    "zorder_layout",
    "zorder_value",
    "dot_udf_available",
    "attach_blob",
    "blob_features",
    "decode_image",
]
