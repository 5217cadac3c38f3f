"""LLM-data-pipeline operators beyond the reference's surface (BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
column plumbing.  All operators are DataFrame→DataFrame, declarative where
possible, and designed for 100 TB inputs (shuffle-on-key, broadcast small
sides, no driver-side loops).
"""

from .dedup import (
    dedup_paragraphs,
    duplicate_clusters,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_index_probe,
    minhash_index_write,
    minhash_signatures,
    near_deduplicate,
    near_duplicates_against_index,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import (
    PCAModel,
    cosine_topk,
    dequantize_embeddings,
    embedding_near_duplicates,
    embedding_pca,
    kmeans_assign,
    kmeans_fit,
    pca_project,
    quantize_embeddings,
    semantic_deduplicate,
)
from .bpe import bpe_encode, bpe_train
from .curate import PII_PATTERNS, redact_pii, shuffle_rows
from .graph import connected_components, hits, pagerank
from .profile import table_profile
from .selection import key_skew_stats
from .joins import (
    bloom_bits_table,
    bloom_prefilter,
    bloom_semi_join,
    interval_overlap_join,
    salted_join,
)
from .stats import (
    calibration_bins,
    flag_outliers,
    grouped_auc,
    grouped_bivariate,
    grouped_chisq,
    grouped_ks,
    grouped_mad,
    grouped_spearman,
    grouped_ttest,
    population_stability,
    quantile_normalize,
)
from .sketches import (
    cms_estimate,
    cms_sketch_table,
    hist_quantile,
    hist_sketch_table,
    ks_from_histograms,
    psi_from_histograms,
)
from .text import (
    add_text_features,
    bpe_token_estimate,
    document_fingerprint,
    hash_classifier_score,
    language_id,
    lm_quality_score,
    ngram_counts,
    tokens,
)
from .validate import check_referential, check_rules, check_unique, table_diff
from .vocab import build_vocab, encode_tokens, encode_tokens_flat

__all__ = [
    "dedup_paragraphs",
    "duplicate_clusters",
    "exact_duplicates",
    "minhash_signatures",
    "minhash_index_write",
    "minhash_index_probe",
    "near_deduplicate",
    "near_duplicates_against_index",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "PCAModel",
    "cosine_topk",
    "embedding_near_duplicates",
    "embedding_pca",
    "pca_project",
    "kmeans_fit",
    "kmeans_assign",
    "quantize_embeddings",
    "dequantize_embeddings",
    "semantic_deduplicate",
    "add_text_features",
    "bpe_token_estimate",
    "document_fingerprint",
    "hash_classifier_score",
    "language_id",
    "lm_quality_score",
    "ngram_counts",
    "tokens",
    "PII_PATTERNS",
    "redact_pii",
    "shuffle_rows",
    "bpe_train",
    "bpe_encode",
    "salted_join",
    "bloom_bits_table",
    "bloom_prefilter",
    "bloom_semi_join",
    "interval_overlap_join",
    "calibration_bins",
    "flag_outliers",
    "grouped_auc",
    "grouped_bivariate",
    "grouped_chisq",
    "grouped_ks",
    "grouped_mad",
    "grouped_spearman",
    "grouped_ttest",
    "population_stability",
    "quantile_normalize",
    "key_skew_stats",
    "table_profile",
    "pagerank",
    "connected_components",
    "hits",
    "cms_sketch_table",
    "cms_estimate",
    "hist_sketch_table",
    "hist_quantile",
    "psi_from_histograms",
    "ks_from_histograms",
    "build_vocab",
    "encode_tokens",
    "encode_tokens_flat",
    "check_rules",
    "check_unique",
    "check_referential",
    "table_diff",
]
