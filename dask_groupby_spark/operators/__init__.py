"""LLM-data-pipeline operators beyond the reference's surface (BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
column plumbing.  All operators are DataFrame→DataFrame, declarative where
possible, and designed for 100 TB inputs (shuffle-on-key, broadcast small
sides, no driver-side loops).
"""

from .dedup import (
    exact_duplicates,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk, embedding_near_duplicates
from .text import (
    add_text_features,
    document_fingerprint,
    language_id,
    tokens,
)

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "embedding_near_duplicates",
    "add_text_features",
    "document_fingerprint",
    "language_id",
    "tokens",
]
