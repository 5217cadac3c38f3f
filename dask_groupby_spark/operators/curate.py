"""End-to-end training-data curation: the composition the individual
operators exist for.  One declarative lineage — quality gate → exact dedup
→ per-language balanced sampling — that Catalyst collapses into a handful
of stages; nothing is materialized between steps.

Plan shape at 100 TB: the quality features and digest are map-side
projections fused into the scan; dedup is one shuffle on the digest
(keeping the minimum id per content); sampling is one shuffle on the
language key.  Two shuffles total for the whole pipeline, each carrying
only surviving rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hasher
from .text import add_text_features


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_tokens: int = 3,
    max_punct_ratio: float = 0.3,
    per_lang: int | None = None,
    seed: str = "curate",
    hasher: str = "fast",
) -> DataFrame:
    """Curation pipeline: (1) quality gate on token count and punctuation
    ratio, (2) exact dedup keeping the smallest id per distinct text,
    (3) optional per-language balanced downsampling to ``per_lang`` docs
    (seeded hash order — deterministic and engine-reproducible with
    ``hasher="portable"``).

    Returns the surviving rows of ``df`` plus the computed quality columns.
    """
    feats = add_text_features(df, text_col=text_col)
    gated = feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    # exact dedup: keep the minimum id per content digest
    w_dup = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    deduped = (
        gated.withColumn("__dup_rn", F.row_number().over(w_dup))
        .where(F.col("__dup_rn") == 1)
        .drop("__dup_rn")
    )
    if per_lang is None:
        return deduped
    h = _hasher(hasher)(F.col(id_col).cast("string"), seed)
    w_s = Window.partitionBy(lang_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        deduped.withColumn("__s_rn", F.row_number().over(w_s))
        .where(F.col("__s_rn") <= per_lang)
        .drop("__s_rn")
    )
