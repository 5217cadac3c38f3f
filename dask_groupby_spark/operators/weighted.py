"""Weighted grouped reductions — training-mix arithmetic (sampling weights,
token-weighted averages).  No flox counterpart (single-value-column model);
here a weighted reduction is just two fused aggregates in one hash table,
so it costs exactly one shuffle like any other reduction.

Missing-value rule: a row contributes only if BOTH value and weight are
valid (non-NULL, non-NaN) — the nan* convention applied pairwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _valid(df: DataFrame, col: str) -> Column:
    c = F.col(col)
    ok = c.isNotNull()
    if isinstance(df.schema[col].dataType, (T.FloatType, T.DoubleType)):
        ok = ok & ~F.isnan(c)
    return ok


def groupby_weighted(
    df: DataFrame,
    *by: str,
    value: str,
    weight: str,
    funcs: tuple = ("wmean",),
    sort: bool = True,
) -> DataFrame:
    """Weighted reductions per group.  ``funcs`` ⊆ {wsum, wmean, wvar}:

    - ``wsum``  = Σ wᵢ·xᵢ
    - ``wmean`` = Σ wᵢ·xᵢ / Σ wᵢ  (NaN when total weight is 0/empty)
    - ``wvar``  = Σ wᵢ·xᵢ² / Σ wᵢ − wmean²  (population, frequency weights)

    All requested funcs share one ``agg()`` → one shuffle.
    """
    ok = _valid(df, value) & _valid(df, weight)
    x = F.when(ok, F.col(value).cast("double"))
    w = F.when(ok, F.col(weight).cast("double"))
    wsum_x = F.sum(w * x)
    wsum = F.sum(w)
    aggs = []
    for f in funcs:
        if f == "wsum":
            aggs.append(F.coalesce(wsum_x, F.lit(0.0)).alias("wsum"))
        elif f == "wmean":
            aggs.append((wsum_x / wsum).alias("wmean"))
        elif f == "wvar":
            aggs.append(
                (F.sum(w * x * x) / wsum - (wsum_x / wsum) * (wsum_x / wsum)).alias(
                    "wvar"
                )
            )
        else:
            raise ValueError(f"unknown weighted func {f!r}")
    out = df.groupBy(*by).agg(*aggs)
    return out.orderBy(*by) if sort else out


def top_terms(
    df: DataFrame,
    *by: str,
    text_col: str = "text",
    k: int = 5,
    min_len: int = 1,
) -> DataFrame:
    """Top-k most frequent tokens per group (corpus inspection / vocabulary
    drift).  explode → count (one shuffle, map-side combine) → per-group
    top-k window; ties break alphabetically for determinism.
    Output: (*by, term, n, rank).
    """
    from .text import tokens

    tok = df.select(
        *by, F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.length("term") >= min_len)
    counts = tok.groupBy(*by, "term").agg(F.count(F.lit(1)).alias("n"))
    from .selection import grouped_topk

    ranked = grouped_topk(
        counts, *by, order_col="n", k=k, descending=True, tiebreak="term"
    )
    return ranked.select(*by, "term", "n", F.col("rank"))
