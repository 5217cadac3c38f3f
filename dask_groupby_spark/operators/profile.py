"""One-pass table profiling — the data-card / ``ANALYZE TABLE`` analog:
per-column row counts, null counts, distinct counts, and min/max in a
SINGLE fused aggregate over one scan, reshaped to long form without any
driver-side collect.

No flox counterpart (SURVEY.md §2.4): Spark-native surface in the same
family as ``groupby_describe`` (which profiles VALUES per group; this
profiles COLUMNS per table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: ``(column, n_nonnull, n_distinct, min, max)``
    — one row per profiled column, min/max rendered as strings (they mix
    types across columns).

    ONE aggregate over ONE scan computes every statistic (4·|columns|
    aggregate expressions share the scan and the single map-combined
    reduction); the wide 1-row result is reshaped to long form with a
    ``stack`` projection — no collect, no per-column rescans, which is
    what makes this viable on a 100 TB table where |columns| separate
    ``SELECT count(distinct c)`` passes would each rescan everything.

    ``exact_distinct=False`` (default) uses HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — the scale
    path: exact distinct counts expand the aggregate per column and
    shuffle distinct values.  Flip it on for small tables or oracle
    checking.  Array/map/struct columns are profiled for counts but
    min/max render NULL (no total order).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    for c in cols:
        # names are interpolated into the generated stack() SQL — the
        # same guard as validate.check_rules (quotes/backticks/backslash
        # would break out of or mangle the expression); raise clearly
        # instead of a ParseException mid-profile
        if any(ch in c for ch in ("'", "`", "\\")):
            raise ValueError(
                f"column name not profilable (quotes/backticks/backslashes): {c!r}"
            )
    complex_types = {"array", "map", "struct"}
    aggs = []
    for c in cols:
        kind = dict(df.dtypes)[c].split("<")[0]
        is_complex = kind in complex_types
        d = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c, rsd)
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            d.alias(f"{c}__d"),
            (
                F.lit(None).cast("string")
                if is_complex
                else F.min(F.col(c)).cast("string")
            ).alias(f"{c}__min"),
            (
                F.lit(None).cast("string")
                if is_complex
                else F.max(F.col(c)).cast("string")
            ).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__d`, `{c}__min`, `{c}__max`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, n_nonnull, n_distinct, min, max)"
        )
    )
