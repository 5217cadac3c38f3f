"""Declarative data-quality validation — the Deequ/Great-Expectations
analog for the pipeline's gate steps: assert row-level rules, key
uniqueness, and referential integrity over a table and get back counted
violations (not a crash halfway through a 100 TB write).

No flox counterpart (SURVEY.md §2.4) — Spark-native surface.  All checks
are declarative DataFrame plans:

- :func:`check_rules` — ANY number of row-level boolean rules in ONE
  fused map-combined aggregate over ONE scan (violations are
  ``sum(not rule)`` — the same single-Exchange shape as every reduction).
- :func:`check_unique` — duplicate-key accounting via one groupBy.
- :func:`check_referential` — orphan counting via anti join, with the
  same broadcast-vs-shuffle regime notes as any key join.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_rules", "check_unique", "check_referential"]


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate row-level boolean ``rules`` (name → Column predicate;
    TRUE = row passes) in ONE fused aggregate: returns one row per rule
    ``(rule, n_rows, n_violations, violation_frac)``.

    A NULL predicate result counts as a VIOLATION (unknown is not
    compliant — the conservative reading; wrap with ``coalesce`` to
    choose otherwise).  2·|rules| aggregate expressions share the scan
    and one map-combined reduction, so checking 50 rules costs the same
    single pass as checking one — the property that makes a quality
    gate affordable right before a 100 TB write.  Long-form reshape is a
    ``stack`` projection, no collect.
    """
    if not rules:
        raise ValueError("no rules given")
    for name in rules:
        # names are interpolated into the stack() expression — a quote or
        # backtick would break out of the generated SQL
        if "'" in name or "`" in name:
            raise ValueError(f"rule name may not contain quotes/backticks: {name!r}")
    aggs = []
    for name, pred in rules.items():
        ok = F.coalesce(pred.cast("boolean"), F.lit(False))
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            F.sum((~ok).cast("bigint")).alias(f"{name}__v"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}__n`, `{n}__v`" for n in rules)
    out = wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_rows, n_violations)"
        )
    )
    return out.withColumn(
        "violation_frac",
        F.coalesce(F.try_divide("n_violations", "n_rows"), F.lit(0.0)),
    )


def check_unique(
    df: DataFrame,
    cols: str | Sequence[str],
    sample_keys: int = 0,
) -> DataFrame:
    """Uniqueness check on ``cols``: one summary row
    ``(n_rows, n_keys, n_dup_keys, n_dup_rows)`` — ``n_dup_rows`` is the
    number of EXCESS rows (rows that would vanish if the key were
    unique).  NULL-containing keys group together (SQL GROUP BY
    semantics), so fully-NULL keys count as one key.

    One groupBy on the key (map-combined counts) + one tiny rollup of
    the per-key counts.  ``sample_keys > 0`` instead returns the ``k``
    most-duplicated keys ``(cols…, cnt)`` for debugging — a TakeOrdered,
    no full sort.
    """
    keys = [cols] if isinstance(cols, str) else list(cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    if sample_keys > 0:
        return per_key.where(F.col("cnt") > 1).orderBy(
            F.col("cnt").desc(), *keys
        ).limit(sample_keys)
    return per_key.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("cnt") > 1).cast("bigint")).alias("n_dup_keys"),
        F.sum(F.col("cnt") - 1).alias("n_dup_rows"),
    )


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    on: str,
    parent_col: str | None = None,
    sample_orphans: int = 0,
) -> DataFrame:
    """Referential-integrity check: count ``child`` rows whose ``on``
    key has no match in ``parent`` (orphans).  Returns one row
    ``(n_rows, n_orphans, orphan_frac)``; NULL child keys are orphans
    (they reference nothing).

    Plan: LEFT ANTI join on the parent's distinct keys — Catalyst/AQE
    broadcasts the key set when it fits, else shuffles both sides on
    the key; for a parent too big to broadcast, prefilter with
    :func:`~dask_groupby_spark.operators.joins.bloom_bits_table` and
    count only the survivors through the exact join.
    ``sample_orphans > 0`` returns the first ``k`` orphan rows instead.
    """
    pcol = parent_col or on
    pkeys = parent.select(F.col(pcol).alias(on)).where(
        F.col(on).isNotNull()
    ).distinct()
    orphans = child.join(pkeys, on=on, how="left_anti")
    if sample_orphans > 0:
        return orphans.limit(sample_orphans)
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    cnt = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    return total.crossJoin(cnt).withColumn(
        "orphan_frac",
        F.coalesce(F.try_divide("n_orphans", "n_rows"), F.lit(0.0)),
    )
