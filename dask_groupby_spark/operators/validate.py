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

__all__ = ["check_rules", "check_unique", "check_referential", "table_diff"]


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
        # names are interpolated into the stack() expression — a quote,
        # backtick, or backslash (Spark string-literal escape char with
        # the default escapedStringLiterals=false) would break out of or
        # mangle the generated SQL
        if any(ch in name for ch in ("'", "`", "\\")):
            raise ValueError(
                f"rule name may not contain quotes/backticks/backslashes: {name!r}"
            )
    aggs = []
    for name, pred in rules.items():
        ok = F.coalesce(pred.cast("boolean"), F.lit(False))
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            # coalesce: SUM over an empty relation is NULL, and a gate
            # asserting n_violations == 0 on an empty snapshot must pass
            # vacuously, not evaluate NULL (r9 empty-relation audit)
            F.coalesce(F.sum((~ok).cast("bigint")), F.lit(0)).alias(f"{name}__v"),
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
    # coalesce: SUMs over an empty relation are NULL — an empty input
    # must report zeros so uniqueness gates pass vacuously (r9 audit)
    return per_key.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(F.sum((F.col("cnt") > 1).cast("bigint")), F.lit(0)).alias(
            "n_dup_keys"
        ),
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_dup_rows"),
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
    if sample_orphans > 0:
        return child.join(pkeys, on=on, how="left_anti").limit(sample_orphans)
    # ONE child scan (r7): left join against the distinct parent keys with
    # a match marker, then count + conditional-count in a single
    # aggregate — the former separate n_rows job re-read the full child
    marked = child.select(F.col(on)).join(
        pkeys.withColumn("__hit", F.lit(1)), on=on, how="left"
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: empty child must report 0 orphans, not NULL (r9 audit)
        F.coalesce(
            F.sum((F.col("__hit").isNull()).cast("bigint")), F.lit(0)
        ).alias("n_orphans"),
    ).withColumn(
        "orphan_frac",
        F.coalesce(F.try_divide("n_orphans", "n_rows"), F.lit(0.0)),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
    detail: bool = False,
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table: how many
    rows were added / removed / changed / unchanged, and (with
    ``detail=True``) which — the audit step between two corpus builds
    ("what did the new crawl actually change?") before promoting one.

    ONE shuffle total: both sides union with a side tag and aggregate by
    the key — GROUP BY treats NULL keys as equal in both Spark and SQL
    (unlike join equality), so NULL-keyed rows diff correctly for free.
    Per-key state is the two compared-column structs.  Change detection
    is a null-safe per-column comparison (``<=>``), applied to
    ``compare_cols`` (default: all shared non-key columns).  Each side
    must be unique per key (pre-aggregate otherwise, as for
    ``upsert_table``).

    ``detail=False`` (default): one row ``(n_added, n_removed,
    n_changed, n_unchanged)``.  ``detail=True``: one row per key with a
    ``diff_status`` column (``added|removed|changed|unchanged``) plus
    the key columns — filter and join back to either side for payloads.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    cols = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in old.columns if c in new.columns and c not in ks]
    )
    missing = [c for c in ks + cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from one side: {missing}")

    def _tag(df: DataFrame, side: int) -> DataFrame:
        return df.select(
            *ks,
            F.lit(side).alias("__side"),
            F.struct(*[F.col(c) for c in cols]).alias("__vals")
            if cols
            else F.lit(None).alias("__vals"),
        )

    u = _tag(old, 0).unionByName(_tag(new, 1))
    per_key = u.groupBy(*ks).agg(
        F.max(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__in_old"),
        F.max(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__in_new"),
        F.first(F.when(F.col("__side") == 0, F.col("__vals")), ignorenulls=True).alias("__ov"),
        F.first(F.when(F.col("__side") == 1, F.col("__vals")), ignorenulls=True).alias("__nv"),
    )
    if cols:
        same = None
        for c in cols:
            eq = F.col("__ov").getField(c).eqNullSafe(F.col("__nv").getField(c))
            same = eq if same is None else same & eq
    else:
        same = F.lit(True)
    status = (
        F.when((F.col("__in_old") == 0) & (F.col("__in_new") == 1), "added")
        .when((F.col("__in_old") == 1) & (F.col("__in_new") == 0), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    flagged = per_key.withColumn("diff_status", status)
    if detail:
        return flagged.select(*ks, "diff_status")
    return flagged.agg(
        F.sum((F.col("diff_status") == "added").cast("bigint")).alias("n_added"),
        F.sum((F.col("diff_status") == "removed").cast("bigint")).alias("n_removed"),
        F.sum((F.col("diff_status") == "changed").cast("bigint")).alias("n_changed"),
        F.sum((F.col("diff_status") == "unchanged").cast("bigint")).alias("n_unchanged"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: "str | Sequence[str]",
    k: int = 5,
    sample_groups: int = 0,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set — the
    pre-release privacy check next to ``curate.redact_pii``: a dataset is
    k-anonymous iff every combination of the quasi-identifiers is shared
    by at least ``k`` rows, so no combination singles out fewer than k
    individuals.

    One summary row: ``n_rows``, ``n_groups``, ``min_group_size``,
    ``n_violating_groups`` (< k rows), ``n_violating_rows``, ``k_anon``
    (boolean).  NULL-containing combinations group together (GROUP BY
    semantics).  With ``sample_groups > 0`` returns instead the smallest
    offending combinations (up to that many, size then key order) for
    debugging — the ``check_unique(sample_keys=)`` convention.

    Plan: one map-combined count shuffle on the quasi-identifier + a tiny
    rollup; the sample view is a TakeOrdered over group-level rows.
    """
    cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("group_size"))
    if sample_groups > 0:
        return (
            sizes.where(F.col("group_size") < k)
            .orderBy("group_size", *cols)
            .limit(sample_groups)
        )
    viol = F.col("group_size") < k
    return sizes.agg(
        # coalesce the sums/flags: over an EMPTY frame the summary row
        # still renders (0 rows, 0 groups, vacuously k-anonymous), not a
        # row of NULLs (r9 empty-relation audit); min_group_size stays
        # NULL — there is no smallest group
        F.coalesce(F.sum("group_size").cast("bigint"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("group_size").cast("bigint").alias("min_group_size"),
        F.coalesce(
            F.sum(viol.cast("bigint")).cast("bigint"), F.lit(0)
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(viol, F.col("group_size")).otherwise(0)).cast("bigint"),
            F.lit(0),
        ).alias("n_violating_rows"),
        F.coalesce(F.min("group_size") >= k, F.lit(True)).alias("k_anon"),
    )
