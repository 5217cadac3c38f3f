"""Complex-number grouped reductions.

The reference supports complex64/128 values in reductions (strategies.py:83
includes complex dtypes in the hypothesis sweep; the quantile kernel's
sort-trick packs (value, index) into a complex, aggregate_flox.py:62-73).
Spark has no complex type (SURVEY.md §1.2), so we represent a complex column
as ``struct<re: double, im: double>`` and build each reduction from per-part
expressions:

- linear ops (sum/mean) reduce re and im independently;
- ordering ops (min/max/arg*/first/last) use Spark's lexicographic struct
  comparison, which matches numpy's complex ordering (compare real parts,
  break ties on imaginary);
- prod uses the polar decomposition: |z| via exp(Σ log|z|) (0 if any zero
  factor) and arg(z) via Σ atan2(im, re) — pure column expressions, no UDF.

Missing-value rule: a complex element is missing when it is NULL or either
part is NaN (numpy: ``isnan(z) = isnan(z.real) | isnan(z.imag)``).  ``nan*``
variants skip missing elements; bare variants poison the group.

Everything here is a single hash aggregation — one shuffle on the keys,
map-side partial aggregation, whole-stage codegen (no Python in the hot
path) — so the 100 TB story is identical to the scalar reductions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NAN = float("nan")

COMPLEX_FUNCS = (
    "count",
    "sum",
    "nansum",
    "mean",
    "nanmean",
    "prod",
    "nanprod",
    "min",
    "max",
    "nanmin",
    "nanmax",
    "first",
    "last",
    "nanfirst",
    "nanlast",
)


def complex_col(re: Column, im: Column) -> Column:
    """Pack two float columns into the complex struct representation."""
    return F.struct(re.cast("double").alias("re"), im.cast("double").alias("im"))


def _cpx(re, im) -> Column:
    return F.struct(F.lit(re).cast("double").alias("re"), F.lit(im).cast("double").alias("im"))


def groupby_reduce_complex(
    df: DataFrame,
    *by: str,
    func: str,
    value: str,
    idx_col: Optional[str] = None,
    alias: Optional[str] = None,
    sort: bool = True,
) -> DataFrame:
    """Grouped reduction over a ``struct<re,im>`` complex column.

    Returns ``(*by, <alias> struct<re,im>)`` (``count`` returns bigint),
    one row per observed group.  NaN-in-key rows are excluded like in
    :func:`~dask_groupby_spark.core.groupby_reduce`.
    """
    if func not in COMPLEX_FUNCS:
        raise ValueError(f"complex reduction {func!r} not supported; one of {COMPLEX_FUNCS}")
    out = alias or func

    v = F.col(value)
    re, im = v["re"], v["im"]
    missing = v.isNull() | F.isnan(re) | F.isnan(im)
    valid = ~missing
    clean = F.when(valid, v)
    skipna = func.startswith("nan") or func == "count"
    base = func[3:] if func.startswith("nan") else func

    keyed = df.where(
        F.lit(True)
        if not by
        else F.expr(" AND ".join(f"`{b}` IS NOT NULL" for b in by))
    )

    nmiss = F.sum(missing.cast("long"))

    if func == "count":
        agg = F.count(clean).alias(out)
    elif base == "sum":
        s = F.struct(
            F.coalesce(F.sum(F.when(valid, re)), F.lit(0.0)).alias("re"),
            F.coalesce(F.sum(F.when(valid, im)), F.lit(0.0)).alias("im"),
        )
        agg = s.alias(out)
    elif base == "mean":
        n = F.count(clean)
        s = F.struct(
            (F.sum(F.when(valid, re)) / n).alias("re"),
            (F.sum(F.when(valid, im)) / n).alias("im"),
        )
        agg = s.alias(out)
    elif base == "prod":
        # polar form: Π z = exp(Σ log|z|) · e^{i Σ arg z}; any zero factor → 0
        mag2 = re * re + im * im
        logm = F.sum(F.when(valid, F.log(mag2) / 2))
        ang = F.sum(F.when(valid, F.atan2(im, re)))
        anyzero = F.max(F.when(valid & (mag2 == 0), True).otherwise(False))
        pm = F.when(anyzero, F.lit(0.0)).otherwise(F.exp(logm))
        s = F.struct(
            (pm * F.cos(ang)).alias("re"), (pm * F.sin(ang)).alias("im")
        )
        # empty product (all missing) → identity 1+0i (numpy nanprod)
        s = F.when(F.count(clean) > 0, s).otherwise(_cpx(1.0, 0.0))
        agg = s.alias(out)
    elif base in ("min", "max"):
        # Spark struct ordering == numpy complex lexicographic ordering
        agg = (F.min(clean) if base == "min" else F.max(clean)).alias(out)
    elif base in ("first", "last"):
        if idx_col is None:
            raise ValueError(f"func={func!r} requires idx_col=")
        idx = F.col(idx_col)
        if skipna:
            pick_idx = F.when(valid, idx)
        else:
            pick_idx = idx
        agg = (
            F.min_by(v, pick_idx) if base == "first" else F.max_by(v, pick_idx)
        ).alias(out)
    else:  # pragma: no cover
        raise AssertionError(func)

    grouped = keyed.groupBy(*by).agg(agg, nmiss.alias("__nmiss"))

    col = F.col(out)
    if func != "count":
        if base in ("first", "last"):
            # positional picks: bare first/last return the element at the
            # position — never group-poisoned by NaN elsewhere (flox
            # aggregations.py:496-497); nan variants skip missing, and an
            # all-missing group yields complex NaN
            if skipna:
                col = F.coalesce(col, _cpx(NAN, NAN))
        elif skipna:
            # all-missing group → complex NaN (numpy nan-reduction warning case)
            col = F.coalesce(col, _cpx(NAN, NAN))
            if base == "prod":
                col = F.col(out)  # empty product already 1+0i
        else:
            col = F.when(F.col("__nmiss") > 0, _cpx(NAN, NAN)).otherwise(
                F.coalesce(col, _cpx(NAN, NAN))
            )
    result = grouped.withColumn(out, col).drop("__nmiss")
    if sort:
        result = result.orderBy(*by)
    return result
