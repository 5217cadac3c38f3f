"""The aggregation registry: every grouped reduction of the reference
(``flox/aggregations.py:740-776`` AGGREGATIONS dict, 30 entries) and every
grouped scan (``flox/aggregations.py:709-737``), re-expressed as Spark SQL
*Column expression builders*.

Where the reference declares an :class:`Aggregation` as
(chunk funcs, combine funcs, finalize) executed by ``chunk_reduce``
(flox/core.py:938-1113) over pluggable numpy kernels, we declare a single
aggregate ``Column`` expression and let Catalyst derive the partial/merge/
final split (``HashAggregate(partial) → Exchange → HashAggregate(final)``) —
the Spark-native equivalent of flox's map-reduce method (SURVEY.md §4).

NaN semantics (ref: SURVEY.md §2.1 notes; flox/xrutils.py:162-186):
the reference's arrays have ONE missing sentinel (float NaN / NaT).  Spark
has two (NULL and float NaN), and treats NaN as an ordinary greatest value.
We therefore define ``missing := isnull(v) OR isnan(v)`` and
``clean := CASE WHEN NOT missing THEN v END``:

- ``nan*``  (skipna) variants aggregate over ``clean`` (NULLs are skipped by
  every Spark aggregate natively).
- bare (propagating) variants wrap the skipna result with
  ``CASE WHEN max(missing) THEN NaN``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dtypes as dt_rules
from .dtypes import NAN


@dataclass
class Ctx:
    """Expression-building context for one reduction over one value column."""

    v: Column  # raw value column
    clean: Column  # value with missing (NULL|NaN) → NULL
    missing: Column  # boolean: value is missing
    valid: Column  # boolean: value is present
    idx: Optional[Column]  # explicit element-order column (first/last/arg*/scans)
    dt: T.DataType  # Spark type of the raw value column
    is_float: bool
    kw: dict  # finalize kwargs: ddof, q, ...


@dataclass
class Aggregation:
    """Declarative grouped-reduction spec (ref: flox/aggregations.py:149-248).

    The reference's (chunk, combine, finalize, fill_value, dtypes) tuple
    collapses to: ``build(ctx) -> Column`` (Catalyst owns partial/merge),
    ``result_type`` (the final-cast rule, ref xrdtypes.py:153-172), and
    ``needs_idx`` (order-sensitive ops need an explicit index column —
    SURVEY.md §7 'load-bearing design choice').
    """

    name: str
    build: Optional[Callable[[Ctx], Column]]
    result_type: Callable[[T.DataType, dict], T.DataType]
    skipna: bool = True
    needs_idx: bool = False
    # multi-stage plans (mode) that cannot be a single aggregate expression
    grouped_build: Optional[str] = None
    # flox forces min_count>=1 for these (ref: aggregations.py:852-858)
    forces_min_count: bool = False
    # cast bool input to long before reducing (ref: core.py:2442-2443)
    bool_to_int: bool = True
    # default fill for absent expected groups when the user gives none
    # (ref: final_fill_value — count→0 aggregations.py:292-301, prod→1 :307,
    # arg*→−1 :444-494, any/all→False :513-530; everything else dtypes.NA)
    final_fill: object = None


@dataclass
class Scan:
    """Declarative grouped-scan spec (ref: flox/aggregations.py:577-598).

    ``build(ctx, window) -> Column`` over
    ``Window.partitionBy(keys).orderBy(idx)`` — the Spark equivalent of the
    reference's Blelloch prefix scan (flox/core.py:2948-2992), whose
    partition/combine machinery Catalyst's WindowExec subsumes.
    """

    name: str
    build: Callable[[Ctx, object], Column]
    result_type: Callable[[T.DataType, dict], T.DataType]


# --------------------------------------------------------------------------
# helpers


def _any_missing(ctx: Ctx) -> Column:
    return F.max(ctx.missing.cast("int")) == 1


def _propagate(ctx: Ctx, skipna_result: Column) -> Column:
    """Bare-variant wrapper: any missing value in the group → NaN
    (ref: SURVEY.md §2.1 — NaN-propagating vs NaN-skipping pairs)."""
    if not ctx.is_float:
        return skipna_result
    return F.when(_any_missing(ctx), F.lit(NAN)).otherwise(skipna_result)


def _truthy(ctx: Ctx) -> Column:
    """numpy truthiness for any/all: NaN is truthy, 0 is falsy
    (ref: aggregations.py:513-530; NULL rows are skipped)."""
    if isinstance(ctx.dt, T.BooleanType):
        return ctx.v
    if ctx.is_float:
        return F.when(ctx.v.isNull(), F.lit(None)).otherwise(
            F.isnan(ctx.v) | (ctx.v != F.lit(0.0))
        )
    return F.when(ctx.v.isNull(), F.lit(None)).otherwise(ctx.v != F.lit(0))


def _require_idx(ctx: Ctx, name: str) -> Column:
    if ctx.idx is None:
        raise ValueError(
            f"func={name!r} is order-sensitive and requires idx_col= (an explicit "
            "element-order column; ref SURVEY.md §7 — Spark rows are unordered)"
        )
    return ctx.idx


# --------------------------------------------------------------------------
# reduction builders


def _count(ctx: Ctx) -> Column:
    # ref: aggregations.py:292-301 (count == nanlen: # of non-missing)
    return F.count(ctx.clean)


def _nansum(ctx: Ctx) -> Column:
    # all-missing group → 0, the sum identity (np.nansum([]) == 0)
    zero = F.lit(0).cast(dt_rules.sum_result_type(ctx.dt))
    return F.coalesce(F.sum(ctx.clean), zero)


def _sum(ctx: Ctx) -> Column:
    return _propagate(ctx, _nansum(ctx))


def _nanprod(ctx: Ctx) -> Column:
    one = F.lit(1).cast(dt_rules.sum_result_type(ctx.dt))
    return F.coalesce(F.product(ctx.clean), one)


def _prod(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanprod(ctx))


def _nanmean(ctx: Ctx) -> Column:
    if isinstance(ctx.dt, (T.TimestampType, T.TimestampNTZType)):
        # datetime mean: int64 micros view + restore (ref: core.py:2506-2520)
        # exact integer floor-division: epoch-micro sums overflow double's
        # 2^53 integer range, so sum in DECIMAL and divide exactly via
        # (S - S % n) / n  (the numerator is exactly divisible → no rounding)
        # unix_micros rejects TIMESTAMP_NTZ → view NTZ as TIMESTAMP first
        # (instant-preserving: session tz pinned UTC) and restore the input
        # dtype on the way out.
        src = ctx.clean
        if isinstance(ctx.dt, T.TimestampNTZType):
            src = src.cast("timestamp")
        micros = F.unix_micros(src).cast("decimal(38,0)")
        s, n = F.sum(micros), F.count(micros)
        out = F.timestamp_micros(((s - s % n) / n).cast("long"))
        if isinstance(ctx.dt, T.TimestampNTZType):
            out = out.cast("timestamp_ntz")
        return out
    return F.avg(ctx.clean)


def _mean(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanmean(ctx))


def _var_expr(ctx: Ctx) -> Column:
    ddof = int(ctx.kw.get("ddof", 0))
    if ddof == 0:
        return F.var_pop(ctx.clean)
    if ddof == 1:
        return F.var_samp(ctx.clean)
    # generic ddof (ref: aggregations.py:337-368) via the STABLE builtin:
    # var_ddof = var_pop · n/(n−ddof) exactly — no Σx²−(Σx)²/n raw-moment
    # cancellation when |mean| ≫ spread (r7 numerical-stability sweep)
    n = F.count(ctx.clean)
    return F.when(
        n > F.lit(ddof), F.var_pop(ctx.clean) * n / (n - F.lit(ddof))
    )


def _nanvar(ctx: Ctx) -> Column:
    ddof = int(ctx.kw.get("ddof", 0))
    out = _var_expr(ctx)
    if ddof == 0:
        # count <= ddof → NaN handled by var_pop returning NULL only for n=0;
        # n>0, ddof=0 always defined.
        return out
    n = F.count(ctx.clean)
    return F.when(n > F.lit(ddof), out)


def _var(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanvar(ctx))


def _nanstd(ctx: Ctx) -> Column:
    ddof = int(ctx.kw.get("ddof", 0))
    if ddof == 0:
        return F.stddev_pop(ctx.clean)
    if ddof == 1:
        return F.stddev_samp(ctx.clean)
    return F.sqrt(_nanvar(ctx))


def _std(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanstd(ctx))


def _nanmin(ctx: Ctx) -> Column:
    # Spark min skips NULL; NaN already stripped into NULL via clean.
    return F.min(ctx.clean)


def _min(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanmin(ctx))


def _nanmax(ctx: Ctx) -> Column:
    return F.max(ctx.clean)


def _max(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanmax(ctx))


def _argextreme(ctx: Ctx, name: str, largest: bool, skipna: bool) -> Column:
    """arg-reductions (ref: aggregations.py:411-494, chunk_argreduce
    core.py:881-935): index of the first (smallest idx) extreme value.

    Implemented with native struct ordering so Catalyst gives us the
    extreme value with smallest-index tie-break (numpy argmin/argmax
    return the FIRST occurrence): ``max(struct(v, -idx))`` for argmax,
    ``min(struct(v, idx))`` for argmin.  The argmin side must NOT negate
    the value (r9 review): ``-v.cast("double")`` threw on string /
    TIMESTAMP_NTZ values argmax handled natively, and collided int64
    values beyond 2^53, tie-breaking to the wrong index.
    """
    idx = _require_idx(ctx, name)
    if largest:
        pair = F.when(ctx.valid, F.struct(ctx.clean.alias("v"), (-idx).alias("ni")))
        best = -F.max(pair)["ni"]
    else:
        pair = F.when(ctx.valid, F.struct(ctx.clean.alias("v"), idx.alias("i")))
        best = F.min(pair)["i"]
    if skipna or not ctx.is_float:
        return best
    # bare variant, numpy semantics: any NaN → index of the FIRST NaN
    # (NaN "wins" both argmin and argmax comparisons in np.argmin/argmax)
    first_missing = F.min(F.when(ctx.missing, idx))
    return F.when(_any_missing(ctx), first_missing).otherwise(best)


def _first(ctx: Ctx) -> Column:
    # order-sensitive first element incl. missing (ref: aggregations.py:496-497)
    idx = _require_idx(ctx, "first")
    return F.min(F.struct(idx.alias("i"), ctx.v.alias("v")))["v"]


def _last(ctx: Ctx) -> Column:
    idx = _require_idx(ctx, "last")
    return F.max(F.struct(idx.alias("i"), ctx.v.alias("v")))["v"]


def _nanfirst(ctx: Ctx) -> Column:
    # first non-missing (ref: aggregations.py:498-511, xrutils.py:374-398)
    idx = _require_idx(ctx, "nanfirst")
    return F.min(F.when(ctx.valid, F.struct(idx.alias("i"), ctx.clean.alias("v"))))["v"]


def _nanlast(ctx: Ctx) -> Column:
    idx = _require_idx(ctx, "nanlast")
    return F.max(F.when(ctx.valid, F.struct(idx.alias("i"), ctx.clean.alias("v"))))["v"]


def _any(ctx: Ctx) -> Column:
    # empty/all-null group → False, the identity (ref: aggregations.py:513-521)
    return F.coalesce(F.bool_or(_truthy(ctx)), F.lit(False))


def _all(ctx: Ctx) -> Column:
    return F.coalesce(F.bool_and(_truthy(ctx)), F.lit(True))


def _nanmedian(ctx: Ctx) -> Column:
    # exact median — Spark percentile is exact linear interpolation, matching
    # numpy method="linear" (ref: aggregations.py:534-547). No blockwise
    # rechunk constraint in Spark (the reference's chunk=None limitation).
    return F.median(ctx.clean)


def _median(ctx: Ctx) -> Column:
    return _propagate(ctx, _nanmedian(ctx))


def _nanquantile(ctx: Ctx) -> Column:
    q = ctx.kw.get("q")
    if q is None:
        raise ValueError("quantile requires finalize_kwargs={'q': ...} (ref core.py:2395-2405)")
    if isinstance(q, (list, tuple)):
        # vector q adds a leading dim in the reference
        # (aggregations.py:550-551) → ArrayType column here; all-missing
        # group → array of NaN (np.nanquantile of all-NaN)
        out = F.percentile(ctx.clean, F.array(*[F.lit(float(x)) for x in q]))
        return F.coalesce(out, F.array(*[F.lit(NAN).cast("double")] * len(q)))
    return F.percentile(ctx.clean, F.lit(float(q)))


def _quantile(ctx: Ctx) -> Column:
    q = ctx.kw.get("q")
    out = _nanquantile(ctx)
    if isinstance(q, (list, tuple)) and ctx.is_float:
        n = len(q)
        return F.when(
            _any_missing(ctx), F.array(*[F.lit(NAN).cast("double")] * n)
        ).otherwise(out)
    return _propagate(ctx, out)


def _nunique(ctx: Ctx) -> Column:
    # capability+ (no flox counterpart): exact distinct non-missing count.
    # Holistic — Spark expands it to a two-level aggregate (partial distinct
    # per partition), so a hot key still shuffles all its distinct values;
    # use approx_nunique at skewed 100 TB scale.
    return F.count_distinct(ctx.clean)


def _approx_nunique(ctx: Ctx) -> Column:
    # HyperLogLog++ sketch — mergeable, O(1) state per group: the skew-proof
    # scale path. rsd (relative error) via finalize_kwargs, default 5%.
    return F.approx_count_distinct(ctx.clean, rsd=float(ctx.kw.get("rsd", 0.05)))


def _approx_quantile(ctx: Ctx) -> Column:
    # Greenwald-Khanna sketch (percentile_approx) — unlike exact percentile
    # (which buffers every value of a group in one task), the sketch is
    # mergeable with bounded size, so a hot key cannot OOM an executor.
    # Returns an actual element (no interpolation); accuracy via
    # finalize_kwargs (higher = more precise, default 10000).
    q = ctx.kw.get("q")
    if q is None:
        raise ValueError("approx_quantile requires finalize_kwargs={'q': ...}")
    acc = int(ctx.kw.get("accuracy", 10000))
    if isinstance(q, (list, tuple)):
        return F.percentile_approx(
            ctx.clean, F.array(*[F.lit(float(x)) for x in q]), F.lit(acc)
        )
    return F.percentile_approx(ctx.clean, F.lit(float(q)), F.lit(acc))


def _approx_median(ctx: Ctx) -> Column:
    acc = int(ctx.kw.get("accuracy", 10000))
    return F.percentile_approx(ctx.clean, F.lit(0.5), F.lit(acc))


def _approx_quantile_result_type(dt: T.DataType, kw: dict) -> T.DataType:
    # percentile_approx picks actual elements → input dtype preserved
    elem = dt_rules.preserve_result_type(dt)
    if isinstance(kw.get("q"), (list, tuple)):
        return T.ArrayType(elem)
    return elem


def _quantile_result_type(dt: T.DataType, kw: dict) -> T.DataType:
    # quantile final dtype is float64 even for float32 input
    # (ref: aggregations.py:557-572 final_dtype=np.float64; median instead
    # preserves the float width via final_dtype=np.floating)
    q = kw.get("q")
    elem = T.DoubleType()
    if isinstance(q, (list, tuple)):
        return T.ArrayType(elem)
    return elem


# --------------------------------------------------------------------------
# registry (ref: flox/aggregations.py:740-776 — all 30 reduction entries)

_preserve = lambda dt, kw: dt_rules.preserve_result_type(dt)  # noqa: E731
_floaty = lambda dt, kw: dt_rules.float_result_type(dt)  # noqa: E731
_sumty = lambda dt, kw: dt_rules.sum_result_type(dt)  # noqa: E731
_longty = lambda dt, kw: T.LongType()  # noqa: E731
_boolty = lambda dt, kw: T.BooleanType()  # noqa: E731


def _ts_preserving(fallback):
    """mean/median/quantile of timestamps return timestamps."""

    def rule(dt, kw):
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return dt
        return fallback(dt, kw)

    return rule


AGGREGATIONS: dict[str, Aggregation] = {
    "count": Aggregation("count", _count, _longty, skipna=True, final_fill=0),
    "sum": Aggregation("sum", _sum, _sumty, skipna=False),
    "nansum": Aggregation("nansum", _nansum, _sumty),
    "prod": Aggregation("prod", _prod, _sumty, skipna=False, final_fill=1),
    "nanprod": Aggregation("nanprod", _nanprod, _sumty),
    "mean": Aggregation("mean", _mean, _ts_preserving(_floaty), skipna=False),
    "nanmean": Aggregation("nanmean", _nanmean, _ts_preserving(_floaty)),
    "var": Aggregation("var", _var, _floaty, skipna=False),
    "nanvar": Aggregation("nanvar", _nanvar, _floaty),
    "std": Aggregation("std", _std, _floaty, skipna=False),
    "nanstd": Aggregation("nanstd", _nanstd, _floaty),
    "min": Aggregation("min", _min, _preserve, skipna=False, bool_to_int=False),
    "nanmin": Aggregation(
        "nanmin", _nanmin, _preserve, forces_min_count=True, bool_to_int=False
    ),
    "max": Aggregation("max", _max, _preserve, skipna=False, bool_to_int=False),
    "nanmax": Aggregation(
        "nanmax", _nanmax, _preserve, forces_min_count=True, bool_to_int=False
    ),
    "argmin": Aggregation(
        "argmin",
        lambda c: _argextreme(c, "argmin", largest=False, skipna=False),
        _longty,
        skipna=False,
        needs_idx=True,
        final_fill=-1,
    ),
    "argmax": Aggregation(
        "argmax",
        lambda c: _argextreme(c, "argmax", largest=True, skipna=False),
        _longty,
        skipna=False,
        needs_idx=True,
        final_fill=-1,
    ),
    "nanargmin": Aggregation(
        "nanargmin",
        lambda c: _argextreme(c, "nanargmin", largest=False, skipna=True),
        _longty,
        needs_idx=True,
        final_fill=-1,
    ),
    "nanargmax": Aggregation(
        "nanargmax",
        lambda c: _argextreme(c, "nanargmax", largest=True, skipna=True),
        _longty,
        needs_idx=True,
        final_fill=-1,
    ),
    "first": Aggregation(
        "first", _first, _preserve, skipna=False, needs_idx=True, bool_to_int=False
    ),
    "last": Aggregation(
        "last", _last, _preserve, skipna=False, needs_idx=True, bool_to_int=False
    ),
    "nanfirst": Aggregation(
        "nanfirst", _nanfirst, _preserve, needs_idx=True, bool_to_int=False
    ),
    "nanlast": Aggregation(
        "nanlast", _nanlast, _preserve, needs_idx=True, bool_to_int=False
    ),
    "any": Aggregation("any", _any, _boolty, bool_to_int=False, final_fill=False),
    "all": Aggregation("all", _all, _boolty, bool_to_int=False, final_fill=False),
    # order-free single-value pick (Spark any_value): used by the xarray
    # front-end's missing-variable passthrough, where the column is constant
    # within each group so ANY representative is THE value.  No flox
    # counterpart (passthrough vars are never aggregated there); no idx
    # needed, unlike first/last.
    "anyvalue": Aggregation(
        "anyvalue",
        lambda ctx: F.any_value(ctx.clean, True),
        _preserve,
        bool_to_int=False,
    ),
    "median": Aggregation(
        "median", _median, _ts_preserving(_floaty), skipna=False
    ),
    "nanmedian": Aggregation("nanmedian", _nanmedian, _ts_preserving(_floaty)),
    "quantile": Aggregation(
        "quantile", _quantile, _quantile_result_type, skipna=False
    ),
    "nanquantile": Aggregation("nanquantile", _nanquantile, _quantile_result_type),
    # ---- capability+ (beyond the reference): distinct counting and
    # sketch-backed order statistics — the skew-safe paths at 100 TB.
    # All are NaN-skipping (sketches drop missing values by construction).
    "nunique": Aggregation("nunique", _nunique, _longty, final_fill=0),
    "approx_nunique": Aggregation("approx_nunique", _approx_nunique, _longty, final_fill=0),
    "approx_quantile": Aggregation(
        "approx_quantile", _approx_quantile, _approx_quantile_result_type, bool_to_int=False
    ),
    "approx_median": Aggregation(
        "approx_median", _approx_median, _preserve, bool_to_int=False
    ),
    # mode needs a two-stage plan (count per value, pick max with smallest-
    # value tie-break — scipy.stats.mode semantics, ref aggregate_npg.py:185-215)
    "mode": Aggregation(
        "mode", None, _preserve, skipna=False, grouped_build="mode", bool_to_int=False
    ),
    "nanmode": Aggregation(
        "nanmode", None, _preserve, grouped_build="mode", bool_to_int=False
    ),
}


# --------------------------------------------------------------------------
# scans (ref: flox/aggregations.py:709-737; executed as window expressions —
# the Spark analog of dask_groupby_scan's Blelloch scan, core.py:2948-2992)


def _scan_nancumsum(ctx: Ctx, w) -> Column:
    # np.nancumsum: NaN treated as 0, leading missing → 0
    zero = F.lit(0).cast(dt_rules.sum_result_type(ctx.dt))
    return F.coalesce(F.sum(ctx.clean).over(w), zero)


def _scan_cumsum(ctx: Ctx, w) -> Column:
    out = F.coalesce(F.sum(ctx.clean).over(w), F.lit(0).cast(dt_rules.sum_result_type(ctx.dt)))
    if not ctx.is_float:
        return out
    return F.when(F.max(ctx.missing.cast("int")).over(w) == 1, F.lit(NAN)).otherwise(out)


def _scan_nancumprod(ctx: Ctx, w) -> Column:
    one = F.lit(1).cast(dt_rules.sum_result_type(ctx.dt))
    return F.coalesce(F.product(ctx.clean).over(w), one)


def _scan_cumprod(ctx: Ctx, w) -> Column:
    out = _scan_nancumprod(ctx, w)
    if not ctx.is_float:
        return out
    return F.when(F.max(ctx.missing.cast("int")).over(w) == 1, F.lit(NAN)).otherwise(out)


def _scan_nancummax(ctx: Ctx, w) -> Column:
    # np.fmax.accumulate semantics: missing skipped, position carries the
    # running max of valid values so far; leading-missing prefix → NaN/NULL
    out = F.max(ctx.clean).over(w)
    return F.coalesce(out, F.lit(NAN).cast(ctx.dt)) if ctx.is_float else out


def _scan_cummax(ctx: Ctx, w) -> Column:
    # np.maximum.accumulate: a NaN poisons every later position in the group
    out = _scan_nancummax(ctx, w)
    if not ctx.is_float:
        return out
    return F.when(F.max(ctx.missing.cast("int")).over(w) == 1, F.lit(NAN)).otherwise(out)


def _scan_nancummin(ctx: Ctx, w) -> Column:
    out = F.min(ctx.clean).over(w)
    return F.coalesce(out, F.lit(NAN).cast(ctx.dt)) if ctx.is_float else out


def _scan_cummin(ctx: Ctx, w) -> Column:
    out = _scan_nancummin(ctx, w)
    if not ctx.is_float:
        return out
    return F.when(F.max(ctx.missing.cast("int")).over(w) == 1, F.lit(NAN)).otherwise(out)


def _scan_cumcount(ctx: Ctx, w) -> Column:
    # running count of valid values (pandas GroupBy.cumcount counts rows;
    # this counts non-missing — the nanlen scan)
    return F.count(ctx.clean).over(w)


def _scan_shift(ctx: Ctx, w) -> Column:
    # pandas GroupBy.shift: value from `periods` rows earlier in the group
    # (negative = lead); vacated positions → NaN for float, NULL otherwise.
    # Receives an UNFRAMED window (lag/lead reject row frames) — core
    # special-cases this like bfill's reversed frame.
    periods = int(ctx.kw.get("periods", 1))
    shifted = F.lag(ctx.v, periods).over(w)
    if ctx.is_float:
        return F.coalesce(shifted, F.lit(NAN).cast(ctx.dt))
    return shifted


def _scan_diff(ctx: Ctx, w) -> Column:
    # pandas GroupBy.diff: value minus the value `periods` rows earlier in
    # the group. First `periods` positions are vacated (NaN float / NULL
    # otherwise); a NaN operand propagates through the subtraction natively.
    # Unlike pandas we keep integer inputs integral (promoted via the sum
    # type for overflow headroom) instead of promoting to float64 — NULL
    # marks the vacancy, matching SQL `x - lag(x)`.
    # Receives an UNFRAMED window (lag rejects row frames), like shift.
    periods = int(ctx.kw.get("periods", 1))
    lagfn = F.lag if periods >= 0 else F.lead
    prev = lagfn(ctx.v, abs(periods)).over(w)
    out = ctx.v - prev
    if ctx.is_float:
        return F.coalesce(out, F.lit(NAN).cast("double"))
    return out


def _scan_ffill(ctx: Ctx, w) -> Column:
    # ref: aggregations.py:716-724, kernel aggregate_flox.py:254-277
    filled = F.last(ctx.clean, ignorenulls=True).over(w)
    if ctx.is_float:
        return F.coalesce(filled, F.lit(NAN).cast(ctx.dt))  # leading gap stays NaN
    return filled


def _scan_bfill(ctx: Ctx, w_rev) -> Column:
    # ref: aggregations.py:725-735 (ffill on reversed array) — here: ffill
    # over a DESC-ordered window with the ACCUMULATING unboundedPreceding
    # frame (w_rev orders by idx DESC; core.py builds it).  NOT first() over
    # a currentRow..unboundedFollowing frame: Spark evaluates unbounded-
    # FOLLOWING frames by re-scanning the remaining partition suffix for
    # EVERY row — O(n²) per group, measured 31 s vs 0.3 s on 20k-row groups
    # at sf0.1 (r8).  The descending sort reverses the total order exactly
    # (ASC NULLS FIRST ↔ DESC NULLS LAST), so this IS the reference's
    # "ffill on reversed array", paid as one extra in-partition sort.
    filled = F.last(ctx.clean, ignorenulls=True).over(w_rev)
    if ctx.is_float:
        return F.coalesce(filled, F.lit(NAN).cast(ctx.dt))
    return filled


SCANS: dict[str, Scan] = {
    # cumsum/cumprod are declared-but-disabled in the reference
    # (aggregations.py:709-710,736-737, numpy_groupies bugs); we ship them as
    # capability parity+ (SURVEY.md §2.2).
    "cumsum": Scan("cumsum", _scan_cumsum, _sumty),
    "nancumsum": Scan("nancumsum", _scan_nancumsum, _sumty),
    "cumprod": Scan("cumprod", _scan_cumprod, _sumty),
    "nancumprod": Scan("nancumprod", _scan_nancumprod, _sumty),
    "cummax": Scan("cummax", _scan_cummax, _preserve),
    "nancummax": Scan("nancummax", _scan_nancummax, _preserve),
    "cummin": Scan("cummin", _scan_cummin, _preserve),
    "nancummin": Scan("nancummin", _scan_nancummin, _preserve),
    "cumcount": Scan("cumcount", _scan_cumcount, _longty),
    "shift": Scan("shift", _scan_shift, _preserve),
    "diff": Scan("diff", _scan_diff, _sumty),
    "ffill": Scan("ffill", _scan_ffill, _preserve),
    "bfill": Scan("bfill", _scan_bfill, _preserve),
}
