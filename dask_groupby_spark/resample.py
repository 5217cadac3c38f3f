"""Time resampling: grouped reduction onto regular time buckets.

The reference's dominant real-world workload is xarray resampling /
climatology (BASELINE.md: ERA5Resampling, PerfectBlockwiseResampling,
OISST…), which flox executes as groupby_reduce over integer labels that
xarray derives from the time coordinate.  Here the label derivation is part
of the engine: ``resample`` floors each timestamp onto a regular grid
anchored at ``origin`` and reduces per (bucket, *extra keys*), returning the
bucket *start timestamp* as the label column — and, like expected_groups,
optionally a dense bucket axis (every grid step between min and max, empty
buckets filled).

Physical plan: the bucket expression is a map-side column (no join, no
extra stage); the reduction is the standard single-shuffle hash aggregate.
Dense reindexing joins against a planner-generated ``sequence()`` range —
|buckets| rows, broadcast.

Calendar frequencies (month/quarter/year) don't have a fixed second width;
those use date_trunc instead of arithmetic flooring.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dtypes as dt_rules
from .core import groupby_reduce

# fixed-width frequencies in seconds
_FIXED = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}
_CALENDAR = ("month", "quarter", "year")


def _parse_every(every: Union[str, int, float]) -> tuple[Optional[float], Optional[str]]:
    """'5 days' → (432000.0, None); 'month' → (None, 'month'); 3600 → (3600.0, None)."""
    if isinstance(every, (int, float)):
        return float(every), None
    parts = every.strip().lower().split()
    if len(parts) == 1:
        unit = parts[0].rstrip("s")
        n = 1.0
    else:
        n = float(parts[0])
        unit = parts[1].rstrip("s")
    if unit in _CALENDAR:
        if n != 1:
            raise ValueError(f"calendar frequency {unit!r} supports only step 1")
        return None, unit
    if unit not in _FIXED:
        raise ValueError(f"unknown frequency unit {unit!r}")
    return n * _FIXED[unit], None


def resample(
    df: DataFrame,
    ts_col: str,
    every: Union[str, int, float],
    func: str,
    value: str,
    *extra_by: str,
    origin: str = "1970-01-01 00:00:00",
    dense: bool = False,
    fill_value=None,
    label: str = "bucket",
    **kwargs,
) -> DataFrame:
    """Reduce ``value`` onto regular time buckets of width ``every``
    (e.g. ``"5 days"``, ``"6 hours"``, ``"month"``), optionally crossed with
    ``extra_by`` keys.  Returns ``(<label> timestamp, *extra_by, <func>)``.

    ``dense=True`` emits every grid step between the observed min and max
    bucket (empty buckets get ``fill_value`` — the resampling-with-missing-
    groups case, ref flox/tests/test_xarray.py:694).  With ``extra_by``,
    the dense axis is the FULL cross grid: every (bucket, observed key
    combination), missing cells filled — matching reindexing onto
    ``expected_groups`` = (grid, observed keys).

    Note: ``dense=True`` lazily PERSISTS the aggregated table (it feeds
    the grid bounds, the key domain, and the outer join — three consumers
    AQE will not share an Exchange across; construction runs no job).
    The returned frame exposes the cache as ``.resample_agg`` — call
    ``out.resample_agg.unpersist()`` when done, and read the attribute
    BEFORE transforming the result (a transformed DataFrame is a new
    object; the attribute does not propagate).
    """
    width, calendar = _parse_every(every)
    if width is not None and width <= 0:
        raise ValueError(f"every must be a positive width, got {every!r}")
    # canonicalize NTZ → TIMESTAMP so both the date_trunc label dtype and the
    # seconds arithmetic below are well-defined (and match the DuckDB oracle)
    df = dt_rules.normalize_time(df, ts_col)
    ts = F.col(ts_col)
    if calendar:
        bucket = F.date_trunc(calendar, ts)
    else:
        anchor = (
            F.unix_micros(F.lit(origin).cast("timestamp")) / F.lit(1_000_000.0)
        )
        secs = dt_rules.time_to_seconds(df, ts_col)
        bucket = F.timestamp_seconds(
            anchor + F.floor((secs - anchor) / width) * width
        )
    work = df.withColumn(label, bucket)

    # forward fill_value: with extra_by the reduction itself emits the
    # observed cross grid (flox multi-by semantics) and fills missing cells
    # there — the dense join below only adds fully-empty buckets
    if fill_value is not None:
        kwargs.setdefault("fill_value", fill_value)
    out = groupby_reduce(work, label, *extra_by, func=func, value=value, **kwargs)

    if dense:
        if calendar:
            step = f"interval 1 {calendar}"
        else:
            # make_dt_interval keeps fractional-second widths exact — an
            # int() truncation here would build a grid the real buckets
            # don't land on, and the grid-preserving join would then drop
            # every aggregated bucket (r9 review)
            step = f"make_dt_interval(0, 0, 0, {float(width)!r})"
        # the aggregate feeds THREE consumers below (grid bounds, the key
        # domain, the outer join) and AQE never reuses an Exchange across
        # consumers — persist it (lazy: construction runs no job, a tested
        # property; an eager localCheckpoint was tried for r9's leak
        # advice and reverted — it broke laziness and hid the lineage).
        # The unpersist handle is exposed AND documented as
        # ``.resample_agg``; reading it before transforming the result is
        # the caller's contract.
        out = out.persist()
        # lazy grid: bounds from the AGGREGATED table — it has one row per
        # observed bucket, so min/max(label) match the fact table's and the
        # grid costs a 1-row aggregate over the cache, not a third fact scan
        grid = out.select(F.min(label).alias("__lo"), F.max(label).alias("__hi")).select(
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr(step))
            ).alias(label)
        )
        out_name = kwargs.get("alias") or func
        if extra_by:
            # full dense cross grid: bucket axis × observed key domain.
            # Both sides are aggregate-small (|buckets| and |distinct keys|)
            # so the cross join never touches fact-table rows; AQE picks the
            # broadcast side from runtime sizes (no forced hint — either
            # side can be the big one).
            keys = out.select(*extra_by).distinct()
            grid = grid.crossJoin(keys)
        # RIGHT OUTER preserving the grid, strategy left to AQE: an outer
        # join cannot broadcast its preserved side, so the only forceable
        # broadcast would be the aggregated result — |buckets × keys| rows,
        # a driver hazard at scale (same reasoning as reindex_result).
        joined = out.join(grid, on=[label, *extra_by], how="right_outer")
        res_dt = joined.schema[out_name].dataType
        fill = (
            dt_rules.fill_lit(fill_value, res_dt)
            if fill_value is not None
            else dt_rules.na_lit(res_dt)  # empty cell → dtype NA
        )
        agg = out
        out = joined.withColumn(out_name, F.coalesce(F.col(out_name), fill))
        out = out.orderBy(label, *extra_by)
        out.resample_agg = agg
    return out
