"""Named-dimension (xarray-style) front-end.

The reference ships an xarray adapter (``flox/xarray.py:65-513
xarray_reduce``): grouper variables live on named dimensions, the reduction
runs over ``dim`` (a subset of the union of those dimensions), every
*retained* dimension survives into the output grid, and coordinates are
reattached afterwards.

Spark translation: an N-D labeled array in long form is a DataFrame with
one column per named dimension plus a value column — dimension names ARE
column names, so the dim→axis bookkeeping the reference needs
(``flox/xarray.py:238-303``) collapses to key-list construction.
:func:`xarray_reduce` here is therefore a thin, declarative front-end over
:func:`~dask_groupby_spark.core.groupby_reduce`:

- ``by``       → grouper columns (virtual datetime accessors like
  ``"ts.month"`` work, matching xarray's ``da["time.month"]`` groupers);
- ``dims``     → the named dimensions of the long frame;
- ``dim``      → dimensions to reduce over (default: all of ``dims``);
- retained dims (``dims - dim``) append to the group keys — exactly the
  reference's broadcast-and-retain behavior;
- ``expected_groups``/``isbin`` per grouper → dense output grid / binning
  (``isbin=True`` wraps that grouper's expected edges in :class:`Bins`,
  ref ``flox/xarray.py:126-143``);
- ``skipna``   → nan-variant dispatch (ref ``flox/xarray.py:355-380``),
  already handled inside ``groupby_reduce``.

Retained dims keep their *observed* label sets unless they are also given
an ``expected_groups`` entry by listing them in ``by`` instead — in long
form a dim column and a grouper column are the same thing, so "retain a
dim densely" is spelled "group by it with expected_groups".

Scale: identical to ``groupby_reduce`` — one shuffle on the combined key
set, map-side partial aggregation; the front-end adds zero plan nodes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame

from .aggregations import AGGREGATIONS, Aggregation
from .binning import Bins
from .core import groupby_agg, groupby_reduce


def xarray_reduce(
    df: DataFrame,
    *by: str,
    func: Union[str, Aggregation],
    dims: Sequence[str],
    dim: Optional[Union[str, Sequence[str]]] = None,
    value: str = "value",
    idx_col: Optional[str] = None,
    expected_groups=None,
    isbin=None,
    sort: bool = True,
    fill_value=None,
    dtype: Optional[str] = None,
    min_count: Optional[int] = None,
    skipna: Optional[bool] = None,
    finalize_kwargs: Optional[dict] = None,
    alias: Optional[str] = None,
    interval_labels: bool = False,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """Reduce a long-form labeled frame over named dimensions.

    ``dims`` declares the dimension columns of ``df``; ``dim`` (str or
    list) selects which of them to reduce over — every other dim is
    retained as an output axis (an extra group key).  ``by`` are the
    grouper columns, exactly as in ``groupby_reduce``.

    Mirrors ``flox.xarray.xarray_reduce`` semantics (flox/xarray.py:65-160):
    grouping by ``by`` within the retained-dim grid, reducing over ``dim``.

    ``interval_labels=True``: binned groupers return their pandas-style
    interval string (``"(10.0, 20.0]"``) instead of the bare 0-based bin
    code — the reference attaches a ``pd.IntervalIndex`` output coordinate
    to binned groupers (flox/xarray.py:370-378); a long-form frame carries
    the same information as the label value itself.

    ``value`` may be a LIST of columns — the Dataset form: the reference's
    xarray front-end reduces every data variable of a Dataset in one call
    (flox/xarray.py:235-265 loops data_vars); here each listed column
    becomes one output column of the same name, all variables fused into a
    SINGLE shuffle/aggregate via ``groupby_agg`` (Catalyst shares the scan
    and hash table across the agg columns).  ``min_count``/``dtype``/
    ``fill_value``/custom ``Aggregation`` objects require the
    single-variable form.

    ``passthrough``: columns carried into the output UNREDUCED — the
    reference's missing-variable passthrough (a Dataset variable that lacks
    the reduced dim survives unchanged, flox/xarray.py:235-265).  In long
    form such a variable is by definition constant within every output
    group (it is a function of the retained dims/groupers), so it rides as
    an extra group key: zero additional plan cost, still one shuffle.  A
    column that does NOT satisfy the constancy condition splits groups —
    the same misuse as reducing over a dim the variable depends on.
    """
    if not by:
        raise ValueError("need at least one by grouper")
    dims = list(dims)
    if dim is None:
        reduce_over = set(dims)
    else:
        reduce_over = {dim} if isinstance(dim, str) else set(dim)
    unknown = reduce_over - set(dims)
    if unknown:
        raise ValueError(f"dim {sorted(unknown)} not in dims {dims}")
    overlap = reduce_over & set(by)
    if overlap:
        raise ValueError(
            f"cannot reduce over a grouper dimension: {sorted(overlap)} "
            "appear in both by and dim"
        )
    retained = [d for d in dims if d not in reduce_over and d not in by]
    passthrough = [
        c for c in passthrough if c not in by and c not in retained
    ]
    bad = set(passthrough) & reduce_over
    if bad:
        raise ValueError(
            f"cannot pass through a reduced dimension: {sorted(bad)}"
        )

    # normalize expected_groups/isbin to one entry per grouper, wrapping
    # bin-edge entries in Bins (the reference's isbin plumbing,
    # flox/xarray.py:126-143)
    nby = len(by)
    if expected_groups is None:
        expected = [None] * nby
    elif isinstance(expected_groups, (list, tuple)) and nby > 1:
        expected = list(expected_groups)
    else:
        expected = [expected_groups]
    if len(expected) != nby:
        raise ValueError(f"expected_groups must have {nby} entries")
    flags = [isbin] * nby if not isinstance(isbin, (list, tuple)) else list(isbin)
    if len(flags) != nby:
        raise ValueError(f"isbin must have {nby} entries")
    expected = [
        Bins(e) if (f and e is not None and not isinstance(e, Bins)) else e
        for e, f in zip(expected, flags)
    ]
    # retained dims keep observed labels → no expected entry; tuple form so
    # core's normalizer aligns entries with the combined key list
    expected_full = tuple(expected) + (None,) * len(retained)
    if all(e is None for e in expected_full):
        expected_full = None

    if isinstance(value, (list, tuple)) or passthrough:
        # Dataset form / passthrough: one fused multi-aggregate, one shuffle
        # (passthrough columns ride as any_value picks — constant per group,
        # so any representative IS the value; groupby_agg keeps the OBSERVED
        # group combinations, matching passthrough-variable alignment)
        if not isinstance(func, str):
            raise ValueError("Dataset (list-of-value) form requires a str func")
        if min_count is not None or dtype is not None or fill_value is not None:
            raise ValueError(
                "min_count/dtype/fill_value are single-variable options; "
                "call xarray_reduce per variable instead"
            )
        fname = func
        # skipna → nan-variant rewrite, same dispatch as groupby_reduce
        # (ref flox/xarray.py:355-380)
        if skipna is not None:
            if skipna and not fname.startswith("nan") and f"nan{fname}" in AGGREGATIONS:
                fname = f"nan{fname}"
            elif not skipna and fname.startswith("nan") and fname[3:] in AGGREGATIONS:
                fname = fname[3:]
        kw = dict(finalize_kwargs or {})
        single = not isinstance(value, (list, tuple))
        values = [value] if single else list(value)
        funcs = [
            (fname, v, (alias or fname) if single else v, kw) for v in values
        ]
        funcs += [("anyvalue", c, c) for c in passthrough]
        out = groupby_agg(
            df,
            *by,
            *retained,
            funcs=funcs,
            idx_col=idx_col,
            expected_groups=expected_full,
            sort=sort,
        )
    else:
        out = groupby_reduce(
            df,
            *by,
            *retained,
            func=func,
            value=value,
            idx_col=idx_col,
            expected_groups=expected_full,
            sort=sort,
            fill_value=fill_value,
            dtype=dtype,
            min_count=min_count,
            skipna=skipna,
            finalize_kwargs=finalize_kwargs,
            alias=alias,
        )
    if interval_labels:
        from pyspark.sql import functions as F

        for b, e in zip(by, expected):
            if isinstance(e, Bins):
                code_col = f"{b}_bin"
                out = out.withColumn(code_col, e.label_expr(F.col(code_col)))
    return out
