"""dask_groupby_spark — a PySpark-native engine with the query capabilities of
dcherian/dask_groupby (flox): grouped reductions and grouped scans, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Public API (mirrors flox/__init__.py:5-12 of the reference):

- :func:`groupby_reduce`  — grouped reduction   (ref: flox/core.py:2269-2284)
- :func:`groupby_scan`    — grouped scan        (ref: flox/core.py:2718-2727)
- :func:`groupby_agg`     — fused multi-reduction convenience
- :class:`Aggregation`    — custom reduction    (ref: flox/aggregations.py:149-248)
- :class:`Scan`           — custom scan         (ref: flox/aggregations.py:577-598)
- :class:`Bins`           — interval binning    (ref: flox/core.py:803-823, isbin)
- :func:`rechunk_for_blockwise` — physical-layout pre-optimizer analog
  (ref: flox/core.py:634-664): repartition by group keys so the shuffle for a
  later groupBy is already done.

The execution strategy machinery of the reference (engines, cohorts, tree
reduction — flox/core.py:345-537, flox/dask_array_ops.py) is intentionally
absent: Catalyst + Tungsten + AQE provide partial aggregation, tree combine,
and shuffle planning natively (see SURVEY.md §4).
"""

from .aggregations import AGGREGATIONS, SCANS, Aggregation, Scan
from .binning import Bins, quantile_bins
from .complex import complex_col, groupby_reduce_complex
from .core import (
    groupby_agg,
    groupby_describe,
    groupby_fill_stat,
    groupby_interpolate,
    groupby_rank,
    groupby_reduce,
    groupby_scan,
    groupby_winsorize,
)
from .plans import bucket_table, rechunk_for_blockwise, rechunk_for_cohorts
from .resample import resample
from .rolling import groupby_rolling
from .session import get_spark
from .udaf import make_aggregation, make_scan
from .xdim import xarray_reduce

__all__ = [
    "AGGREGATIONS",
    "SCANS",
    "Aggregation",
    "Scan",
    "Bins",
    "quantile_bins",
    "make_aggregation",
    "make_scan",
    "groupby_agg",
    "groupby_reduce",
    "groupby_reduce_complex",
    "complex_col",
    "groupby_describe",
    "groupby_fill_stat",
    "groupby_interpolate",
    "groupby_rank",
    "groupby_winsorize",
    "groupby_rolling",
    "groupby_scan",
    "rechunk_for_blockwise",
    "rechunk_for_cohorts",
    "resample",
    "bucket_table",
    "get_spark",
    "xarray_reduce",
]

__version__ = "0.1.0"
