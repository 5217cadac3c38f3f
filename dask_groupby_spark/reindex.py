"""Reindex a grouped result onto ``expected_groups`` (ref: flox ``reindex_``,
flox/core.py:667-712): groups present in the expected domain but absent from
the data appear with ``fill_value``; with multiple groupers the output is the
dense cross-product grid (ref: ``_factorize_multiple`` raveling,
flox/core.py:2115-2166).

Spark realization: a broadcast LEFT JOIN from the (tiny, planner-side)
expected-groups dimension table onto the aggregated result.  At 100 TB the
aggregated result is |groups| rows — orders of magnitude smaller than the
input — and the expected table is client-provided, so this join never
shuffles big data: the expected side is broadcast.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def expected_groups_df(
    spark: SparkSession,
    key_names: Sequence[str],
    expected: Sequence[Optional[Sequence]],
    key_types: Sequence,
    result: Optional[DataFrame] = None,
) -> Optional[DataFrame]:
    """Build the dense expected-groups dimension table (cross product of the
    per-grouper expected domains).  A grouper with ``None`` expected uses its
    *observed* labels from ``result`` instead (flox: given indexes are
    honored per-grouper, the rest are discovered —
    flox/core.py:2087-2107/2115-2166); with no ``result`` available the
    caller falls back to the fully-observed grid."""
    dims = []
    for name, vals, ktype in zip(key_names, expected, key_types):
        if vals is None:
            if result is None:
                return None
            dims.append(result.select(name).distinct())
        else:
            rows = [(v,) for v in vals]
            dims.append(spark.createDataFrame(rows, schema=f"`{name}` {ktype}"))
    return reduce(lambda a, b: a.crossJoin(b), dims)


def observed_grid(result: DataFrame, key_names: Sequence[str]) -> DataFrame:
    """Dense grid of observed per-grouper values (multi-by semantics of the
    reference: output is the cross product of each grouper's found labels,
    flox/core.py:2115-2166).

    Plan-shape note (deliberate): Catalyst collapses each
    ``result.select(k).distinct()`` through the aggregate into a direct
    column-pruned distinct on the source scan, so a 2-key grid costs two
    extra *key-column-only* scans.  The alternative — one
    ``agg(collect_set(k)…)`` pass — would be a single scan but concentrates
    every distinct value of each key into ONE row, which OOMs on a
    high-cardinality grouper at 100 TB.  Pruned scans + map-side partial
    distinct stay bounded at any cardinality, so we keep them.
    """
    dims = [result.select(k).distinct() for k in key_names]
    return reduce(lambda a, b: a.crossJoin(b), dims)


def reindex_result(
    result: DataFrame,
    expected_df: DataFrame,
    key_names: Sequence[str],
) -> DataFrame:
    """RIGHT OUTER JOIN result → expected; missing groups carry NULL marker
    column ``__present`` for downstream fill handling.

    No join-strategy hint, deliberately.  An outer join cannot broadcast
    its *preserved* side (Spark supports only BuildLeft for RightOuter /
    BuildRight for LeftOuter — a broadcast hint on the expected side is
    rejected with a HintErrorLogger warning), so the only forceable
    broadcast is the aggregated result — which is |groups| rows and a
    driver OOM at 100 TB with a high-cardinality grouper (the bug this
    formulation replaced: the old expected-LEFT-JOIN-broadcast(result)
    plan both paid an extra broadcast-build job re-executing the
    aggregation AND carried that OOM).  Left to AQE, the runtime choice is
    exactly right: a small aggregate gets broadcast from its actual
    runtime size, a huge one falls back to a shuffled join that scales.
    """
    return result.join(expected_df, on=list(key_names), how="right_outer")
