"""Row-selection operators for training-data pipelines: per-group top-k,
batch sessionization, deterministic per-group sampling.

No flox counterpart (the reference has no sorts/limits/top-k over data,
SURVEY.md §2.4) — these are Spark-native surface extensions, all expressed
as window functions so Catalyst owns partitioning and AQE handles skew.

Scale notes: each operator is one shuffle on the group keys.  Per-group
top-k with tiny k over huge groups still sorts each group; if that becomes
the bottleneck, pre-filter with an approx threshold (approx_quantile) before
ranking — the two-pass trick — which these building blocks compose into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hasher


def grouped_topk(
    df: DataFrame,
    *by: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows per group ordered by ``order_col`` (e.g. the
    k highest-quality documents per domain).  ``tiebreak`` (an id column)
    makes the cut deterministic when order values collide.
    """
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    *by: str,
    ts_col: str,
    gap: float,
    out: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap to
    the previous event of the same key exceeds ``gap`` seconds — the batch
    analog of ``streaming.session_reduce`` (F.session_window), as two window
    expressions (lag → boundary flag → running sum).

    Output: input columns + ``out`` (0-based session index per key).
    """
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    ts = F.col(ts_col).cast("double")
    prev = F.lag(ts).over(w)
    boundary = F.when(prev.isNull() | ((ts - prev) > gap), 1).otherwise(0)
    running = Window.partitionBy(*by).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, (F.sum(boundary).over(running) - 1).cast("bigint"))


def sample_per_group(
    df: DataFrame,
    *by: str,
    n: int,
    id_col: str,
    seed: str = "sample",
    hasher: str = "fast",
) -> DataFrame:
    """Deterministic pseudo-random sample of ``n`` rows per group: rows are
    ranked by a seeded hash of their id (uniform, reproducible across runs
    and engines with ``hasher="portable"``) and the first ``n`` kept — the
    standard downsampling step when balancing a training mix.
    """
    h = _hasher(hasher)(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(*by).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
