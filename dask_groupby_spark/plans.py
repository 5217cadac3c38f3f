"""Physical-layout helpers: the Spark analogs of the reference's rechunking
pre-optimizers, plus plan-inspection utilities used by tests/benchmarks.

- :func:`rechunk_for_blockwise` ≈ flox.rechunk_for_blockwise
  (flox/core.py:634-664): lay data out so each group lives in one partition,
  letting a subsequent groupBy aggregate without a (second) shuffle.  In
  Spark terms: ``repartition(cols)`` — the shuffle is *moved*, not removed,
  but it is paid once and reused by every downstream grouped op on the same
  keys (Exchange reuse / AQE elision).
- The reference's ``rechunk_for_cohorts`` (flox/core.py:540-631) has no
  analog on purpose: cohort detection is a dask-topology optimization that
  Spark's key-routed shuffle subsumes (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rechunk_for_blockwise(df: DataFrame, *by: str, partitions: int | None = None) -> DataFrame:
    """Pre-partition by group keys so later grouped ops on the same keys
    avoid an extra Exchange (ref: flox/core.py:634-664)."""
    if partitions:
        return df.repartition(partitions, *by)
    return df.repartition(*by)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (for plan-shape assertions in tests)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_single_shuffle(df: DataFrame) -> None:
    """Assert the plan contains at most one Exchange below the final agg —
    the shape we expect from partial→final hash aggregation."""
    plan = physical_plan(df)
    n = plan.count("Exchange")
    if n > 2:  # final sort may add one
        raise AssertionError(f"unexpected shuffle count {n} in plan:\n{plan}")
