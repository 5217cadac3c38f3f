"""groupby_rolling vs pandas GroupBy.rolling oracle."""

import math

import numpy as np
import pandas as pd
import pytest

from dask_groupby_spark.rolling import groupby_rolling


def _fixture():
    rng = np.random.RandomState(7)
    n = 40
    pdf = pd.DataFrame(
        {
            "g": rng.randint(0, 3, n),
            "idx": np.arange(n),
            "v": rng.randn(n) * 10,
        }
    )
    pdf.loc[pdf.index % 7 == 3, "v"] = np.nan
    return pdf


def _cmp(a, b):
    if math.isnan(b):
        assert math.isnan(a)
    else:
        assert abs(a - b) < 1e-9, (a, b)


@pytest.mark.parametrize("func", ["count", "sum", "mean", "min", "max", "var", "std"])
def test_rolling_matches_pandas(spark, func):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    out = groupby_rolling(
        df, "g", funcs=func, value="v", idx_col="idx", window=4, min_periods=2
    )
    got = {r["idx"]: r[f"rolling_{func}"] for r in out.collect()}
    roll = pdf.groupby("g")["v"].rolling(window=4, min_periods=2)
    exp_series = getattr(roll, func)().reset_index(level=0, drop=True)
    for idx, exp in exp_series.items():
        got_v = got[pdf.loc[idx, "idx"]]
        # pandas count with min_periods returns NaN below threshold too
        _cmp(got_v, float(exp))


def test_rolling_multiple_funcs_one_pass(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    out = groupby_rolling(
        df, "g", funcs=("sum", "mean", "count"), value="v", idx_col="idx", window=3
    )
    assert {"rolling_sum", "rolling_mean", "rolling_count"} <= set(out.columns)
    # one shuffle: a single Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_rolling_range_frame(spark):
    # time-interval frame: values within [idx-5, idx] (inclusive)
    rows = [(0, 0, 1.0), (0, 3, 2.0), (0, 10, 4.0), (0, 12, 8.0)]
    df = spark.createDataFrame(rows, "g bigint, idx bigint, v double")
    out = groupby_rolling(
        df, "g", funcs="sum", value="v", idx_col="idx", window=1,
        range_between=(-5, 0),
    )
    got = {r["idx"]: r["rolling_sum"] for r in out.collect()}
    assert got == {0: 1.0, 3: 3.0, 10: 4.0, 12: 12.0}


def test_rolling_internal_collision_guard(spark):
    import pytest as _pytest

    from dask_groupby_spark.rolling import groupby_rolling

    df = spark.createDataFrame(
        [(1, 1, 1.0, 0.0)], "k bigint, i bigint, v double, __ro_n double"
    )
    with _pytest.raises(ValueError, match="__ro_"):
        groupby_rolling(df, "k", funcs="mean", value="v", idx_col="i", window=2)
