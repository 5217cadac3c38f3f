"""groupby_rank vs pandas GroupBy.rank (methods × ascending × pct, NaNs kept)."""

import math

import numpy as np
import pandas as pd
import pytest

from dask_groupby_spark import groupby_rank

SEED = 1234
N = 120


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(SEED)
    labels = rng.integers(0, 5, N)
    vals = np.round(rng.random(N) * 5, 1)  # coarse grid → plenty of ties
    vals[rng.random(N) < 0.15] = np.nan
    return labels, vals


@pytest.fixture(scope="module")
def sdf(spark, data):
    labels, vals = data
    rows = [(i, int(labels[i]), float(vals[i])) for i in range(N)]
    return spark.createDataFrame(rows, "idx bigint, label bigint, val double")


@pytest.mark.parametrize("method", ["average", "min", "max", "dense", "first"])
@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("pct", [False, True])
def test_rank_vs_pandas(sdf, data, method, ascending, pct):
    labels, vals = data
    pdf = pd.DataFrame({"label": labels, "val": vals})
    exp = pdf.groupby("label")["val"].rank(
        method=method, ascending=ascending, pct=pct
    )
    out = groupby_rank(
        sdf, "label", value="val", method=method, ascending=ascending, pct=pct,
        idx_col="idx",
    )
    got = {r["idx"]: r["rank"] for r in out.collect()}
    for i in range(N):
        e = exp.iloc[i]
        g = got[i]
        if isinstance(e, float) and math.isnan(e):
            assert g is None, (i, g)
        else:
            assert g is not None and math.isclose(float(g), float(e)), (i, g, e)


def test_rank_errors(sdf):
    with pytest.raises(ValueError, match="unknown method"):
        groupby_rank(sdf, "label", value="val", method="median")
    with pytest.raises(ValueError, match="requires idx_col"):
        groupby_rank(sdf, "label", value="val", method="first")


def test_rank_shape_and_plan(sdf):
    for method in ("min", "average"):
        out = groupby_rank(sdf, "label", value="val", method=method)
        assert out.count() == N
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, f"{method}: extra shuffle\n{plan}"
