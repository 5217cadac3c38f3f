"""F1 golden tests (ref: flox/tests/test_core.py:119-157 hand-computed
expecteds): sum by label = [3,4,5]; sum by label_nan = [1,4,2]; count
likewise; nanmean = [1,1,1]."""

import math

from pyspark.sql import functions as F

from dask_groupby_spark import groupby_reduce

from .conftest import collect_map


def test_sum_by_label(f1):
    out = groupby_reduce(f1, "label", func="nansum", value="val_ones")
    assert collect_map(out, "label", "nansum") == {0: 3.0, 1: 4.0, 2: 5.0}


def test_sum_by_label_nan_excluded(f1):
    out = groupby_reduce(f1, "label_nan", func="nansum", value="val_ones")
    assert collect_map(out, "label_nan", "nansum") == {0: 1.0, 1: 4.0, 2: 2.0}


def test_count(f1):
    out = groupby_reduce(f1, "label", func="count", value="val_ones")
    assert collect_map(out, "label", "count") == {0: 3, 1: 4, 2: 5}


def test_nanmean(f1):
    out = groupby_reduce(f1, "label", func="nanmean", value="val_ones")
    assert collect_map(out, "label", "nanmean") == {0: 1.0, 1: 1.0, 2: 1.0}


def test_groupby_agg_expected_groups_fill(f1):
    from dask_groupby_spark import groupby_agg

    out = groupby_agg(
        f1,
        "label",
        funcs=[("nansum", "val_ones", "s"), ("count", "val_ones", "c"),
               ("nanmean", "val_ones", "m")],
        expected_groups=[0, 1, 2, 3],
    )
    rows = {r["label"]: (r["s"], r["c"], r["m"]) for r in out.collect()}
    assert rows[0] == (3.0, 3, 1.0)
    # absent group: per-func final_fill (count→0) or dtype NA (nansum/nanmean
    # default to NA like the reference's final_fill_value, core.py:1144-1177)
    s3, c3, m3 = rows[3]
    assert c3 == 0
    assert math.isnan(s3) and math.isnan(m3)


def test_skipna_rewrites_to_nan_variant(f1):
    # skipna=True dispatches sum→nansum (ref flox/xarray.py:355-380); the
    # output column keeps the rewritten name
    out = groupby_reduce(f1, "label", func="sum", value="val_ones", skipna=True)
    assert collect_map(out, "label", "nansum") == {0: 3.0, 1: 4.0, 2: 5.0}
    out2 = groupby_reduce(f1, "label", func="nansum", value="val_ones", skipna=False)
    assert "sum" in out2.columns


def test_expected_groups_fill(f1):
    out = groupby_reduce(
        f1,
        "label",
        func="nansum",
        value="val_ones",
        expected_groups=[0, 1, 2, 3],
        fill_value=123.0,
    )
    m = collect_map(out, "label", "nansum")
    assert m == {0: 3.0, 1: 4.0, 2: 5.0, 3: 123.0}


def test_expected_groups_na_fill_promotes(f1):
    # int sum filled with NA → double NaN (ref flox/core.py:707-711)
    out = groupby_reduce(
        f1, "label", func="nansum", value="val_int", expected_groups=[0, 1, 2, 3]
    )
    assert dict(out.dtypes)["nansum"] == "double"
    m = collect_map(out, "label", "nansum")
    assert m[0] == 3.0 and math.isnan(m[3])


def test_int_sum_type_promotion(spark):
    df = spark.createDataFrame([(0, 1), (0, 2), (1, 3)], "label bigint, value int")
    out = groupby_reduce(df, "label", func="nansum")
    assert dict(out.dtypes)["nansum"] == "bigint"


def test_sort_order(f1):
    out = groupby_reduce(f1, "label", func="count", value="val_ones", sort=True)
    assert [r["label"] for r in out.collect()] == [0, 1, 2]


def test_datetime_binning(spark):
    """Binning by timestamp edges (ref: flox test_core.py:1208 datetime
    bins): F.lit(datetime) edges compile to timestamp literals, same
    closed-side semantics as numeric bins."""
    import datetime as dt

    from dask_groupby_spark import Bins

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i), float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "idx bigint, ts timestamp, val double")
    edges = [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 4)]
    out = groupby_reduce(
        df, "ts", func="count", value="val",
        expected_groups=Bins(edges, closed="left"), fill_value=0,
    )
    got = {r["ts_bin"]: r["count"] for r in out.collect()}
    # [Jan1, Jan2): hours 0,6,12,18 → 4 rows; [Jan2, Jan4): the other 8
    assert got == {0: 4, 1: 8}


def test_multi_by_expected_groups_cross_product(spark):
    """tuple of expected lists → dense cross-product grid with fill
    (ref: _factorize_multiple cross grid, flox/core.py:2115-2166)."""
    rows = [(0, "x", 1.0), (0, "y", 2.0), (1, "x", 3.0)]
    df = spark.createDataFrame(rows, "a bigint, b string, val double")
    out = groupby_reduce(
        df, "a", "b", func="nansum", value="val",
        expected_groups=([0, 1, 2], ["x", "y"]), fill_value=0.0,
    )
    got = {(r["a"], r["b"]): r["nansum"] for r in out.collect()}
    assert len(got) == 6  # 3 × 2 grid
    assert got[(0, "x")] == 1.0 and got[(0, "y")] == 2.0 and got[(1, "x")] == 3.0
    assert got[(1, "y")] == 0.0 and got[(2, "x")] == 0.0 and got[(2, "y")] == 0.0


def test_multi_by_bins_plus_list(spark):
    """mixed groupers: Bins for one key + explicit list for the other."""
    from dask_groupby_spark import Bins

    rows = [(5.0, "p", 1.0), (15.0, "p", 2.0), (5.0, "q", 4.0)]
    df = spark.createDataFrame(rows, "x double, k string, val double")
    out = groupby_reduce(
        df, "x", "k", func="count", value="val",
        expected_groups=(Bins([0.0, 10.0, 20.0]), ["p", "q"]), fill_value=0,
    )
    got = {(r["x_bin"], r["k"]): r["count"] for r in out.collect()}
    assert got == {(0, "p"): 1, (0, "q"): 1, (1, "p"): 1, (1, "q"): 0}


def test_multi_by_partial_expected(spark):
    """mixed: expected list for one grouper, discovery for the other —
    grid = given × observed (ref flox core.py:2087-2107)."""
    rows = [(0, "x", 1.0), (1, "y", 2.0)]
    df = spark.createDataFrame(rows, "a bigint, b string, val double")
    out = groupby_reduce(
        df, "a", "b", func="count", value="val",
        expected_groups=([0, 1, 2], None), fill_value=0,
    )
    got = {(r["a"], r["b"]): r["count"] for r in out.collect()}
    assert len(got) == 6  # [0,1,2] × observed {x,y}
    assert got[(0, "x")] == 1 and got[(1, "y")] == 1
    assert got[(2, "x")] == 0 and got[(2, "y")] == 0 and got[(0, "y")] == 0


def test_datetime_accessor_grouper(spark):
    """flox/xarray parity: group by "ts.month" via virtual datetime
    accessors (xarray's groupby("time.month")) — the accessor compiles to a
    map-side expression and names the key column after the accessor."""
    import datetime as dt

    from dask_groupby_spark import groupby_reduce

    rows = [
        (dt.datetime(2024, 1, 5), 1.0),
        (dt.datetime(2024, 1, 20), 2.0),
        (dt.datetime(2024, 3, 2), 10.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = groupby_reduce(df, "ts.month", func="nansum", value="v").collect()
    assert {(r["month"], r["nansum"]) for r in out} == {(1, 3.0), (3, 10.0)}

    # two accessors from the same timestamp column
    out2 = groupby_reduce(df, "ts.year", "ts.dayofyear", func="count", value="v").collect()
    assert {(r["year"], r["dayofyear"], r["count"]) for r in out2} == {
        (2024, 5, 1), (2024, 20, 1), (2024, 62, 1)
    }


def test_datetime_accessor_dayofweek_pandas_convention(spark):
    """ADVICE r2: ts.dayofweek must use the pandas/xarray Monday=0..Sunday=6
    convention, not Spark's Sunday=1..7."""
    import datetime as dt

    import pandas as pd

    from dask_groupby_spark import groupby_reduce

    days = [dt.datetime(2026, 8, d) for d in range(9, 17)]  # Sun..Sun
    df = spark.createDataFrame([(d, 1.0) for d in days], "ts timestamp, v double")
    for acc in ("dayofweek", "weekday"):
        out = groupby_reduce(df, f"ts.{acc}", func="count", value="v").collect()
        got = {r[acc]: r["count"] for r in out}
        exp = pd.Series(1, index=pd.DatetimeIndex(days)).groupby(
            pd.DatetimeIndex(days).dayofweek
        ).count().to_dict()
        assert got == exp, (acc, got, exp)


def test_datetime_accessor_unknown_raises(spark):
    import datetime as dt

    import pytest

    from dask_groupby_spark import groupby_reduce

    df = spark.createDataFrame([(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, v double")
    with pytest.raises(ValueError, match="accessor"):
        groupby_reduce(df, "ts.fortnight", func="count", value="v")


def test_groupby_describe_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    from dask_groupby_spark import groupby_describe

    rng = np.random.default_rng(808)
    n = 150
    labels = rng.integers(0, 4, n)
    vals = rng.random(n) * 100
    vals[rng.random(n) < 0.1] = np.nan
    df = spark.createDataFrame(
        [(int(labels[i]), float(vals[i])) for i in range(n)], "k bigint, value double"
    )
    out = {r["k"]: r for r in groupby_describe(df, "k").collect()}
    pdf = pd.DataFrame({"k": labels, "value": vals})
    exp = pdf.groupby("k")["value"].describe()
    import math
    for k in range(4):
        e = exp.loc[k]
        g = out[k]
        assert g["count"] == int(e["count"])
        for ours, theirs in [("mean", "mean"), ("std", "std"), ("min", "min"),
                             ("p25", "25%"), ("p50", "50%"), ("p75", "75%"),
                             ("max", "max")]:
            assert math.isclose(g[ours], e[theirs], rel_tol=1e-9), (k, ours)
    # one fused aggregate: a single Exchange in the plan
    plan = groupby_describe(df, "k", sort=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_groupby_fill_stat_and_winsorize_vs_pandas(spark):
    import math

    import numpy as np
    import pandas as pd

    from dask_groupby_spark.core import groupby_fill_stat, groupby_winsorize

    rng = np.random.default_rng(1701)
    n = 120
    labels = rng.integers(0, 3, n)
    vals = rng.random(n) * 100
    vals[rng.random(n) < 0.2] = np.nan
    df = spark.createDataFrame(
        [(i, int(labels[i]), float(vals[i])) for i in range(n)],
        "idx bigint, k bigint, x double",
    )
    pdf = pd.DataFrame({"k": labels, "x": vals})

    filled = {r["idx"]: r["x"] for r in
              groupby_fill_stat(df, "k", value="x", func="nanmean").collect()}
    exp_fill = pdf["x"].fillna(pdf.groupby("k")["x"].transform("mean"))
    for i in range(n):
        assert math.isclose(filled[i], exp_fill.iloc[i], rel_tol=1e-12)

    wz = {r["idx"]: r["x"] for r in
          groupby_winsorize(df, "k", value="x", lower=0.1, upper=0.9).collect()}
    for k in range(3):
        s = pdf[pdf.k == k]["x"].dropna()
        lo, hi = s.quantile(0.1), s.quantile(0.9)
        exp = pdf[pdf.k == k]["x"].clip(lo, hi)
        for idx, e in exp.items():
            g = wz[idx]
            if isinstance(e, float) and math.isnan(e):
                assert math.isnan(g)
            else:
                assert math.isclose(g, e, rel_tol=1e-12), (k, idx)
    # single Exchange each
    for fn in (
        lambda: groupby_fill_stat(df, "k", value="x"),
        lambda: groupby_winsorize(df, "k", value="x"),
    ):
        plan = fn()._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


def test_bins_rejects_misordered_edges():
    import pytest as _pytest

    from dask_groupby_spark import Bins

    with _pytest.raises(ValueError, match="strictly increasing"):
        Bins((0, 10, 5))
    with _pytest.raises(ValueError, match="strictly increasing"):
        Bins((0, 0, 5))
