"""Grouped-scan tests vs per-group numpy loops (mirrors
flox/tests/test_properties.py:183-249 test_scans / ffill-bfill duality)."""

import math

import numpy as np
import pytest

from dask_groupby_spark import groupby_scan

SEED = 777
N = 40


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(SEED)
    labels = rng.integers(0, 4, N)
    vals = rng.random(N) * 10
    # NaN runs: leading NaNs for group 0, whole group 3 NaN, scattered
    vals[[0, 1, 7, 20, 21, 22]] = np.nan
    vals[labels == 3] = np.nan
    return labels, vals


@pytest.fixture(scope="module")
def sdf(spark, data):
    labels, vals = data
    rows = [(i, int(labels[i]), float(vals[i])) for i in range(N)]
    return spark.createDataFrame(rows, "idx bigint, label bigint, val double")


def np_scan(func, vals, labels):
    out = np.full(N, np.nan)
    for k in set(labels):
        sel = np.flatnonzero(labels == k)
        g = vals[sel]
        if func == "nancumsum":
            out[sel] = np.nancumsum(g)
        elif func == "cumsum":
            out[sel] = np.cumsum(g)
        elif func == "nancumprod":
            out[sel] = np.nancumprod(g)
        elif func == "cumprod":
            out[sel] = np.cumprod(g)
        elif func == "ffill":
            r = g.copy()
            for i in range(1, len(r)):
                if math.isnan(r[i]):
                    r[i] = r[i - 1]
            out[sel] = r
        elif func == "bfill":
            r = g.copy()
            for i in range(len(r) - 2, -1, -1):
                if math.isnan(r[i]):
                    r[i] = r[i + 1]
            out[sel] = r
        elif func == "cummax":
            out[sel] = np.maximum.accumulate(g)
        elif func == "nancummax":
            out[sel] = np.fmax.accumulate(g)
        elif func == "cummin":
            out[sel] = np.minimum.accumulate(g)
        elif func == "nancummin":
            out[sel] = np.fmin.accumulate(g)
        elif func == "cumcount":
            out[sel] = np.cumsum(~np.isnan(g))
        elif func == "diff":
            r = np.full(len(g), np.nan)
            r[1:] = g[1:] - g[:-1]
            out[sel] = r
    return out


def eq(a, b):
    if a is None:
        a = float("nan")
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return abs(a - b) <= 1e-10 * max(1.0, abs(a), abs(b))


@pytest.mark.parametrize(
    "func",
    [
        "nancumsum",
        "cumsum",
        "nancumprod",
        "cumprod",
        "ffill",
        "bfill",
        "cummax",
        "nancummax",
        "cummin",
        "nancummin",
        "cumcount",
        "diff",
    ],
)
def test_scan_vs_numpy(sdf, data, func):
    labels, vals = data
    out = groupby_scan(sdf, "label", func=func, value="val", idx_col="idx")
    got = {r["idx"]: r[func] for r in out.collect()}
    exp = np_scan(func, vals, labels)
    for i in range(N):
        assert eq(got[i], exp[i]), f"{func} @ {i}: {got[i]} vs {exp[i]}"


def test_ffill_bfill_reverse_duality(sdf, data):
    """ffill(x) == reverse(bfill(reverse(x))) (ref test_properties.py:230-249)."""
    labels, vals = data
    ff = {r["idx"]: r["ffill"] for r in groupby_scan(sdf, "label", func="ffill", value="val", idx_col="idx").collect()}
    rev = sdf.withColumn("ridx", -sdf.idx)
    bf = {r["idx"]: r["bfill"] for r in groupby_scan(rev, "label", func="bfill", value="val", idx_col="idx").collect()}
    # bfill over normal order == ffill over reversed order
    rf = {r["idx"]: r["ffill"] for r in groupby_scan(rev, "label", func="ffill", value="val", idx_col="ridx").collect()}
    bfn = {r["idx"]: r["bfill"] for r in groupby_scan(sdf, "label", func="bfill", value="val", idx_col="idx").collect()}
    for i in range(N):
        assert eq(rf[i], bfn[i])


def test_diff_periods_and_int_dtype(spark):
    """diff periods=2 / negative periods; int input stays integral with NULL vacancy."""
    rows = [(i, i % 2, [3, 1, 4, 1, 5, 9, 2, 6][i]) for i in range(8)]
    df = spark.createDataFrame(rows, "idx bigint, label bigint, val bigint")
    out2 = {
        r["idx"]: r["diff"]
        for r in groupby_scan(
            df, "label", func="diff", value="val", idx_col="idx",
            finalize_kwargs={"periods": 2},
        ).collect()
    }
    # group 0 rows (idx 0,2,4,6): vals 3,4,5,2 → diff2: None,None,2,-2
    assert out2[0] is None and out2[2] is None
    assert out2[4] == 2 and out2[6] == -2
    outm1 = {
        r["idx"]: r["diff"]
        for r in groupby_scan(
            df, "label", func="diff", value="val", idx_col="idx",
            finalize_kwargs={"periods": -1},
        ).collect()
    }
    # negative periods: x - lead(x); group 0: 3-4, 4-5, 5-2, None
    assert outm1[0] == -1 and outm1[2] == -1 and outm1[4] == 3 and outm1[6] is None
    dt = dict(groupby_scan(
        df, "label", func="diff", value="val", idx_col="idx"
    ).dtypes)["diff"]
    assert dt == "bigint"


def test_scan_shape_preserved(sdf):
    out = groupby_scan(sdf, "label", func="nancumsum", value="val", idx_col="idx")
    assert out.count() == sdf.count()
    assert set(sdf.columns) <= set(out.columns)


def test_scan_multi_key(spark):
    # two group keys: window partitions on the pair
    rows = [
        (0, "a", 1, 1.0), (1, "a", 1, 2.0), (2, "a", 2, 10.0),
        (3, "b", 1, 5.0), (4, "a", 2, 20.0),
    ]
    df = spark.createDataFrame(rows, "idx bigint, k1 string, k2 bigint, val double")
    out = groupby_scan(df, "k1", "k2", func="nancumsum", value="val", idx_col="idx")
    got = {r["idx"]: r["nancumsum"] for r in out.collect()}
    assert got == {0: 1.0, 1: 3.0, 2: 10.0, 3: 5.0, 4: 30.0}


def test_scan_null_label_passthrough(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, None, 2.0), (2, 1, 3.0)], "idx bigint, label bigint, val double"
    )
    out = {r["idx"]: r["nancumsum"] for r in
           groupby_scan(df, "label", func="nancumsum", value="val", idx_col="idx").collect()}
    assert out[0] == 1.0 and out[2] == 4.0
    assert out[1] is None or math.isnan(out[1])


@pytest.mark.parametrize("periods", [1, 2, -1])
def test_scan_shift_vs_pandas(sdf, data, periods):
    import pandas as pd

    labels, vals = data
    out = groupby_scan(
        sdf, "label", func="shift", value="val", idx_col="idx",
        finalize_kwargs={"periods": periods},
    )
    got = {r["idx"]: r["shift"] for r in out.collect()}
    pdf = pd.DataFrame({"label": labels, "val": vals})
    exp = pdf.groupby("label")["val"].shift(periods)
    for i in range(N):
        assert eq(got[i], float(exp.iloc[i]) if not pd.isna(exp.iloc[i]) else float("nan")), (
            periods, i, got[i], exp.iloc[i],
        )


def test_scan_accessor_grouper(spark):
    import datetime as dt

    from dask_groupby_spark import groupby_scan

    rows = [
        (1, dt.datetime(2024, 1, 2), 1.0),
        (2, dt.datetime(2024, 1, 9), 2.0),
        (3, dt.datetime(2024, 2, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "idx bigint, ts timestamp, v double")
    out = groupby_scan(df, "ts.month", func="nancumsum", value="v", idx_col="idx").collect()
    got = {r["idx"]: (r["month"], r["nancumsum"]) for r in out}
    assert got == {1: (1, 1.0), 2: (1, 3.0), 3: (2, 5.0)}
