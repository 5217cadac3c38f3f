"""resample (time-bucket reduce) vs pandas resample oracle."""

import datetime as dt
import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from dask_groupby_spark.resample import resample


def _fixture():
    rng = np.random.RandomState(3)
    base = dt.datetime(2024, 1, 1)
    # irregular timestamps over ~40 days with a 9-day hole (days 12..20)
    offs = sorted(
        float(o)
        for o in rng.uniform(0, 40 * 86400, 120)
        if not (12 * 86400 < o < 21 * 86400)
    )
    pdf = pd.DataFrame(
        {
            "ts": [base + dt.timedelta(seconds=o) for o in offs],
            "v": rng.randn(len(offs)) * 5,
        }
    )
    return pdf


def test_resample_5d_nansum_matches_pandas(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    out = resample(df, "ts", "5 days", "nansum", "v").collect()
    got = {r["bucket"]: r["nansum"] for r in out}
    exp = pdf.set_index("ts")["v"].resample("5D", origin="epoch").sum()
    exp = exp[exp.index.isin(got)]  # pandas emits empty buckets; sparse path doesn't
    for k, v in exp.items():
        assert abs(got[k.to_pydatetime()] - v) < 1e-9


def test_resample_dense_fills_gap(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    out = resample(df, "ts", "5 days", "nanmean", "v", dense=True).collect()
    got = {r["bucket"]: r["nanmean"] for r in out}
    exp = pdf.set_index("ts")["v"].resample("5D", origin="epoch").mean()
    assert set(got) == {k.to_pydatetime() for k in exp.index}
    for k, v in exp.items():
        g = got[k.to_pydatetime()]
        if math.isnan(v):
            assert math.isnan(g)  # empty bucket → dtype NA (NaN)
        else:
            assert abs(g - v) < 1e-9


def test_resample_calendar_month(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    out = resample(df, "ts", "month", "count", "v").collect()
    got = {r["bucket"]: r["count"] for r in out}
    exp = pdf.set_index("ts")["v"].resample("MS").count()
    exp = exp[exp > 0]
    assert got == {k.to_pydatetime(): int(v) for k, v in exp.items()}


def test_resample_extra_key(spark):
    rows = [
        (dt.datetime(2024, 1, 1, h), "a" if h % 2 == 0 else "b", float(h))
        for h in range(12)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = resample(df, "ts", "6 hours", "nansum", "v", "k").collect()
    got = {(r["bucket"].hour, r["k"]): r["nansum"] for r in out}
    assert got == {
        (0, "a"): 0 + 2 + 4, (0, "b"): 1 + 3 + 5,
        (6, "a"): 6 + 8 + 10, (6, "b"): 7 + 9 + 11,
    }


def test_resample_dense_extra_key_full_grid(spark):
    import datetime as dt

    # key "b" appears only on day 1, key "a" only on days 1 and 3; day 2 is
    # empty entirely — dense=True must emit the FULL 3-day × 2-key grid
    rows = [
        (dt.datetime(2024, 1, 1, 1), "a", 1.0),
        (dt.datetime(2024, 1, 1, 2), "b", 2.0),
        (dt.datetime(2024, 1, 3, 5), "a", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = resample(df, "ts", "1 day", "nansum", "v", "k",
                   dense=True, fill_value=0.0).collect()
    got = {(r["bucket"].day, r["k"]): r["nansum"] for r in out}
    assert got == {
        (1, "a"): 1.0, (1, "b"): 2.0,
        (2, "a"): 0.0, (2, "b"): 0.0,
        (3, "a"): 4.0, (3, "b"): 0.0,
    }
    # no NULL-key rows (the pre-fix degraded behavior)
    assert all(r["k"] is not None for r in out)
