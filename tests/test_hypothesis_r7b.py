"""Second r7 parity batch: resample vs pandas.resample and sessionize vs
a direct python gap walk — randomized inputs, one collect per example.
(Separate file so the first batch's hypothesis example database stays
keyed to stable test ids.)
"""

import datetime as dt
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_groupby_spark.operators.selection import sessionize
from dask_groupby_spark.resample import resample

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 1)


@st.composite
def ts_series(draw):
    n = draw(st.integers(1, 25))
    # distinct timestamps (minute grid over ~3 days)
    mins = draw(st.permutations(list(range(0, 4000, 7))))[:n]
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e4, 1e4, allow_nan=False), st.just(float("nan"))
            ),
            min_size=n,
            max_size=n,
        )
    )
    keys = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    return mins, vals, keys


@settings(**_SETTINGS)
@given(data=ts_series(), every=st.sampled_from(["6 hours", "1 day"]))
def test_resample_matches_pandas(spark, data, every):
    mins, vals, _ = data
    rows = [
        (_BASE + dt.timedelta(minutes=m), float(v)) for m, v in zip(mins, vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    got = {
        r["bucket"]: r["nanmean"]
        for r in resample(df, "ts", every, "nanmean", "v").collect()
    }
    freq = {"6 hours": "6h", "1 day": "1D"}[every]
    pdf = pd.DataFrame(rows, columns=["ts", "v"]).set_index("ts")
    exp = pdf["v"].resample(freq).mean().dropna(how="all")
    # pandas emits empty buckets inside the span; the engine (dense=False)
    # emits only observed buckets — compare on the engine's bucket set,
    # and every all-NaN observed bucket must be NaN on both sides
    for bucket, g in got.items():
        e = exp.get(pd.Timestamp(bucket))
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert e is None or (isinstance(e, float) and math.isnan(e)), (
                bucket, g, e,
            )
        else:
            assert e is not None and abs(g - e) <= 1e-9 * max(1.0, abs(e)), (
                bucket, g, e,
            )
    # no observed bucket may be missing from the engine output
    obs = {
        pd.Timestamp(_BASE + dt.timedelta(minutes=m)).floor(freq)
        for m, v in zip(mins, vals)
    }
    assert {pd.Timestamp(b) for b in got} == obs


@settings(**_SETTINGS)
@given(data=ts_series(), gap_min=st.sampled_from([15, 60, 360]))
def test_sessionize_matches_python_walk(spark, data, gap_min):
    mins, vals, keys = data
    rows = [
        (int(k), _BASE + dt.timedelta(minutes=m), float(i))
        for i, (k, m) in enumerate(zip(keys, mins))
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, rid double")
    got = {
        r["rid"]: r["session_id"]
        for r in sessionize(df, "k", ts_col="ts", gap=gap_min * 60.0).collect()
    }
    by_key: dict = {}
    for k, ts, rid in rows:
        by_key.setdefault(k, []).append((ts, rid))
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = -1, None
        for ts, rid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_min * 60.0:
                sid += 1
            prev = ts
            assert got[rid] == sid, (k, rid, got[rid], sid)
