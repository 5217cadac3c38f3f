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


def test_r7_ops_repartition_invariance(spark):
    """Spark == itself under adversarial repartitioning for the r7-era
    operators (the analog of the reference's dask-rechunking sweep):
    bm25, leakage_safe_split, groupby_interpolate, and near_deduplicate
    with keep_by must not depend on physical row placement."""
    import numpy as np

    from dask_groupby_spark.core import groupby_interpolate
    from dask_groupby_spark.operators.curate import leakage_safe_split
    from dask_groupby_spark.operators.dedup import near_deduplicate
    from dask_groupby_spark.operators.text import bm25_scores

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "spark", "hash"]
    docs_rows = [
        (i, " ".join(rng.choice(words, 12)), float(rng.integers(0, 100)))
        for i in range(80)
    ]
    # plant near-duplicate pairs so clustering has real work
    docs_rows += [(100 + i, docs_rows[i][1] + " tail", 1.0) for i in range(10)]
    base = spark.createDataFrame(docs_rows, "doc_id bigint, text string, q double")

    def runs(fn):
        outs = []
        for n in (1, 7):
            outs.append(sorted(map(tuple, fn(base.repartition(n)).collect())))
        assert outs[0] == outs[1], fn
        return outs[0]

    runs(lambda d: bm25_scores(d, ["spark", "hash"]).select("doc_id", "dl", "bm25"))
    runs(
        lambda d: near_deduplicate(
            d, num_hashes=8, bands=4, keep_by="q"
        ).select("doc_id")
    )

    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    def leak(d):
        pairs = lsh_candidate_pairs(
            minhash_signatures(d, "doc_id", "text", 8, 3), 8, 4
        )
        return leakage_safe_split(d, pairs, 0.3).select(
            "doc_id", "cluster_id", "split"
        )

    runs(leak)

    ev_rows = [
        (int(i % 3), float(i * 7 % 50), float(i) if i % 4 else None, int(i))
        for i in range(60)
    ]
    ev = spark.createDataFrame(ev_rows, "k bigint, x double, v double, rid bigint")
    runs2 = []
    for n in (1, 5):
        out = groupby_interpolate(
            ev.repartition(n), "k", value="v", order_by=["x", "rid"], out="iv"
        )
        runs2.append(sorted((r["rid"], r["iv"]) for r in out.collect()))
    assert runs2[0] == runs2[1]
