"""Hypothesis property tests — the direct analog of the reference's layer-2
strategy (flox/tests/test_properties.py + strategies.py): generated inputs,
shrinking counterexamples, pandas per-group loop as the oracle.

Kept to one Spark collect() per example (all funcs fused through
groupby_agg) so the suite stays fast.
"""

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_groupby_spark import groupby_agg, groupby_scan

FUNCS = ["count", "nansum", "nanmean", "nanmin", "nanmax", "nunique"]


@st.composite
def grouped_data(draw):
    n = draw(st.integers(1, 40))
    labels = draw(
        st.lists(st.integers(0, 4), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e6, 1e6, allow_nan=False),
                st.just(float("nan")),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return labels, vals


def pandas_oracle(labels, vals):
    pdf = pd.DataFrame({"label": labels, "val": vals})
    out = {}
    for lab, g in pdf.groupby("label"):
        v = g["val"].to_numpy()
        valid = v[~np.isnan(v)]
        out[lab] = {
            "count": len(valid),
            "nansum": float(valid.sum()) if True else None,
            "nanmean": float(valid.mean()) if len(valid) else float("nan"),
            "nanmin": float(valid.min()) if len(valid) else float("nan"),
            "nanmax": float(valid.max()) if len(valid) else float("nan"),
            "nunique": len(np.unique(valid)),
        }
    return out


def close(a, b):
    if a is None:
        a = float("nan")
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
    return a == b


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=grouped_data())
def test_fused_reductions_match_pandas(spark, data):
    labels, vals = data
    rows = [(int(l), float(v)) for l, v in zip(labels, vals)]
    df = spark.createDataFrame(rows, "label bigint, val double")
    out = groupby_agg(df, "label", funcs=[(f, "val", f) for f in FUNCS])
    oracle = pandas_oracle(labels, vals)
    got = {r["label"]: r for r in out.collect()}
    assert set(got) == set(oracle)
    for lab, exp in oracle.items():
        for f in FUNCS:
            assert close(got[lab][f], exp[f]), (lab, f, got[lab][f], exp[f])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=grouped_data())
def test_scan_cumsum_matches_pandas(spark, data):
    labels, vals = data
    rows = [(int(i), int(l), float(v)) for i, (l, v) in enumerate(zip(labels, vals))]
    df = spark.createDataFrame(rows, "idx bigint, label bigint, val double")
    out = groupby_scan(df, "label", func="nancumsum", value="val", idx_col="idx")
    got = {r["idx"]: r["nancumsum"] for r in out.collect()}
    pdf = pd.DataFrame({"idx": range(len(labels)), "label": labels, "val": vals})
    exp_series = pdf.groupby("label")["val"].transform(
        lambda s: s.fillna(0).cumsum()
    )
    for i, exp in zip(pdf["idx"], exp_series):
        assert close(got[i], float(exp)), (i, got[i], exp)
