"""Weighted reductions and per-group top terms."""

import math

import pytest

from dask_groupby_spark.operators.weighted import groupby_weighted, top_terms

NAN = float("nan")


@pytest.fixture(scope="module")
def wdf(spark):
    rows = [
        (0, 10.0, 1.0),
        (0, 20.0, 3.0),
        (1, 5.0, NAN),    # NaN weight → row excluded pairwise
        (1, NAN, 2.0),    # NaN value → excluded
        (1, 7.0, 2.0),
        (2, 4.0, None),   # NULL weight → excluded → group empty
    ]
    return spark.createDataFrame(rows, "k bigint, x double, w double")


def test_weighted_mean_sum_var(wdf):
    out = {r["k"]: r for r in groupby_weighted(
        wdf, "k", value="x", weight="w", funcs=("wsum", "wmean", "wvar")
    ).collect()}
    assert out[0]["wsum"] == pytest.approx(10 + 60)
    assert out[0]["wmean"] == pytest.approx(70 / 4)
    # frequency-weights population variance: E[x²] − E[x]²
    assert out[0]["wvar"] == pytest.approx((100 + 3 * 400) / 4 - (70 / 4) ** 2)
    assert out[1]["wmean"] == pytest.approx(7.0)
    assert out[2]["wsum"] == 0.0               # empty → sum identity
    assert out[2]["wmean"] is None or math.isnan(out[2]["wmean"])


def test_top_terms(spark):
    rows = [
        (1, "a a a b c", "en"),
        (2, "b b c", "en"),
        (3, "x y", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = top_terms(docs, "lang", text_col="text", k=2).collect()
    got = {(r["lang"], r["rank"]): (r["term"], r["n"]) for r in out}
    assert got[("en", 1)] == ("a", 3)
    assert got[("en", 2)] == ("b", 3)  # tie a=3,b=3 → alphabetical
    assert got[("de", 1)] == ("x", 1)  # tie x=1,y=1 → alphabetical


def test_weighted_quantile_vs_bruteforce(spark):
    import numpy as np

    from dask_groupby_spark.operators.weighted import weighted_quantile

    rng = np.random.default_rng(5150)
    n = 300
    labels = rng.integers(0, 4, n)
    vals = np.round(rng.random(n) * 20, 1)  # duplicates likely
    wts = rng.integers(1, 6, n).astype(float)
    rows = [(int(labels[i]), float(vals[i]), float(wts[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, x double, w double")

    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    out = {r["k"]: r for r in weighted_quantile(
        df, "k", value="x", weight="w", q=qs
    ).collect()}

    def brute(k, q):
        sel = labels == k
        order = np.argsort(vals[sel], kind="stable")
        v, w = vals[sel][order], wts[sel][order]
        cw = np.cumsum(w)
        t = q * cw[-1]
        return float(v[np.searchsorted(cw, t, side="left")]) if q > 0 else float(v[0])

    for k in range(4):
        for q in qs:
            name = f"wq_{q}".replace(".", "_")
            assert out[k][name] == pytest.approx(brute(k, q)), (k, q)


def test_weighted_quantile_single_exchange(spark):
    from dask_groupby_spark.operators.weighted import weighted_quantile

    df = spark.createDataFrame([(0, 1.0, 1.0)], "k bigint, x double, w double")
    plan = weighted_quantile(df, "k", value="x", weight="w", q=[0.5, 0.9], sort=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_bivariate_corr_cov_vs_numpy(spark):
    import numpy as np

    from dask_groupby_spark.operators.weighted import groupby_bivariate

    rng = np.random.default_rng(31337)
    n = 200
    labels = rng.integers(0, 4, n)
    xs = rng.random(n) * 10
    ys = 0.5 * xs + rng.random(n) * 3
    xs[rng.random(n) < 0.1] = np.nan  # pairwise-complete exclusion
    rows = [(int(labels[i]), float(xs[i]), float(ys[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, x double, y double")
    out = {r["k"]: r for r in groupby_bivariate(
        df, "k", x="x", y="y", funcs=("corr", "cov")
    ).collect()}
    for k in range(4):
        sel = (labels == k) & ~np.isnan(xs)
        exp_corr = float(np.corrcoef(xs[sel], ys[sel])[0, 1])
        exp_cov = float(np.cov(xs[sel], ys[sel], ddof=1)[0, 1])
        assert out[k]["corr"] == pytest.approx(exp_corr, rel=1e-9), k
        assert out[k]["cov"] == pytest.approx(exp_cov, rel=1e-9), k
    # degenerate group: single pair → cov ddof=1 undefined, corr undefined
    d1 = spark.createDataFrame([(0, 1.0, 2.0)], "k bigint, x double, y double")
    row = groupby_bivariate(d1, "k", x="x", y="y", funcs=("corr", "cov")).collect()[0]
    assert row["corr"] is None and row["cov"] is None


def test_time_weighted_mean(spark):
    from dask_groupby_spark.operators.weighted import time_weighted_mean

    rows = [
        # group 0: value 10 holds for 9s, value 20 for 1s, value 99 is last (0s)
        (0, 0.0, 10.0), (0, 9.0, 20.0), (0, 10.0, 99.0),
        # group 1: single point → its value
        (1, 5.0, 42.0),
        # group 2: NaN value excluded; remaining 2 points
        (2, 0.0, float("nan")), (2, 1.0, 4.0), (2, 3.0, 8.0),
    ]
    df = spark.createDataFrame(rows, "k bigint, ts double, x double")
    out = {r["k"]: r["twa"] for r in
           time_weighted_mean(df, "k", ts_col="ts", value="x").collect()}
    assert out[0] == pytest.approx((10 * 9 + 20 * 1) / 10)
    assert out[1] == 42.0
    assert out[2] == pytest.approx(4.0)  # 4 holds 2s, 8 is last
    plan = time_weighted_mean(df, "k", ts_col="ts", value="x", sort=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_bivariate_regression_vs_numpy(spark):
    import numpy as np

    from dask_groupby_spark.operators.weighted import groupby_bivariate

    rng = np.random.default_rng(424242)
    n = 160
    labels = rng.integers(0, 3, n)
    xs = rng.random(n) * 10
    ys = 2.5 * xs - 4.0 + rng.standard_normal(n)
    rows = [(int(labels[i]), float(xs[i]), float(ys[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, x double, y double")
    out = {r["k"]: r for r in groupby_bivariate(
        df, "k", x="x", y="y", funcs=("slope", "intercept", "r2")
    ).collect()}
    for k in range(3):
        sel = labels == k
        m, b = np.polyfit(xs[sel], ys[sel], 1)
        r = np.corrcoef(xs[sel], ys[sel])[0, 1]
        assert out[k]["slope"] == pytest.approx(float(m), rel=1e-9)
        assert out[k]["intercept"] == pytest.approx(float(b), rel=1e-9)
        assert out[k]["r2"] == pytest.approx(float(r * r), rel=1e-9)


def test_weighted_quantile_sketch_within_bucket_error(spark):
    """Sketch vs exact: the histogram answer must sit within one bucket
    width of the exact inverted-CDF weighted quantile (its design bound)."""
    import numpy as np

    from dask_groupby_spark.operators.weighted import (
        weighted_quantile,
        weighted_quantile_sketch,
    )

    rng = np.random.default_rng(7001)
    n = 500
    labels = rng.integers(0, 4, n)
    vals = rng.random(n) * 100.0
    wts = rng.integers(1, 9, n).astype(float)
    rows = [(int(labels[i]), float(vals[i]), float(wts[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, x double, w double")

    qs = [0.1, 0.5, 0.9]
    bins = 512
    exact = {r["k"]: r for r in weighted_quantile(
        df, "k", value="x", weight="w", q=qs
    ).collect()}
    sk = {r["k"]: r for r in weighted_quantile_sketch(
        df, "k", value="x", weight="w", q=qs, bins=bins
    ).collect()}
    for k in range(4):
        sel = labels == k
        width = (vals[sel].max() - vals[sel].min()) / bins
        for q in qs:
            name = f"wq_{q}".replace(".", "_")
            assert abs(sk[k][name] - exact[k][name]) <= width + 1e-9, (k, q)


def test_weighted_quantile_sketch_degenerate_group(spark):
    """All-equal values → the value itself; single row → its value."""
    from dask_groupby_spark.operators.weighted import weighted_quantile_sketch

    df = spark.createDataFrame(
        [(0, 7.5, 2.0), (0, 7.5, 1.0), (1, 3.0, 5.0)], "k bigint, x double, w double"
    )
    got = {r["k"]: r["wq_0_5"] for r in weighted_quantile_sketch(
        df, "k", value="x", weight="w", q=0.5
    ).collect()}
    assert got[0] == 7.5 and got[1] == 3.0


def test_sketch_subnormal_range_no_divide_by_zero(spark):
    """Hypothesis-found (r8): a group whose value range is subnormal
    (mx - mn = 5e-324) underflows width to 0.0 while mx > mn still holds
    — the bucket division must not crash, and the answer stays within
    the (degenerate) half-range bound."""
    from dask_groupby_spark.operators.weighted import weighted_quantile_sketch

    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (0, 5e-324, 1.0), (0, 0.0, 1.0)],
        "g bigint, v double, w double",
    )
    row = weighted_quantile_sketch(df, "g", value="v", weight="w", q=0.0).collect()[0]
    assert abs(row["wq_0_0"]) <= 5e-324
    # plain zero-width group (all values equal) still answers the value
    df2 = spark.createDataFrame(
        [(0, 7.0, 1.0), (0, 7.0, 2.0)], "g bigint, v double, w double"
    )
    assert weighted_quantile_sketch(
        df2, "g", value="v", weight="w", q=0.5
    ).collect()[0]["wq_0_5"] == 7.0
