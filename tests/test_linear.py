"""linreg_fit / logreg_train: numpy differentials, recovery of known
coefficients, NULL/NaN row handling, prediction round-trip."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_groupby_spark.operators import linear_predict, linreg_fit, logreg_train


@pytest.fixture(scope="module")
def xy_rows():
    rng = random.Random(80803)
    rows = []
    for _ in range(800):
        x1 = rng.uniform(-2, 2)
        x2 = rng.uniform(0, 5)
        noise = rng.gauss(0, 0.3)
        y = 3.0 * x1 - 1.25 * x2 + 7.0 + noise
        rows.append((x1, x2, y))
    return rows


def test_linreg_matches_numpy_lstsq(spark, xy_rows):
    df = spark.createDataFrame(xy_rows, "x1 double, x2 double, y double")
    got = dict(linreg_fit(df, features=["x1", "x2"], label="y"))
    X = np.array([[r[0], r[1], 1.0] for r in xy_rows])
    yv = np.array([r[2] for r in xy_rows])
    exp = np.linalg.lstsq(X, yv, rcond=None)[0]
    assert got["x1"] == pytest.approx(exp[0], abs=1e-9)
    assert got["x2"] == pytest.approx(exp[1], abs=1e-9)
    assert got["bias"] == pytest.approx(exp[2], abs=1e-9)
    # and it recovered the generating coefficients
    assert got["x1"] == pytest.approx(3.0, abs=0.1)
    assert got["x2"] == pytest.approx(-1.25, abs=0.1)
    assert got["bias"] == pytest.approx(7.0, abs=0.1)


def test_linreg_ridge_shrinks_but_not_bias(spark, xy_rows):
    df = spark.createDataFrame(xy_rows, "x1 double, x2 double, y double")
    plain = dict(linreg_fit(df, features=["x1", "x2"], label="y"))
    ridge = dict(linreg_fit(df, features=["x1", "x2"], label="y", l2=1e5))
    assert abs(ridge["x1"]) < abs(plain["x1"])
    assert abs(ridge["x2"]) < abs(plain["x2"])
    # numpy cross-check of the penalized solve
    X = np.array([[r[0], r[1], 1.0] for r in xy_rows])
    yv = np.array([r[2] for r in xy_rows])
    A = X.T @ X + np.diag([1e5, 1e5, 0.0])
    exp = np.linalg.solve(A, X.T @ yv)
    assert ridge["x1"] == pytest.approx(exp[0], abs=1e-9)
    assert ridge["bias"] == pytest.approx(exp[2], abs=1e-9)


def test_linreg_drops_null_nan_rows(spark):
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (None, 9.0),
            (float("nan"), 9.0), (4.0, None), (5.0, float("nan"))]
    df = spark.createDataFrame(rows, "x double, y double")
    got = dict(linreg_fit(df, features=["x"], label="y"))
    assert got["x"] == pytest.approx(2.0, abs=1e-12)
    assert got["bias"] == pytest.approx(0.0, abs=1e-12)


def _np_logreg(X, y, iters, lr):
    w = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / n
    return w


def test_logreg_matches_numpy_gd(spark):
    rng = random.Random(80804)
    rows = []
    for _ in range(600):
        x1 = rng.uniform(-2, 2)
        x2 = rng.uniform(-2, 2)
        logit = 1.5 * x1 - 2.0 * x2 + 0.25
        p = 1.0 / (1.0 + math.exp(-logit))
        rows.append((x1, x2, 1.0 if rng.random() < p else 0.0))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = dict(logreg_train(df, features=["x1", "x2"], label="y", iters=10, lr=0.5))
    X = np.array([[r[0], r[1], 1.0] for r in rows])
    yv = np.array([r[2] for r in rows])
    exp = _np_logreg(X, yv, iters=10, lr=0.5)
    assert got["x1"] == pytest.approx(exp[0], abs=1e-9)
    assert got["x2"] == pytest.approx(exp[1], abs=1e-9)
    assert got["bias"] == pytest.approx(exp[2], abs=1e-9)
    # direction of the generating coefficients after only 10 GD steps
    assert got["x1"] > 0 and got["x2"] < 0


def test_logreg_l2_and_init(spark):
    rows = [(float(i % 3 - 1), float(i % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "x double, y double")
    w0 = dict(logreg_train(df, features=["x"], label="y", iters=3, init=[0.5, -0.5]))
    X = np.array([[r[0], 1.0] for r in rows])
    yv = np.array([r[1] for r in rows])
    w = np.array([0.5, -0.5])
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = (X.T @ (p - yv)) / len(yv)
        w = w - 0.5 * g
    assert w0["x"] == pytest.approx(w[0], abs=1e-9)
    # l2 pulls the feature weight toward zero, bias unpenalized
    wl2 = dict(logreg_train(df, features=["x"], label="y", iters=20, l2=5.0))
    wno = dict(logreg_train(df, features=["x"], label="y", iters=20))
    assert abs(wl2["x"]) < abs(wno["x"]) or wno["x"] == pytest.approx(0.0)


def test_predict_round_trip(spark, xy_rows):
    df = spark.createDataFrame(xy_rows, "x1 double, x2 double, y double")
    model = linreg_fit(df, features=["x1", "x2"], label="y")
    scored = linear_predict(df, model, out="yhat")
    resid = scored.agg(
        F.sqrt(F.avg((F.col("y") - F.col("yhat")) ** 2)).alias("rmse")
    ).collect()[0]["rmse"]
    assert resid < 0.45  # noise sigma was 0.3
    lmodel = [("x1", 1.0), ("bias", 0.0)]
    probs = linear_predict(df.limit(5), lmodel, out="p", kind="logistic")
    for r in probs.collect():
        assert r["p"] == pytest.approx(1.0 / (1.0 + math.exp(-r["x1"])), abs=1e-12)
    with pytest.raises(ValueError):
        linear_predict(df, model, kind="nope").collect()


def test_grouped_linreg_matches_numpy_per_group(spark):
    rng = random.Random(80805)
    coefs = {"g0": (2.0, -1.0, 5.0), "g1": (-3.0, 0.5, 1.0), "g2": (0.0, 4.0, -2.0)}
    rows = []
    for g, (a, b, c) in coefs.items():
        for _ in range(300):
            x1, x2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
            rows.append((g, x1, x2, a * x1 + b * x2 + c + rng.gauss(0, 0.1)))
    # degenerate groups: too few rows, and rank-deficient (constant feature)
    rows += [("tiny", 1.0, 2.0, 3.0), ("tiny", 2.0, 1.0, 4.0)]
    rows += [("flat", 1.0, 1.0, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    from dask_groupby_spark.operators import grouped_linreg

    got = {}
    for r in grouped_linreg(df, "g", features=["x1", "x2"], label="y").collect():
        got.setdefault(r["g"], {})[r["feature"]] = (r["weight"], r["n"])
    for g in coefs:
        data = [r for r in rows if r[0] == g]
        X = np.array([[r[1], r[2], 1.0] for r in data])
        yv = np.array([r[3] for r in data])
        exp = np.linalg.lstsq(X, yv, rcond=None)[0]
        assert got[g]["x1"][0] == pytest.approx(exp[0], abs=1e-8)
        assert got[g]["x2"][0] == pytest.approx(exp[1], abs=1e-8)
        assert got[g]["bias"][0] == pytest.approx(exp[2], abs=1e-8)
        assert got[g]["x1"][1] == 300
    # n <= d -> NULL weights; rank-deficient XtX -> NULL weights
    assert got["tiny"]["x1"] == (None, 2)
    assert got["flat"]["x1"][0] is None
    assert set(got) == set(coefs) | {"tiny", "flat"}


def test_grouped_linreg_single_feature_matches_bivariate(spark):
    rng = random.Random(80806)
    rows = [
        (g, rng.uniform(0, 10), rng.uniform(0, 10))
        for g in ["a", "b"]
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    from dask_groupby_spark.operators import grouped_bivariate, grouped_linreg

    lin = {}
    for r in grouped_linreg(df, "g", features=["x"], label="y").collect():
        lin.setdefault(r["g"], {})[r["feature"]] = r["weight"]
    biv = {
        r["g"]: (r["slope"], r["intercept"])
        for r in grouped_bivariate(df, "g", "x", "y").collect()
    }
    for g in ("a", "b"):
        assert lin[g]["x"] == pytest.approx(biv[g][0], abs=1e-9)
        assert lin[g]["bias"] == pytest.approx(biv[g][1], abs=1e-9)


def test_grouped_logreg_matches_per_group_numpy_gd(spark):
    rng = random.Random(80808)
    rows = []
    gen = {"g0": (1.5, -2.0, 0.25), "g1": (-1.0, 1.0, -0.5)}
    for g, (a, b, c) in gen.items():
        for _ in range(400):
            x1, x2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
            p = 1.0 / (1.0 + math.exp(-(a * x1 + b * x2 + c)))
            rows.append((g, x1, x2, 1.0 if rng.random() < p else 0.0))
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    from dask_groupby_spark.operators import grouped_logreg, logreg_train

    got = {}
    for r in grouped_logreg(
        df, "g", features=["x1", "x2"], label="y", iters=8, lr=0.5
    ).collect():
        got.setdefault(r["g"], {})[r["feature"]] = (r["weight"], r["n"])
    for g in gen:
        data = [r for r in rows if r[0] == g]
        X = np.array([[r[1], r[2], 1.0] for r in data])
        yv = np.array([r[3] for r in data])
        exp = _np_logreg(X, yv, iters=8, lr=0.5)
        assert got[g]["x1"][0] == pytest.approx(exp[0], abs=1e-9)
        assert got[g]["x2"][0] == pytest.approx(exp[1], abs=1e-9)
        assert got[g]["bias"][0] == pytest.approx(exp[2], abs=1e-9)
        assert got[g]["x1"][1] == 400
        # grouped result == ungrouped trainer on that group's slice
        solo = dict(
            logreg_train(
                df.filter(F.col("g") == g),
                features=["x1", "x2"], label="y", iters=8, lr=0.5,
            )
        )
        assert got[g]["x1"][0] == pytest.approx(solo["x1"], abs=1e-9)


def test_grouped_logreg_l2_and_missing_groups(spark):
    rows = [("a", float(i % 3 - 1), float(i % 2)) for i in range(30)]
    rows += [("nulls", None, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    from dask_groupby_spark.operators import grouped_logreg, logreg_train

    out = grouped_logreg(df, "g", features=["x"], label="y", iters=4, l2=2.0)
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], {})[r["feature"]] = r["weight"]
    assert set(got) == {"a"}  # all-NULL group has no complete rows
    solo = dict(
        logreg_train(
            df.filter(F.col("g") == "a"),
            features=["x"], label="y", iters=4, l2=2.0,
        )
    )
    assert got["a"]["x"] == pytest.approx(solo["x"], abs=1e-12)
    assert got["a"]["bias"] == pytest.approx(solo["bias"], abs=1e-12)


def test_grouped_linear_predict_scores_with_own_group_model(spark):
    # exact models per group (no noise) -> scoring recovers y exactly
    rows = []
    gen = {"a": (2.0, 1.0), "b": (-1.0, 3.0)}
    rng = random.Random(80809)
    for g, (slope, icpt) in gen.items():
        for _ in range(50):
            x = rng.uniform(-5, 5)
            rows.append((g, x, slope * x + icpt))
    rows.append(("orphan", 1.0, 99.0))  # group without a model
    df = spark.createDataFrame(rows, "g string, x double, y double")
    from dask_groupby_spark.operators import (
        grouped_linear_predict,
        grouped_linreg,
        grouped_logreg,
    )

    model = grouped_linreg(
        df.filter(F.col("g") != "orphan"), "g", features=["x"], label="y"
    )
    scored = grouped_linear_predict(df, model, "g", out="yhat").collect()
    for r in scored:
        if r["g"] == "orphan":
            assert r["yhat"] is None
        else:
            assert r["yhat"] == pytest.approx(r["y"], abs=1e-9)
    # logistic kind matches sigmoid of the grouped_logreg linear score
    clf_rows = [("a", float(i % 5 - 2), float(i % 2)) for i in range(40)]
    cdf = spark.createDataFrame(clf_rows, "g string, x double, y double")
    clf = grouped_logreg(cdf, "g", features=["x"], label="y", iters=3)
    lin = {
        r["x"]: r["s"]
        for r in grouped_linear_predict(cdf, clf, "g", out="s").collect()
    }
    logi = {
        r["x"]: r["p"]
        for r in grouped_linear_predict(
            cdf, clf, "g", out="p", kind="logistic"
        ).collect()
    }
    for x, s in lin.items():
        assert logi[x] == pytest.approx(1.0 / (1.0 + math.exp(-s)), abs=1e-12)
    with pytest.raises(ValueError):
        grouped_linear_predict(cdf, clf, "g", kind="nope").collect()


def test_target_encode_leave_one_out_matches_bruteforce(spark):
    from dask_groupby_spark.operators import target_encode

    rng = random.Random(80810)
    rows = [
        (i, rng.choice(["a", "b", "c", "rare"]), float(rng.randrange(10)))
        for i in range(300)
    ]
    rows.append((300, "rare", float("nan")))    # serving row: NaN label
    rows.append((301, "unseen_cat", 5.0))       # singleton category
    df = spark.createDataFrame(rows, "i bigint, cat string, y double")
    m = 10.0
    valid = [(c, y) for _, c, y in rows if not math.isnan(y)]
    prior = sum(y for _, y in valid) / len(valid)
    stats = {}
    for c, y in valid:
        n, s = stats.get(c, (0, 0.0))
        stats[c] = (n + 1, s + y)
    got = {
        r["i"]: r["te"]
        for r in target_encode(df, "cat", label="y", smoothing=m).collect()
    }
    for i, c, y in rows:
        n, s = stats.get(c, (0, 0.0))
        if math.isnan(y):
            exp = (s + m * prior) / (n + m)   # serving fallback: inclusive
        else:
            exp = (s - y + m * prior) / (n - 1 + m)
        assert got[i] == pytest.approx(exp, abs=1e-12), (i, c, y)


def test_target_encode_inclusive_and_unseen(spark):
    from dask_groupby_spark.operators import target_encode

    train = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), ("b", 1.0)], "cat string, y double"
    )
    # inclusive form (serving-time estimate), explicit prior
    enc = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encode(
            train, "cat", label="y", smoothing=2.0, leave_one_out=False,
            prior=0.5,
        ).collect()
    }
    assert enc[("a", 1.0)] == pytest.approx((1.0 + 2.0 * 0.5) / (2 + 2.0))
    assert enc[("b", 1.0)] == pytest.approx((1.0 + 2.0 * 0.5) / (1 + 2.0))
    # smoothing=0 inclusive = plain group mean; LOO forbidden at m=0
    plain = {
        r["cat"]: r["te"]
        for r in target_encode(
            train, "cat", label="y", smoothing=0.0, leave_one_out=False
        ).collect()
    }
    assert plain["a"] == pytest.approx(0.5) and plain["b"] == 1.0
    with pytest.raises(ValueError):
        target_encode(train, "cat", label="y", smoothing=0.0)
    with pytest.raises(ValueError):
        target_encode(train, "cat", label="y", smoothing=-1.0)


def test_empty_and_bad_init_raise(spark):
    df = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError):
        linreg_fit(df, features=["x"], label="y")
    with pytest.raises(ValueError):
        logreg_train(df, features=["x"], label="y")
    df2 = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError):
        logreg_train(df2, features=["x"], label="y", init=[1.0])


def test_target_encode_null_category_is_its_own_group(spark):
    """NULL categories must join back to THEIR group's stats (null-safe
    join, GROUP BY semantics) — a plain equi-join would strand them at
    n=0 and the LOO formula would emit garbage."""
    from dask_groupby_spark.operators import target_encode

    rows = [(0, None, 10.0), (1, None, 20.0), (2, "a", 4.0), (3, "a", 6.0)]
    df = spark.createDataFrame(rows, "i bigint, c string, y double")
    m = 2.0
    prior = 10.0  # (10+20+4+6)/4
    got = {
        r["i"]: r["te"]
        for r in target_encode(df, "c", label="y", smoothing=m).collect()
    }
    # NULL group: n=2, s=30 — LOO for row 0 = (30-10+2*10)/(2-1+2)
    assert got[0] == pytest.approx((30 - 10 + m * prior) / (2 - 1 + m))
    assert got[1] == pytest.approx((30 - 20 + m * prior) / (2 - 1 + m))
    assert got[2] == pytest.approx((10 - 4 + m * prior) / (2 - 1 + m))


def test_collision_guards(spark):
    from dask_groupby_spark.operators import (
        grouped_linreg,
        grouped_logreg,
        target_encode,
    )

    df = spark.createDataFrame([("a", 1.0, 2.0)], "n string, x double, y double")
    with pytest.raises(ValueError, match="collide"):
        grouped_linreg(df, "n", features=["x"], label="y")
    with pytest.raises(ValueError, match="collide"):
        grouped_logreg(df, "n", features=["x"], label="y")
    df2 = spark.createDataFrame([("a", 1.0, 2.0)], "c string, __te_n double, y double")
    with pytest.raises(ValueError, match="__te_"):
        target_encode(df2, "c", label="y")


def test_grouped_logreg_and_predict_null_group(spark):
    """NULL group keys train and score like any other group (null-safe
    joins throughout — equi-joins would drop them after step 1)."""
    from dask_groupby_spark.operators import (
        grouped_linear_predict,
        grouped_logreg,
        logreg_train,
    )

    rows = [(None, float(i % 5 - 2), float(i % 2)) for i in range(40)]
    rows += [("a", float(i % 3 - 1), float((i + 1) % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    model = grouped_logreg(df, "g", features=["x"], label="y", iters=4)
    got = {}
    for r in model.collect():
        got.setdefault(r["g"], {})[r["feature"]] = r["weight"]
    assert set(got) == {None, "a"}
    solo = dict(
        logreg_train(
            df.filter(F.col("g").isNull()), features=["x"], label="y", iters=4
        )
    )
    assert got[None]["x"] == pytest.approx(solo["x"], abs=1e-12)
    scored = grouped_linear_predict(df, model, "g", out="s").collect()
    for r in scored:
        assert r["s"] is not None


def test_grouped_linreg_nan_segment_key(spark):
    """r10 audit: a NaN float segment key round-tripped the Arrow solve
    pass as SQL NULL, colliding with a genuine NULL-key segment — float
    keys now carry isnan markers and come back AS NaN."""
    from dask_groupby_spark.operators import grouped_linreg

    nan = float("nan")
    rows = (
        [(nan, float(i), 2.0 * i + 1) for i in range(10)]
        + [(None, float(i), 3.0 * i) for i in range(10)]
        + [(1.0, float(i), -1.0 * i + 4) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "seg double, x double, y double")
    out = grouped_linreg(df, "seg", features=["x"], label="y").collect()
    got = {}
    for r in out:
        k = "NaN" if (r["seg"] is not None and math.isnan(r["seg"])) else r["seg"]
        got[(k, r["feature"])] = round(r["weight"], 9)
    assert got == {
        ("NaN", "x"): 2.0, ("NaN", "bias"): 1.0,
        (None, "x"): 3.0, (None, "bias"): 0.0,
        (1.0, "x"): -1.0, (1.0, "bias"): 4.0,
    }
