"""Complex-number reductions (struct<re,im>) vs numpy complex oracle.

Reference coverage: complex64/128 appear in the hypothesis dtype sweep
(tests/strategies.py:83) — SURVEY.md §1.2 maps them to struct(re, im).
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.complex import complex_col, groupby_reduce_complex

LABELS = [0, 0, 2, 2, 2, 1, 1, 2, 2, 1, 1, 0]  # canonical flox fixture


def _data(with_nan: bool):
    rng = np.random.RandomState(42)
    z = rng.randn(12) + 1j * rng.randn(12)
    if with_nan:
        z[1] = complex(np.nan, z[1].imag)
        z[7] = complex(z[7].real, np.nan)
    return z


def _spark_df(spark, z):
    rows = [
        (int(i), int(g), float(z[i].real), float(z[i].imag))
        for i, g in enumerate(LABELS)
    ]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    return df.withColumn("z", complex_col(F.col("re"), F.col("im")))


def _np_groups(z):
    return {g: z[np.array(LABELS) == g] for g in sorted(set(LABELS))}


def _cx(row):
    return complex(row["re"], row["im"])


def _assert_close(a: complex, b: complex):
    if math.isnan(b.real) or math.isnan(b.imag):
        assert math.isnan(a.real) and math.isnan(a.imag), (a, b)
    else:
        assert abs(a - b) < 1e-9 * max(1.0, abs(b)), (a, b)


NP_FUNCS = {
    "sum": np.sum,
    "nansum": np.nansum,
    "mean": np.mean,
    "nanmean": np.nanmean,
    "prod": np.prod,
    "nanprod": np.nanprod,
    "min": np.min,
    "max": np.max,
}


@pytest.mark.parametrize("func", sorted(NP_FUNCS))
@pytest.mark.parametrize("with_nan", [False, True])
def test_complex_reduce(spark, func, with_nan):
    if with_nan and func in ("min", "max"):
        # numpy complex nan ordering is ill-defined; bare min/max covered nan-free
        return
    z = _data(with_nan)
    out = groupby_reduce_complex(_spark_df(spark, z), "g", func=func, value="z").collect()
    got = {r["g"]: _cx(r[func]) for r in out}
    for g, arr in _np_groups(z).items():
        if func in ("nansum", "nanmean", "nanprod"):
            arr = arr[~np.isnan(arr)]
            exp = NP_FUNCS[func[3:]](arr) if len(arr) else NP_FUNCS[func[3:]](np.array([0j])) * 0
            if func == "nanprod" and len(arr) == 0:
                exp = 1 + 0j
        else:
            exp = NP_FUNCS[func](arr)
        _assert_close(got[g], complex(exp))


def test_complex_count_first_last(spark):
    z = _data(True)
    df = _spark_df(spark, z)
    cnt = {r["g"]: r["count"] for r in
           groupby_reduce_complex(df, "g", func="count", value="z").collect()}
    groups = _np_groups(z)
    assert cnt == {g: int((~np.isnan(arr)).sum()) for g, arr in groups.items()}

    first = {r["g"]: _cx(r["first"]) for r in
             groupby_reduce_complex(df, "g", func="first", value="z", idx_col="idx").collect()}
    nanlast = {r["g"]: _cx(r["nanlast"]) for r in
               groupby_reduce_complex(df, "g", func="nanlast", value="z", idx_col="idx").collect()}
    for g, arr in groups.items():
        _assert_close(first[g], complex(arr[0]))
        valid = arr[~np.isnan(arr)]
        _assert_close(nanlast[g], complex(valid[-1]))


@pytest.mark.parametrize("with_nan", [False, True])
@pytest.mark.parametrize("func", ["var", "nanvar", "std", "nanstd"])
def test_complex_var_std(spark, func, with_nan):
    z = _data(with_nan)
    out = groupby_reduce_complex(
        _spark_df(spark, z), "g", func=func, value="z", ddof=1
    ).collect()
    got = {r["g"]: r[func] for r in out}
    base = func[3:] if func.startswith("nan") else func
    npf = {"var": np.var, "std": np.std}[base]
    for g, arr in _np_groups(z).items():
        if func.startswith("nan"):
            arr = arr[~np.isnan(arr)]
        exp = float(npf(arr, ddof=1)) if len(arr) > 1 else float("nan")
        if np.isnan(arr).any():
            exp = float("nan")
        if math.isnan(exp):
            assert got[g] is None or math.isnan(got[g]), (g, got[g])
        else:
            assert abs(got[g] - exp) < 1e-9 * max(1.0, abs(exp)), (g, got[g], exp)


@pytest.mark.parametrize("func", ["var", "nanvar", "std", "nanstd"])
@pytest.mark.parametrize("ddof", [0, 1])
def test_complex_var_std_degenerate_groups(spark, func, ddof):
    """Groups with n_valid <= ddof (single element at ddof=1, all-missing)
    must yield NaN — not ANSI DIVIDE_BY_ZERO, not 0.0 (ADVICE r2 high)."""
    rows = [
        # g=0: one valid element          → ddof=1 degenerate, ddof=0 → 0.0
        (0, 0, 1.5, -2.0),
        # g=1: all-missing (NaN real part) → degenerate at every ddof
        (1, 1, float("nan"), 0.5),
        (2, 1, float("nan"), -0.25),
        # g=2: healthy control group
        (3, 2, 1.0, 1.0),
        (4, 2, 3.0, -1.0),
        (5, 2, 2.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    df = df.withColumn("z", complex_col(F.col("re"), F.col("im")))
    out = groupby_reduce_complex(df, "g", func=func, value="z", ddof=ddof).collect()
    got = {r["g"]: r[func] for r in out}

    if ddof == 0:
        assert abs(got[0] - 0.0) < 1e-12  # var of single point is 0
    else:
        assert got[0] is None or math.isnan(got[0]), got[0]
    # all-missing group: NaN for both skipna and propagating variants
    assert got[1] is None or math.isnan(got[1]), got[1]
    z2 = np.array([1 + 1j, 3 - 1j, 2 + 0j])
    npf = np.var if "var" in func else np.std
    exp = float(npf(z2, ddof=ddof))
    assert abs(got[2] - exp) < 1e-9, (got[2], exp)


@pytest.mark.parametrize("func", ["argmin", "argmax", "nanargmin", "nanargmax"])
@pytest.mark.parametrize("with_nan", [False, True])
def test_complex_argreductions(spark, func, with_nan):
    z = _data(with_nan)
    out = groupby_reduce_complex(
        _spark_df(spark, z), "g", func=func, value="z", idx_col="idx"
    ).collect()
    got = {r["g"]: r[func] for r in out}
    base = func[3:] if func.startswith("nan") else func
    labels = np.array(LABELS)
    for g, arr in _np_groups(z).items():
        g_idx = np.nonzero(labels == g)[0]  # global idx of this group's rows
        if func.startswith("nan"):
            mask = ~np.isnan(arr)
            local = np.argmin(arr[mask]) if base == "argmin" else np.argmax(arr[mask])
            exp = int(g_idx[np.nonzero(mask)[0][local]])
        else:
            # numpy bare arg on NaN-containing arrays: first NaN position
            local = np.argmin(arr) if base == "argmin" else np.argmax(arr)
            exp = int(g_idx[local])
        assert got[g] == exp, (func, g, got[g], exp)


def test_complex_argmax_first_occurrence_tie(spark):
    z = np.array([2 + 1j, 2 + 1j, 1 + 0j])
    rows = [(i, 0, float(c.real), float(c.imag)) for i, c in enumerate(z)]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    df = df.withColumn("z", complex_col(F.col("re"), F.col("im")))
    out = groupby_reduce_complex(df, "g", func="argmax", value="z", idx_col="idx").collect()
    assert out[0]["argmax"] == 0  # first occurrence, like np.argmax


@pytest.mark.parametrize("func", ["median", "nanmedian"])
@pytest.mark.parametrize("with_nan", [False, True])
def test_complex_median(spark, func, with_nan):
    z = _data(with_nan)
    out = groupby_reduce_complex(_spark_df(spark, z), "g", func=func, value="z").collect()
    got = {r["g"]: _cx(r[func]) for r in out}
    for g, arr in _np_groups(z).items():
        if func == "nanmedian":
            arr = arr[~np.isnan(arr)]
            exp = complex(np.median(arr)) if len(arr) else complex("nan+nanj")
        else:
            exp = complex("nan+nanj") if np.isnan(arr).any() else complex(np.median(arr))
        _assert_close(got[g], exp)


def test_complex_any_all(spark):
    rows = [
        (0, 0, 0.0, 0.0),   # falsy
        (1, 0, 0.0, 0.0),   # falsy  -> group 0: any=False, all=False
        (2, 1, 1.0, 0.0),   # truthy
        (3, 1, 0.0, 0.0),   # falsy  -> group 1: any=True, all=False
        (4, 2, 0.0, 2.0),   # truthy
        (5, 2, float("nan"), 0.0),  # NaN part is truthy (numpy bool(nan))
    ]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    df = df.withColumn("z", complex_col(F.col("re"), F.col("im")))
    got_any = {r["g"]: r["any"] for r in
               groupby_reduce_complex(df, "g", func="any", value="z").collect()}
    got_all = {r["g"]: r["all"] for r in
               groupby_reduce_complex(df, "g", func="all", value="z").collect()}
    assert got_any == {0: False, 1: True, 2: True}
    assert got_all == {0: False, 1: False, 2: True}


@pytest.mark.parametrize("seed", [7, 101, 3021])
def test_complex_randomized_sweep(spark, seed):
    """Wider randomized check (the hypothesis-style layer for the round-2
    funcs): 200 elements, 8 groups, ~15% NaN contamination in either part;
    nanvar / nanargmax / nanmedian vs the numpy per-group loop."""
    rng = np.random.RandomState(seed)
    n, G = 200, 8
    labels = rng.randint(0, G, n)
    z = rng.randn(n) + 1j * rng.randn(n)
    mask = rng.rand(n) < 0.15
    zr = z.real.copy()
    zr[mask & (rng.rand(n) < 0.5)] = np.nan
    zi = z.imag.copy()
    zi[mask & (rng.rand(n) >= 0.3)] = np.nan
    z = zr + 1j * zi
    rows = [
        (int(i), int(labels[i]), float(z[i].real), float(z[i].imag))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    df = df.withColumn("zz", complex_col(F.col("re"), F.col("im")))

    var = {r["g"]: r["nanvar"] for r in
           groupby_reduce_complex(df, "g", func="nanvar", value="zz", ddof=1).collect()}
    amax = {r["g"]: r["nanargmax"] for r in
            groupby_reduce_complex(df, "g", func="nanargmax", value="zz",
                                   idx_col="idx").collect()}
    med = {r["g"]: _cx(r["nanmedian"]) for r in
           groupby_reduce_complex(df, "g", func="nanmedian", value="zz").collect()}

    for g in range(G):
        arr = z[labels == g]
        g_idx = np.nonzero(labels == g)[0]
        ok = ~np.isnan(arr)
        valid = arr[ok]
        if len(valid) > 1:
            exp_var = float(np.var(valid, ddof=1))
            assert abs(var[g] - exp_var) < 1e-9 * max(1.0, exp_var), (g, var[g], exp_var)
        if len(valid):
            local = int(np.argmax(valid))
            assert amax[g] == int(g_idx[np.nonzero(ok)[0][local]])
            _assert_close(med[g], complex(np.median(valid)))


def test_complex_new_funcs_single_exchange(spark):
    # var / arg / median all stay one-shuffle plans (median's window and
    # final aggregate share the same hash partitioning on the keys)
    from dask_groupby_spark.plans import count_exchanges

    df = spark.createDataFrame(
        [(i, i % 3, float(i), float(-i)) for i in range(30)],
        "idx bigint, g bigint, re double, im double",
    ).withColumn("z", complex_col(F.col("re"), F.col("im")))
    for fn, kw in [("nanvar", {}), ("nanargmax", {"idx_col": "idx"}),
                   ("nanmedian", {})]:
        out = groupby_reduce_complex(df, "g", func=fn, value="z", sort=False, **kw)
        assert count_exchanges(out) == 1, fn


def test_complex_min_matches_numpy_ordering(spark):
    # numpy complex ordering is lexicographic (real, then imag) — ties on
    # the real part must break on imag exactly like Spark struct ordering
    z = np.array([1 + 5j, 1 + 2j, 1 + 9j, 3 + 0j])
    rows = [(i, 0, float(c.real), float(c.imag)) for i, c in enumerate(z)]
    df = spark.createDataFrame(rows, "idx bigint, g bigint, re double, im double")
    df = df.withColumn("z", complex_col(F.col("re"), F.col("im")))
    out = groupby_reduce_complex(df, "g", func="min", value="z").collect()[0]
    assert _cx(out["min"]) == complex(np.min(z))
