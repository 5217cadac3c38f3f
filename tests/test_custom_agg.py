"""Custom-Aggregation extensibility (ref: flox custom Aggregation,
tests/test_core.py:1462) — tier-1 Column builders and the tier-2
applyInPandas fallback."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from dask_groupby_spark import groupby_reduce
from dask_groupby_spark.udaf import groupby_apply_reduce, make_aggregation


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, i % 3, float(i)) for i in range(30)]
    return spark.createDataFrame(rows, "idx bigint, label bigint, val double")


def test_custom_column_builder(df):
    # "range" = max - min, as a user-defined registry entry
    agg_range = make_aggregation(
        "range", lambda ctx: F.max(ctx.clean) - F.min(ctx.clean)
    )
    out = groupby_reduce(df, "label", func=agg_range, value="val")
    got = {r["label"]: r["range"] for r in out.collect()}
    assert got == {0: 27.0, 1: 27.0, 2: 27.0}


def test_custom_agg_with_expected_groups(df):
    agg_range = make_aggregation(
        "range", lambda ctx: F.max(ctx.clean) - F.min(ctx.clean)
    )
    out = groupby_reduce(
        df, "label", func=agg_range, value="val",
        expected_groups=[0, 1, 2, 3], fill_value=-1.0,
    )
    assert {r["label"]: r["range"] for r in out.collect()}[3] == -1.0


def test_apply_in_pandas_fallback(df):
    # trimmed mean — not expressible as a plain aggregate composition
    def trimmed_mean(pdf):
        v = np.sort(pdf["val"].to_numpy())
        k = max(1, len(v) // 10)
        return {"tmean": float(v[k:-k].mean())}

    out = groupby_apply_reduce(
        df, "label", reduce_fn=trimmed_mean, value_cols=["val"],
        output_schema="tmean double",
    )
    got = {r["label"]: r["tmean"] for r in out.collect()}
    for k in range(3):
        vals = np.sort(np.array([float(i) for i in range(30) if i % 3 == k]))
        assert got[k] == pytest.approx(vals[1:-1].mean())


def test_custom_scan_spec(df):
    """Custom Scan dataclass: running range (cummax − cummin of valid
    values) as a user-defined window builder — the scan-side analog of the
    custom Aggregation escape hatch."""
    from pyspark.sql import types as T

    from dask_groupby_spark import Scan, groupby_scan

    spec = Scan(
        name="cumrange",
        build=lambda ctx, w: F.max(ctx.clean).over(w) - F.min(ctx.clean).over(w),
        result_type=lambda dt, kw: T.DoubleType(),
    )
    out = groupby_scan(df, "label", func=spec, value="val", idx_col="idx")
    got = {r["idx"]: r["cumrange"] for r in out.collect()}
    # label 0 sees values 0,3,6,... → range at idx 6 is 6-0
    assert got[0] == 0.0
    assert got[6] == 6.0
    assert got[27] == 27.0


def test_ewma_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    from dask_groupby_spark.udaf import ewma

    rng = np.random.default_rng(99)
    n = 80
    labels = rng.integers(0, 3, n)
    vals = rng.random(n) * 10
    vals[rng.random(n) < 0.15] = np.nan
    df = spark.createDataFrame(
        [(i, int(labels[i]), float(vals[i])) for i in range(n)],
        "idx bigint, k bigint, x double",
    )
    import math

    for adjust in (True, False):
        for ignore_na in (False, True):
            out = ewma(
                df, "k", value="x", idx_col="idx", alpha=0.3,
                adjust=adjust, ignore_na=ignore_na,
            )
            got = {r["idx"]: r["ewma"] for r in out.collect()}
            pdf = pd.DataFrame({"k": labels, "x": vals})
            exp = pdf.groupby("k")["x"].transform(
                lambda s: s.ewm(alpha=0.3, adjust=adjust, ignore_na=ignore_na).mean()
            )
            for i in range(n):
                e, g = exp.iloc[i], got[i]
                if isinstance(e, float) and math.isnan(e):
                    assert g is None or math.isnan(g)
                else:
                    assert g is not None and math.isclose(g, e, rel_tol=1e-12), (
                        i, adjust, ignore_na,
                    )
    assert out.count() == n


def test_ewma_ignore_na_differs_when_gaps_exist(spark):
    """The two NaN conventions must actually diverge on a gapped series
    (guards against ignore_na being silently dropped on the way to pandas)."""
    from dask_groupby_spark.udaf import ewma

    df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (2, 3.0), (3, 5.0)], "idx bigint, x double"
    ).withColumn("k", F.lit(1))
    keep = {
        r["idx"]: r["ewma"]
        for r in ewma(
            df, "k", value="x", idx_col="idx", alpha=0.5, ignore_na=False
        ).collect()
    }
    skip = {
        r["idx"]: r["ewma"]
        for r in ewma(
            df, "k", value="x", idx_col="idx", alpha=0.5, ignore_na=True
        ).collect()
    }
    assert keep[0] == skip[0] == 1.0
    # after the gap the decayed-weight (ignore_na=False) mean differs
    assert abs(keep[2] - skip[2]) > 1e-9


def test_make_scan_registry_constructor(spark, df=None):
    """make_scan: declarative custom-scan entry point (scan-side twin of
    make_aggregation, ref Scan extensibility flox/aggregations.py:577-598)."""
    from pyspark.sql import types as T

    from dask_groupby_spark import groupby_scan, make_scan

    data = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(8)], "idx bigint, k bigint, x double"
    )
    spec = make_scan(
        "cumspan",
        lambda ctx, w: F.max(ctx.clean).over(w) - F.min(ctx.clean).over(w),
        result_type=lambda dt, kw: T.DoubleType(),
    )
    out = groupby_scan(data, "k", func=spec, value="x", idx_col="idx")
    got = {r["idx"]: r["cumspan"] for r in out.collect()}
    assert got[0] == 0.0 and got[6] == 6.0 and got[7] == 6.0

    # default result_type is passthrough
    spec2 = make_scan("runmax", lambda ctx, w: F.max(ctx.clean).over(w))
    out2 = groupby_scan(data, "k", func=spec2, value="x", idx_col="idx")
    assert dict(out2.dtypes)["runmax"] == "double"


def test_apply_reduce_global_no_keys(spark):
    """Empty *by = one global group; the output schema must not lead with a
    comma and sort must not orderBy() on nothing (r9 review)."""
    from dask_groupby_spark.udaf import groupby_apply_reduce

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    out = groupby_apply_reduce(
        df,
        reduce_fn=lambda pdf: {"m": float(pdf["x"].mean())},
        value_cols=["x"],
        output_schema="`m` double",
    ).collect()
    assert len(out) == 1 and out[0]["m"] == 2.0


def test_apply_transform_idx_in_value_cols(spark):
    """idx_col doubling as a value column must not duplicate the carried
    schema field (r9 review)."""
    from dask_groupby_spark.udaf import groupby_apply_transform

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 5.0)], "k bigint, ts double"
    )
    out = groupby_apply_transform(
        df,
        "k",
        transform_fn=lambda pdf: {"c": pdf["ts"].cumsum()},
        value_cols=["ts"],
        idx_col="ts",
        output_schema="`c` double",
    ).orderBy("k", "ts").collect()
    assert [r["c"] for r in out] == [1.0, 3.0, 5.0]


def test_apply_reduce_nan_keys_round_trip(spark):
    """r10 audit: a NaN float group key came back from the Arrow boundary
    as SQL NULL — groupby_apply_reduce must return the key AS NaN, and
    keep it distinct from the NULL-key group."""
    import math

    nan = float("nan")
    df = spark.createDataFrame(
        [(nan, 1.0), (nan, 3.0), (None, 10.0), (1.0, 5.0)],
        "k double, x double",
    )
    out = groupby_apply_reduce(
        df,
        "k",
        reduce_fn=lambda pdf: {"s": float(pdf["x"].sum())},
        value_cols=["x"],
        output_schema="`s` double",
        sort=False,
    ).collect()
    got = {
        ("NaN" if (r["k"] is not None and math.isnan(r["k"])) else r["k"]): r["s"]
        for r in out
    }
    assert got == {"NaN": 4.0, None: 10.0, 1.0: 5.0}
