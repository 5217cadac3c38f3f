"""F8 dtype-fidelity grid (FIXTURES.md): the func × input-dtype → output-dtype
promotion matrix mirroring flox/xrdtypes.py:153-209."""

import datetime

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark import groupby_reduce

LABELS = [0, 0, 1, 1]


@pytest.fixture(scope="module")
def grid(spark):
    rows = [
        (i, LABELS[i], i + 1, i + 1, i + 1, float(i + 1), float(i + 1),
         i % 2 == 0, f"s{i}", datetime.datetime(2024, 1, 1 + i))
        for i in range(4)
    ]
    return spark.createDataFrame(
        rows,
        "idx bigint, label bigint, val_i8 tinyint, val_i32 int, val_i64 bigint,"
        " val_f32 float, val_f64 double, val_bool boolean, val_str string, val_ts timestamp",
    )


CASES = [
    # (func, value col, expected spark dtype)
    ("nansum", "val_i8", "bigint"),     # small int promotes (xrdtypes.py:175-185)
    ("nansum", "val_i32", "bigint"),
    ("nansum", "val_i64", "bigint"),
    ("nansum", "val_f32", "float"),     # float32 preserved
    ("nansum", "val_f64", "double"),
    ("nansum", "val_bool", "bigint"),   # bool→int cast (core.py:2442-2443)
    ("nanprod", "val_i32", "bigint"),
    ("nanmean", "val_f32", "float"),    # mean preserves float32 (xrdtypes.py:158-165)
    ("nanmean", "val_i32", "double"),
    ("nanvar", "val_f32", "float"),
    ("nanstd", "val_i64", "double"),
    ("count", "val_str", "bigint"),     # count is intp (aggregations.py:292-301)
    ("count", "val_f64", "bigint"),
    ("nanmin", "val_i8", "tinyint"),    # min/max preserve dtype
    ("nanmax", "val_str", "string"),
    ("nanmin", "val_ts", "timestamp"),
    ("nanfirst", "val_str", "string"),
    ("nanlast", "val_bool", "boolean"),
    ("nanargmax", "val_f64", "bigint"), # arg-reductions are intp
    ("any", "val_i32", "boolean"),
    ("all", "val_f64", "boolean"),
    ("nanmedian", "val_f32", "float"),  # median preserves float width
    ("nanmedian", "val_i32", "double"),
    ("nanquantile", "val_f32", "double"),  # quantile always float64
    ("nanmode", "val_str", "string"),
    ("nanmean", "val_ts", "timestamp"),    # datetime mean restores dtype
]


@pytest.mark.parametrize("func,col,want", CASES)
def test_output_dtype(grid, func, col, want):
    kw = {"q": 0.5} if "quantile" in func else {}
    out = groupby_reduce(grid, "label", func=func, value=col, idx_col="idx", finalize_kwargs=kw)
    got = dict(out.dtypes)[func]
    assert got == want, f"{func}({col}) → {got}, want {want}"


def test_string_minmax_values(grid):
    out = groupby_reduce(grid, "label", func="nanmax", value="val_str")
    assert {r["label"]: r["nanmax"] for r in out.collect()} == {0: "s1", 1: "s3"}


def test_bool_sum_values(grid):
    out = groupby_reduce(grid, "label", func="nansum", value="val_bool")
    assert {r["label"]: r["nansum"] for r in out.collect()} == {0: 1, 1: 1}


def test_timestamp_minmax_first(grid):
    out = groupby_reduce(grid, "label", func="nanfirst", value="val_ts", idx_col="idx")
    got = {r["label"]: r["nanfirst"] for r in out.collect()}
    assert got[0].day == 1 and got[1].day == 3


def test_timestamp_null_is_missing(spark):
    df = spark.createDataFrame(
        [(0, 0, None), (1, 0, datetime.datetime(2024, 5, 5))],
        "idx bigint, label bigint, ts timestamp",
    )
    out = groupby_reduce(df, "label", func="count", value="ts")
    assert out.collect()[0]["count"] == 1
