"""Named-dimension front-end (xarray_reduce) — dim/retained-dim semantics
vs plain groupby_reduce and numpy (mirrors flox/xarray.py:65-160 behavior)."""

import math

import numpy as np
import pytest

from dask_groupby_spark import Bins, groupby_reduce, xarray_reduce

SEED = 4242


@pytest.fixture(scope="module")
def frame(spark):
    # long form of a labeled 3-D array value[x, y, label-source]
    rng = np.random.default_rng(SEED)
    rows = []
    i = 0
    for x in range(4):
        for y in range(3):
            for _ in range(5):
                rows.append(
                    (i, x, y, int(rng.integers(0, 3)), float(rng.random() * 10))
                )
                i += 1
    return spark.createDataFrame(
        rows, "idx bigint, x bigint, y bigint, label bigint, value double"
    )


def test_reduce_over_all_dims(frame):
    out = xarray_reduce(frame, "label", func="nansum", dims=["x", "y"])
    ref = groupby_reduce(frame, "label", func="nansum")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
    assert out.columns == ["label", "nansum"]


def test_retained_dim_becomes_axis(frame):
    out = xarray_reduce(frame, "label", func="nanmean", dims=["x", "y"], dim="y")
    ref = groupby_reduce(frame, "label", "x", func="nanmean")
    assert out.columns == ["label", "x", "nanmean"]
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[:2] == rb[:2] and math.isclose(ra[2], rb[2])


def test_dim_list_and_order(frame):
    # retained dims keep their dims-list order in the output key columns
    out = xarray_reduce(frame, "label", func="count", dims=["x", "y"], dim=[])
    assert out.columns == ["label", "x", "y", "count"]
    ref = groupby_reduce(frame, "label", "x", "y", func="count")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_isbin_wraps_edges(frame):
    out = xarray_reduce(
        frame,
        "value",
        func="count",
        dims=["x", "y"],
        value="value",
        expected_groups=[0.0, 2.5, 5.0, 7.5, 10.0],
        isbin=True,
    )
    ref = groupby_reduce(
        frame, "value", func="count", expected_groups=Bins([0.0, 2.5, 5.0, 7.5, 10.0])
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_skipna_dispatch(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, float("nan")), (2, 1, 3.0)],
        "idx bigint, g bigint, value double",
    )
    sk = {r["g"]: r["s"] for r in
          xarray_reduce(df, "g", func="sum", dims=[], skipna=True, alias="s").collect()}
    assert sk[0] == 1.0 and sk[1] == 3.0
    no = {r["g"]: r["s"] for r in
          xarray_reduce(df, "g", func="sum", dims=[], skipna=False, alias="s").collect()}
    assert math.isnan(no[0]) and no[1] == 3.0


def test_errors(frame):
    with pytest.raises(ValueError, match="not in dims"):
        xarray_reduce(frame, "label", func="sum", dims=["x"], dim="z")
    with pytest.raises(ValueError, match="both by and dim"):
        xarray_reduce(frame, "x", func="sum", dims=["x", "y"], dim="x")


def test_interval_labels_on_binned_grouper(spark):
    """interval_labels=True replaces bin codes with pandas-style interval
    strings (the reference's pd.IntervalIndex output coordinate,
    flox/xarray.py:370-378); codes stay bare without it."""
    from dask_groupby_spark import Bins

    df = spark.createDataFrame(
        [(0, 5.0, 1.0), (1, 15.0, 2.0), (2, 15.5, 4.0), (3, 25.0, 8.0)],
        "idx bigint, q double, value double",
    )
    coded = xarray_reduce(
        df, "q", func="sum", dims=["idx"], dim="idx",
        expected_groups=Bins([0.0, 10.0, 20.0, 30.0]),
    )
    assert {r["q_bin"] for r in coded.collect()} == {0, 1, 2}

    labeled = xarray_reduce(
        df, "q", func="sum", dims=["idx"], dim="idx",
        expected_groups=Bins([0.0, 10.0, 20.0, 30.0]),
        interval_labels=True,
    )
    got = {r["q_bin"]: r["sum"] for r in labeled.collect()}
    assert got == {"(0.0, 10.0]": 1.0, "(10.0, 20.0]": 6.0, "(20.0, 30.0]": 8.0}

    left = xarray_reduce(
        df, "q", func="sum", dims=["idx"], dim="idx",
        expected_groups=Bins([0.0, 10.0, 20.0, 30.0], closed="left"),
        interval_labels=True,
    )
    assert "[0.0, 10.0)" in {r["q_bin"] for r in left.collect()}


def test_dataset_form_multi_variable(spark):
    """value=list reduces every variable in ONE fused aggregate (the
    reference's Dataset handling: flox/xarray.py loops data_vars)."""
    df = spark.createDataFrame(
        [(0, "a", 1.0, 10.0), (1, "a", 2.0, 20.0), (2, "b", 3.0, float("nan"))],
        "idx bigint, g string, u double, v double",
    )
    out = xarray_reduce(
        df, "g", func="mean", value=["u", "v"], dims=["idx"], dim="idx",
        skipna=True,
    )
    got = {r["g"]: (r["u"], r["v"]) for r in out.collect()}
    assert got["a"] == (1.5, 15.0)
    assert got["b"][0] == 3.0
    assert got["b"][1] is None or math.isnan(got["b"][1])  # all-NaN group

    with pytest.raises(ValueError, match="single-variable"):
        xarray_reduce(
            df, "g", func="mean", value=["u", "v"], dims=["idx"], dim="idx",
            min_count=1,
        )


def test_passthrough_variables(spark):
    """Missing-variable passthrough (flox/xarray.py:235-265: a Dataset var
    lacking the reduced dim survives unchanged): constant-per-group columns
    ride through as extra keys — same single shuffle."""
    df = spark.createDataFrame(
        [
            (0, "s1", "Alpha", 1.0), (1, "s1", "Alpha", 3.0),
            (2, "s2", "Beta", 10.0),
        ],
        "idx bigint, station string, station_name string, value double",
    )
    out = xarray_reduce(
        df, "station", func="mean", dims=["idx"], dim="idx",
        passthrough=["station_name"],
    )
    got = {r["station"]: (r["station_name"], r["mean"]) for r in out.collect()}
    assert got == {"s1": ("Alpha", 2.0), "s2": ("Beta", 10.0)}

    with pytest.raises(ValueError, match="reduced dimension"):
        xarray_reduce(
            df, "station", func="mean", dims=["idx"], dim="idx",
            passthrough=["idx"],
        )

    # Dataset form carries passthrough too
    multi = xarray_reduce(
        df, "station", func="mean", value=["value"], dims=["idx"], dim="idx",
        passthrough=["station_name"],
    )
    assert {r["station_name"] for r in multi.collect()} == {"Alpha", "Beta"}
