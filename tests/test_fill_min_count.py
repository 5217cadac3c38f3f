"""F5 fill_value / min_count decision table (FIXTURES.md; mirrors
flox test_fill_value_behaviour test_core.py:1064 and min_count defaulting
flox/core.py:2545-2557)."""

import math

import pytest

from dask_groupby_spark import groupby_reduce

NAN = float("nan")


@pytest.fixture(scope="module")
def f5(spark):
    # labels in {0,1,2,4}; label 3 of expected [0..4] absent;
    # group 2 all-NaN; group 4 exactly one valid value
    rows = [
        (0, 0, 1.0),
        (1, 0, 2.0),
        (2, 1, 3.0),
        (3, 1, NAN),
        (4, 2, NAN),
        (5, 2, NAN),
        (6, 4, 7.0),
        (7, 4, NAN),
        (8, 1, 5.0),
        (9, 0, 4.0),
    ]
    return spark.createDataFrame(rows, "idx bigint, label bigint, val double")


def get(df, col):
    return {r["label"]: r[col] for r in df.collect()}


def isnan(x):
    return x is not None and isinstance(x, float) and math.isnan(x)


def test_nansum_no_fill(f5):
    m = get(groupby_reduce(f5, "label", func="nansum", value="val"), "nansum")
    assert m == {0: 7.0, 1: 8.0, 2: 0.0, 4: 7.0}  # all-NaN group → identity 0


def test_nansum_expected_fill(f5):
    m = get(
        groupby_reduce(
            f5, "label", func="nansum", value="val",
            expected_groups=[0, 1, 2, 3, 4], fill_value=123.0,
        ),
        "nansum",
    )
    # fill_value + expected_groups forces min_count=1 (ref core.py:2545-2557):
    # the all-NaN group 2 gets fill_value too, not the identity
    assert m == {0: 7.0, 1: 8.0, 2: 123.0, 3: 123.0, 4: 7.0}


def test_nansum_min_count_2(f5):
    m = get(
        groupby_reduce(
            f5, "label", func="nansum", value="val", min_count=2, fill_value=-9.0
        ),
        "nansum",
    )
    # group 4 has only 1 valid → masked
    assert m == {0: 7.0, 1: 8.0, 2: -9.0, 4: -9.0}


def test_nansum_min_count_no_fill_promotes_nan(f5):
    m = get(
        groupby_reduce(f5, "label", func="nansum", value="val", min_count=2),
        "nansum",
    )
    assert m[0] == 7.0 and m[1] == 8.0 and isnan(m[2]) and isnan(m[4])


def test_nanmean_all_nan_group_is_nan_not_fill(f5):
    # without min_count, a PRESENT all-NaN group is NaN (0/0), fill_value
    # only applies to absent expected groups (ref core.py:1144-1177)
    m = get(
        groupby_reduce(
            f5, "label", func="nanmean", value="val", expected_groups=[0, 1, 2, 3, 4]
        ),
        "nanmean",
    )
    assert m[0] == 7.0 / 3 and isnan(m[2]) and isnan(m[3])


def test_nanmin_forced_min_count(f5):
    # nanmin forces min_count=1 (ref aggregations.py:852-858): all-NaN group
    # gets the fill
    m = get(
        groupby_reduce(f5, "label", func="nanmin", value="val", fill_value=-1.0),
        "nanmin",
    )
    assert m == {0: 1.0, 1: 3.0, 2: -1.0, 4: 7.0}


def test_count_absent_group_default_zero(f5):
    m = get(
        groupby_reduce(f5, "label", func="count", value="val", expected_groups=[0, 1, 2, 3, 4]),
        "count",
    )
    assert m == {0: 3, 1: 2, 2: 0, 3: 0, 4: 1}


@pytest.mark.parametrize(
    "func,expect2",
    # NaN is truthy (numpy semantics): any/all of the all-NaN group → True
    [("nanprod", 1.0), ("any", True), ("all", True)],
)
def test_identity_fills_for_all_missing_groups(f5, func, expect2):
    m = get(groupby_reduce(f5, "label", func=func, value="val"), func)
    assert m[2] == expect2


def test_bool_result_nan_fill_promotes(spark):
    """min_count + NaN fill on a boolean reduction must promote to double
    (r9 review: the unpromoted plan failed analysis mixing bool/double)."""
    import math

    from dask_groupby_spark import groupby_reduce

    df = spark.createDataFrame(
        [("a", True), ("a", False), ("b", True)], "k string, v boolean"
    )
    out = {
        r["k"]: r["any"]
        for r in groupby_reduce(
            df, "k", func="any", value="v", min_count=2,
            fill_value=float("nan"),
        ).collect()
    }
    assert out["a"] == 1.0
    assert math.isnan(out["b"])
