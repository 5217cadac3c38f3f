"""groupby_pivot / melt: wide grouped reductions and the round trip."""

import pytest
from pyspark.sql import functions as F

from dask_groupby_spark.reshape import groupby_pivot, melt


@pytest.fixture(scope="module")
def longdf(spark):
    rows = [
        ("a", 1, 10.0), ("a", 1, 20.0), ("a", 2, 5.0),
        ("b", 2, 7.0), ("b", 3, float("nan")), ("b", 3, 1.0),
    ]
    return spark.createDataFrame(rows, "r string, c bigint, value double")


def test_pivot_sum_declared_domain(longdf):
    out = groupby_pivot(longdf, "r", "c", func="nansum", col_values=[1, 2, 3])
    rows = {r["r"]: r for r in out.collect()}
    assert rows["a"]["c_1"] == 30.0 and rows["a"]["c_2"] == 5.0 and rows["a"]["c_3"] == 0.0
    assert rows["b"]["c_2"] == 7.0 and rows["b"]["c_3"] == 1.0  # NaN skipped
    assert out.columns == ["r", "c_1", "c_2", "c_3"]


def test_pivot_mean_discovered_domain_and_fill(longdf):
    out = groupby_pivot(longdf, "r", "c", func="nanmean", fill_value=-1.0)
    rows = {r["r"]: r for r in out.collect()}
    assert rows["a"]["c_1"] == pytest.approx(15.0)
    assert rows["a"]["c_3"] == -1.0  # empty cell filled
    assert rows["b"]["c_1"] == -1.0


def test_pivot_single_shuffle(longdf):
    plan = groupby_pivot(
        longdf, "r", "c", func="count", col_values=[1, 2, 3], sort=False
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_melt_round_trip(longdf, spark):
    wide = groupby_pivot(longdf, "r", "c", func="nansum", col_values=[1, 2, 3])
    back = melt(wide, ["r"], ["c_1", "c_2", "c_3"], var_name="c", value_name="s")
    got = {(r["r"], r["c"]): r["s"] for r in back.collect()}
    assert got[("a", "c_1")] == 30.0 and got[("b", "c_3")] == 1.0
    assert len(got) == 6
    plan = back._jdf.queryExecution().executedPlan().toString()
    # unpivot itself is the map-only Expand operator — no join, no shuffle of
    # its own (the exchanges in the plan belong to the upstream pivot/sort)
    assert "Expand" in plan and "Join" not in plan


def test_rollup_and_cube(longdf):
    from dask_groupby_spark.reshape import groupby_rollup

    out = groupby_rollup(longdf, "r", "c", func="count")
    rows = {(r["r"], r["c"], r["__grouping_id"]): r["count"] for r in out.collect()}
    # leaf level
    assert rows[("a", 1, 0)] == 2 and rows[("b", 3, 0)] == 1  # NaN excluded
    # per-r subtotal (c rolled up → gid 1)
    assert rows[("a", None, 1)] == 3 and rows[("b", None, 1)] == 2
    # grand total (gid 3)
    assert rows[(None, None, 3)] == 5
    # rollup has NO per-c-only level; cube does (gid 2)
    assert not any(gid == 2 for (_, _, gid) in rows)
    cube = groupby_rollup(longdf, "r", "c", func="count", cube=True)
    crows = {(r["r"], r["c"], r["__grouping_id"]): r["count"] for r in cube.collect()}
    assert crows[(None, 1, 2)] == 2 and crows[(None, 2, 2)] == 2
    plan = groupby_rollup(longdf, "r", "c", func="count", sort=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and plan.count("Exchange") == 1


def test_pivot_discovery_guard(spark):
    """High-cardinality col_by without a declared domain raises instead of
    collecting an unbounded label set; the limit bounds the collect itself."""
    import pytest

    from dask_groupby_spark.reshape import groupby_pivot

    df = spark.range(5000).selectExpr(
        "id % 3 as g", "concat('c', id) as c", "cast(id as double) as value"
    )
    with pytest.raises(ValueError, match="max_discovered"):
        groupby_pivot(df, "g", "c", max_discovered=100)
    # declared domain always works, whatever the cardinality
    out = groupby_pivot(df, "g", "c", col_values=["c1", "c2"]).collect()
    assert len(out) == 3
    # small observed domains keep working with discovery
    small = spark.range(100).selectExpr(
        "id % 3 as g", "concat('s', id % 4) as c", "cast(id as double) as value"
    )
    assert len(groupby_pivot(small, "g", "c").columns) == 1 + 4


def test_pivot_sanitized_name_collision_raises(spark):
    """'a.b' and 'a-b' both sanitize to 'a_b' — emitting two identically
    named columns breaks every downstream select (r9 review)."""
    import pytest as _pytest

    from dask_groupby_spark.reshape import groupby_pivot

    df = spark.createDataFrame(
        [(1, "a.b", 1.0), (1, "a-b", 2.0)], "k bigint, c string, v double"
    )
    with _pytest.raises(ValueError, match="sanitize to the same"):
        groupby_pivot(
            df, "k", col_by="c", value="v", func="nansum",
            col_values=["a.b", "a-b"],
        )
