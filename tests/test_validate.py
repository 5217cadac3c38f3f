"""Data-quality validation (operators/validate.py)."""

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.operators import check_referential, check_rules, check_unique


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -1.0, "b"),     # violates positive
            (3, None, "a"),     # NULL -> violates positive (conservative)
            (3, 5.0, "zzz"),    # dup id, violates enum
        ],
        "id bigint, v double, cat string",
    )


class TestCheckRules:
    def test_counts(self, vdf):
        out = {r["rule"]: r for r in check_rules(vdf, {
            "positive": F.col("v") > 0,
            "enum": F.col("cat").isin("a", "b"),
            "id_set": F.col("id").isNotNull(),
        }).collect()}
        assert out["positive"]["n_rows"] == 4
        assert out["positive"]["n_violations"] == 2      # -1 and NULL
        assert out["enum"]["n_violations"] == 1
        assert out["id_set"]["n_violations"] == 0
        assert out["positive"]["violation_frac"] == pytest.approx(0.5)

    def test_single_pass_plan(self, vdf):
        import re

        from dask_groupby_spark.plans import physical_plan

        plan = physical_plan(check_rules(vdf, {"a": F.col("v") > 0, "b": F.col("id") > 0}))
        # one scan, one partial/final aggregate pair regardless of rule count
        assert len(re.findall(r"^\(\d+\) Scan", plan, re.M)) == 1, plan
        assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 2, plan

    def test_empty_rules_raise(self, vdf):
        with pytest.raises(ValueError):
            check_rules(vdf, {})


class TestCheckUnique:
    def test_summary(self, spark, vdf):
        r = check_unique(vdf, "id").collect()[0]
        assert r["n_rows"] == 4 and r["n_keys"] == 3
        assert r["n_dup_keys"] == 1 and r["n_dup_rows"] == 1

    def test_multi_col_and_null_keys(self, spark):
        df = spark.createDataFrame(
            [(1, None), (1, None), (2, "x")], "a bigint, b string"
        )
        r = check_unique(df, ["a", "b"]).collect()[0]
        assert r["n_keys"] == 2 and r["n_dup_rows"] == 1

    def test_sample_keys(self, vdf):
        rows = check_unique(vdf, "id", sample_keys=5).collect()
        assert [(r["id"], r["cnt"]) for r in rows] == [(3, 2)]


class TestCheckReferential:
    def test_orphans(self, spark):
        child = spark.createDataFrame(
            [(1, "x"), (2, "y"), (9, "z"), (None, "w")], "k bigint, p string"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
        r = check_referential(child, parent, "k").collect()[0]
        assert r["n_rows"] == 4 and r["n_orphans"] == 2  # 9 and NULL
        assert r["orphan_frac"] == pytest.approx(0.5)

    def test_sample_orphans(self, spark):
        child = spark.createDataFrame([(9, "z")], "k bigint, p string")
        parent = spark.createDataFrame([(1,)], "k bigint")
        rows = check_referential(child, parent, "k", sample_orphans=10).collect()
        assert [r["k"] for r in rows] == [9]

    def test_parent_col_rename(self, spark):
        child = spark.createDataFrame([(1,), (5,)], "k bigint")
        parent = spark.createDataFrame([(1,)], "pk bigint")
        r = check_referential(child, parent, "k", parent_col="pk").collect()[0]
        assert r["n_orphans"] == 1


def test_rule_name_with_quote_rejected(spark):
    from pyspark.sql import functions as F

    from dask_groupby_spark.operators import check_rules

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        check_rules(df, {"isn't null": F.col("v").isNotNull()})
    with pytest.raises(ValueError):
        check_rules(df, {"a`b": F.col("v").isNotNull()})


# ---------------------------------------------------------------- table_diff


class TestTableDiff:
    def _two(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (None, "n", 0.0)],
            "k bigint, name string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 1.0),          # unchanged
             (2, "B", 2.0),          # changed (name)
             (4, "d", 4.0),          # added
             (None, "n", 0.0)],      # unchanged (NULL key diffs correctly)
            "k bigint, name string, v double",
        )
        return old, new

    def test_summary_counts(self, spark):
        from dask_groupby_spark.operators import table_diff

        old, new = self._two(spark)
        r = table_diff(old, new, "k").collect()[0]
        assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (1, 1, 1, 2)

    def test_detail_statuses(self, spark):
        from dask_groupby_spark.operators import table_diff

        old, new = self._two(spark)
        got = {r["k"]: r["diff_status"] for r in table_diff(old, new, "k", detail=True).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", None: "unchanged"}

    def test_null_value_change_detected(self, spark):
        from dask_groupby_spark.operators import table_diff

        old = spark.createDataFrame([(1, None)], "k bigint, v double")
        new = spark.createDataFrame([(1, 5.0)], "k bigint, v double")
        assert table_diff(old, new, "k").collect()[0]["n_changed"] == 1
        # NULL -> NULL is unchanged (null-safe comparison)
        assert table_diff(old, old, "k").collect()[0]["n_unchanged"] == 1

    def test_compare_cols_subset(self, spark):
        from dask_groupby_spark.operators import table_diff

        old = spark.createDataFrame([(1, "a", 1.0)], "k bigint, name string, v double")
        new = spark.createDataFrame([(1, "ZZZ", 1.0)], "k bigint, name string, v double")
        r = table_diff(old, new, "k", compare_cols=["v"]).collect()[0]
        assert r["n_unchanged"] == 1      # name ignored

    def test_single_exchange_and_validation(self, spark):
        import pytest as _pt

        from dask_groupby_spark.operators import table_diff
        from dask_groupby_spark.plans import count_exchanges

        old, new = self._two(spark)
        assert count_exchanges(table_diff(old, new, "k", detail=True)) == 1
        with _pt.raises(ValueError):
            table_diff(old, new, "nope")


def test_check_rules_rejects_backslash_names(spark):
    from dask_groupby_spark.operators import check_rules

    df = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError, match="backslash"):
        check_rules(df, {"bad\\name": F.col("v") > 0})


def test_check_referential_single_scan_counts(spark):
    """r7 review: the summary path now produces both counts from ONE
    child scan; NULL child keys still count as orphans."""
    from dask_groupby_spark.operators import check_referential

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "fk bigint")
    row = check_referential(child, parent, "fk").collect()[0]
    assert row["n_rows"] == 4 and row["n_orphans"] == 2
    assert abs(row["orphan_frac"] - 0.5) < 1e-12
    # sample path unchanged
    from dask_groupby_spark.operators import check_referential as cr
    orphans = cr(child, parent, "fk", sample_orphans=10).collect()
    assert sorted((r["fk"] is None, r["fk"]) for r in orphans) == [
        (False, 99), (True, None)
    ]


def test_table_profile_rejects_unquotable_names(spark):
    from dask_groupby_spark.operators.profile import table_profile

    df = spark.createDataFrame([(1,)], "v bigint").withColumnRenamed("v", "a`b")
    with pytest.raises(ValueError, match="not profilable"):
        table_profile(df)


def test_k_anonymity_summary_and_sample(spark):
    """k-anonymity audit: summary counts, NULL-combination grouping,
    sample view of the smallest offending groups."""
    from dask_groupby_spark.operators import k_anonymity

    rows = (
        [("US", 1990)] * 5      # size 5 -> fine at k=5
        + [("US", 1991)] * 2    # violating
        + [("DE", 1990)] * 1    # violating
        + [(None, 1990)] * 6    # NULLs group together, size 6 -> fine
    )
    df = spark.createDataFrame(rows, "country string, birth_year bigint")
    s = k_anonymity(df, ["country", "birth_year"], k=5).collect()[0]
    assert (s["n_rows"], s["n_groups"]) == (14, 4)
    assert s["min_group_size"] == 1
    assert (s["n_violating_groups"], s["n_violating_rows"]) == (2, 3)
    assert s["k_anon"] is False
    ok = k_anonymity(df, ["country", "birth_year"], k=1).collect()[0]
    assert ok["k_anon"] is True and ok["n_violating_groups"] == 0
    sample = k_anonymity(
        df, ["country", "birth_year"], k=5, sample_groups=10
    ).collect()
    assert [(r["country"], r["birth_year"], r["group_size"]) for r in sample] == [
        ("DE", 1990, 1),
        ("US", 1991, 2),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity(df, "country", k=0)
