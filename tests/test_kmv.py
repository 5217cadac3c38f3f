"""KMV distinct/set-overlap sketches: exactness regime vs Python sets,
estimator accuracy, merge associativity, overlap algebra."""

import random

import pytest
from pyspark.sql import functions as F

from dask_groupby_spark.operators import (
    kmv_distinct,
    kmv_merge,
    kmv_overlap,
    kmv_sketch_table,
)


@pytest.fixture(scope="module")
def grouped_values(spark):
    rng = random.Random(80802)
    rows = [
        (g, rng.randrange(300))
        for g in ["a", "b", "c"]
        for _ in range(1500)
    ]
    rows.append(("empty_vals", None))
    truth = {}
    for g, v in rows:
        if v is not None:
            truth.setdefault(g, set()).add(v)
    df = spark.createDataFrame(rows, "g string, v bigint")
    return df, truth


def test_exact_regime_matches_count_distinct(spark, grouped_values):
    df, truth = grouped_values
    got = {
        r["g"]: r["distinct_est"]
        for r in kmv_distinct(df, "g", value="v", k=1024).collect()
    }
    assert set(got) == set(truth)  # all-NULL group dropped
    for g, s in truth.items():
        assert got[g] == float(len(s))


def test_sketch_is_sorted_distinct_and_capped(spark, grouped_values):
    df, _ = grouped_values
    rows = kmv_sketch_table(df, "g", value="v", k=16).collect()
    for r in rows:
        arr = r["kmv"]
        assert len(arr) == 16
        assert arr == sorted(set(arr))
        assert r["kmv_k"] == 16


def test_estimator_accuracy_when_sampling(spark):
    # 20k distinct values, k=512 -> relative error should be ~1/sqrt(510)
    df = spark.range(20_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, "g", value="v", k=512).collect()[0]["distinct_est"]
    assert est == pytest.approx(20_000, rel=0.15)


def test_merge_equals_sketch_of_union(spark):
    # sketch(day1 U day2) == merge(sketch(day1), sketch(day2))
    d1 = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    d2 = spark.range(3000, 9000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    k = 256
    both = kmv_sketch_table(d1.unionAll(d2), "g", value="v", k=k).collect()[0]["kmv"]
    parts = kmv_sketch_table(d1, "g", value="v", k=k).unionByName(
        kmv_sketch_table(d2, "g", value="v", k=k)
    )
    merged = kmv_merge(parts, "g", k=k).collect()[0]["kmv"]
    assert merged == both


def test_overlap_exact_regime(spark):
    # A = 0..599, B = 300..899, C disjoint -> exact union/intersection/jaccard
    rows = (
        [("A", v) for v in range(600)]
        + [("B", v) for v in range(300, 900)]
        + [("C", v) for v in range(10_000, 10_100)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint")
    sk = kmv_sketch_table(df, "g", value="v", k=4096)
    got = {
        (r["group_a"], r["group_b"]): (r["union_est"], r["inter_est"], r["jaccard"])
        for r in kmv_overlap(sk, group_col="g", k=4096).collect()
    }
    assert got[("A", "B")] == (900.0, 300.0, 300.0 / 900.0)
    assert got[("A", "C")] == (700.0, 0.0, 0.0)
    assert got[("B", "C")] == (700.0, 0.0, 0.0)
    assert len(got) == 3  # unordered pairs only


def test_overlap_estimate_regime(spark):
    # big overlapping sets with k << distinct: jaccard within tolerance
    a = spark.range(0, 30_000).select(F.lit("A").alias("g"), F.col("id").alias("v"))
    b = spark.range(15_000, 45_000).select(F.lit("B").alias("g"), F.col("id").alias("v"))
    sk = kmv_sketch_table(a.unionAll(b), "g", value="v", k=512)
    r = kmv_overlap(sk, group_col="g", k=512).collect()[0]
    assert r["union_est"] == pytest.approx(45_000, rel=0.2)
    assert r["jaccard"] == pytest.approx(15_000 / 45_000, abs=0.08)
    assert r["inter_est"] == pytest.approx(15_000, rel=0.3)


def test_many_partitions_same_result(spark, grouped_values):
    # the 3-stage bounded top-k must be repartition-invariant
    df, truth = grouped_values
    a = {
        r["g"]: r["kmv"]
        for r in kmv_sketch_table(df.repartition(1), "g", value="v", k=64).collect()
    }
    b = {
        r["g"]: r["kmv"]
        for r in kmv_sketch_table(df.repartition(16), "g", value="v", k=64).collect()
    }
    assert a == b


def test_partial_method_bit_identical(spark, grouped_values):
    # the mapInPandas bounded-buffer tier must produce the SAME sketch as
    # the JVM distinct tier (the sketch is a function of the value SET —
    # which excludes NULL).  NULLs are deliberately mixed into a real
    # group: xxhash64(NULL) is the non-null seed, so an unfiltered partial
    # tier would count NULL as a distinct element and inject a
    # near-minimum hash into group "a"'s sketch (ADVICE r8 regression).
    df, _ = grouped_values
    nulls = spark.createDataFrame([("a", None)] * 5, "g string, v bigint")
    df = df.unionByName(nulls)
    for k in (16, 1024):
        a = {
            r["g"]: r["kmv"]
            for r in kmv_sketch_table(
                df.repartition(16), "g", value="v", k=k, method="partial"
            ).collect()
        }
        b = {
            r["g"]: r["kmv"]
            for r in kmv_sketch_table(df, "g", value="v", k=k).collect()
        }
        assert a == b


def test_partial_method_overlap_and_estimates(spark):
    a = spark.range(0, 30_000).select(F.lit("A").alias("g"), F.col("id").alias("v"))
    b = spark.range(15_000, 45_000).select(F.lit("B").alias("g"), F.col("id").alias("v"))
    sk = kmv_sketch_table(a.unionAll(b), "g", value="v", k=512, method="partial")
    r = kmv_overlap(sk, group_col="g", k=512).collect()[0]
    assert r["union_est"] == pytest.approx(45_000, rel=0.2)
    assert r["jaccard"] == pytest.approx(15_000 / 45_000, abs=0.08)


def test_k_validation(spark, grouped_values):
    df, _ = grouped_values
    with pytest.raises(ValueError):
        kmv_sketch_table(df, "g", value="v", k=1)
    with pytest.raises(ValueError):
        kmv_sketch_table(df, "g", value="v", k=8, method="nope")
