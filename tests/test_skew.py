"""Hot-key (skew) stress: one key owning 50% of all rows.

AQE splits skewed JOIN partitions but cannot split a skewed aggregation or
window partition, so the salted two-stage plans in operators/selection.py
are the scale path for hot group keys.  These tests pin down, on a
one-key-dominates dataset:

- result identity: salted == unsalted for top-k and per-group sampling;
- the structural bound that makes salting work: the partial stage's
  per-(key, salt) task never sees more than ~|group|/S rows, and the final
  stage ranks at most k*S survivors per key;
- plan shape: the salted plan adds exactly one extra Exchange (the partial
  window on (keys..., __salt)).
"""

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.operators.selection import grouped_topk, sample_per_group
from dask_groupby_spark.plans import count_exchanges

N = 20_000
SALT = 8


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" = 50% of rows; 10 cold keys share the rest
    df = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")))
        .alias("k"),
        F.col("id").alias("id"),
        (F.col("id") % 977).cast("double").alias("v"),
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_topk_salted_identical_under_skew(skewed):
    plain = {(r["k"], r["rank"], r["id"]) for r in
             grouped_topk(skewed, "k", order_col="v", k=25, tiebreak="id").collect()}
    salted = {(r["k"], r["rank"], r["id"]) for r in
              grouped_topk(skewed, "k", order_col="v", k=25, tiebreak="id",
                           skew_salt=SALT).collect()}
    assert plain == salted
    assert len({t[:2] for t in plain}) == len(plain)  # ranks unique per key


def test_topk_salted_plan_bounds_task_size(skewed):
    # structural property that bounds executor memory: the partial stage
    # partitions on (k, salt-of-tiebreak) — the hot key's rows spread across
    # SALT partitions within ~2x of evenly
    salt = F.pmod(F.xxhash64(F.col("id"), F.lit("topk-salt")), F.lit(SALT))
    sizes = (
        skewed.where(F.col("k") == "hot")
        .groupBy(salt.alias("s"))
        .count()
        .collect()
    )
    assert len(sizes) == SALT
    hot_total = sum(r["count"] for r in sizes)
    assert hot_total == N // 2
    assert max(r["count"] for r in sizes) < 2 * hot_total / SALT

    # survivor bound: the final window ranks <= k*SALT rows per key
    k = 25
    partial = grouped_topk(skewed, "k", order_col="v", k=k, tiebreak="id",
                           skew_salt=SALT)
    # (indirect but exact: per construction the pre-final filter keeps
    # row_number <= k within (k, salt) → <= k*SALT survivors per key)
    surv = (
        skewed.withColumn("__salt", salt)
        .withColumn(
            "__prank",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("k", "__salt")
                .orderBy(F.col("v").desc(), F.col("id").asc())
            ),
        )
        .where(F.col("__prank") <= k)
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] <= k * SALT for r in surv)
    assert partial.count() == len({r["k"] for r in skewed.select("k").distinct().collect()}) * k


def test_topk_salted_one_extra_exchange(skewed):
    plain = grouped_topk(skewed, "k", order_col="v", k=5, tiebreak="id")
    salted = grouped_topk(skewed, "k", order_col="v", k=5, tiebreak="id",
                          skew_salt=SALT)
    assert count_exchanges(plain) == 1
    assert count_exchanges(salted) == 2  # partial (k, salt) + final (k)


def test_sample_salted_identical_under_skew(skewed):
    plain = {(r["k"], r["id"]) for r in
             sample_per_group(skewed, "k", n=50, id_col="id", seed="s1").collect()}
    salted = {(r["k"], r["id"]) for r in
              sample_per_group(skewed, "k", n=50, id_col="id", seed="s1",
                               skew_salt=SALT).collect()}
    assert plain == salted
    # hot key contributes exactly n rows despite owning half the data
    hot = [t for t in plain if t[0] == "hot"]
    assert len(hot) == 50


def test_groupby_reduce_hot_key_sketch_path(skewed):
    """Sketch reductions keep bounded per-group state on a hot key and stay
    within the sketch's rank-error bound (percentile_approx guarantee)."""
    from dask_groupby_spark import groupby_reduce

    out = groupby_reduce(
        skewed, "k", func="approx_quantile", value="v",
        finalize_kwargs={"q": 0.5, "accuracy": 100},
    ).collect()
    got = {r["k"]: r["approx_quantile"] for r in out}
    # v = id % 977 over the hot key (uniform) → true median ≈ 488;
    # accuracy=100 bounds rank error at n/100 → value error ~ ±10 here
    assert abs(got["hot"] - 488.0) < 30
