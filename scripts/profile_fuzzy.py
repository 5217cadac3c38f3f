"""Stage decomposition of edit_distance_pairs at the bench config
(sf0.1 customer, max_gram_df=256): cumulative prefix timings via the noop
sink, so the marginal cost of each pipeline stage is visible.

Usage: python scripts/profile_fuzzy.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_groupby_spark.operators.dedup import (
    bucket_pairs_from,
    char_grams,
)
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
MAX_DF = 256
GRAM_K = 3
MAX_DIST = 2


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile_fuzzy")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, SF, "customer")
    cust.cache().count()

    base = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("txt")
    ).where(F.col("c_name").isNotNull())

    def stage_buckets():
        gl = base.select(
            "id", F.explode(char_grams(F.col("txt"), GRAM_K)).alias("g")
        ).select("g", "id")
        return (
            gl.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.slice(F.array_sort(F.collect_list("id")), 1, MAX_DF + 1).alias(
                    "mem"
                ),
            )
            .where(F.col("__n") <= MAX_DF)
            .select("g", "mem")
            .where(F.size("mem") >= 2)
        )

    def stage_pairs():
        return bucket_pairs_from(
            stage_buckets(),
            "mem",
            lambda a, b: F.struct(a.alias("id_a"), b.alias("id_b")),
        )

    def stage_cand():
        return (
            stage_pairs()
            .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("__ng"))
            .drop("__ng")
        )

    def stage_joined():
        return (
            stage_cand()
            .join(
                base.select(F.col("id").alias("id_a"), F.col("txt").alias("t_a")),
                on="id_a",
            )
            .join(
                base.select(F.col("id").alias("id_b"), F.col("txt").alias("t_b")),
                on="id_b",
            )
        )

    def stage_full():
        dist = F.levenshtein("t_a", "t_b", threshold=max(MAX_DIST, 1))
        return (
            stage_joined()
            .withColumn("dist", dist.cast("int"))
            .where((F.col("dist") >= 0) & (F.col("dist") <= MAX_DIST))
            .select("id_a", "id_b", "dist")
        )

    stages = {
        "1_buckets": stage_buckets,
        "2_pairs": stage_pairs,
        "3_cand_dedup": stage_cand,
        "4_text_joins": stage_joined,
        "5_full": stage_full,
    }
    print(f"load_avg={os.getloadavg()}")
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"fuzzy:{name}")
        _noop(fn())  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            _noop(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best:7.3f}s")
    # cardinalities (once, for the record)
    print("pairs rows:", stage_pairs().count())
    print("cand rows:", stage_cand().count())
    spark.stop()


if __name__ == "__main__":
    main()
