"""SparkSession factory with 100 TB-minded defaults, scaled to local testing.

The settings below are the local-mode projection of a cluster config: AQE on
(runtime re-plan ≈ the reference's _choose_method heuristics,
flox/core.py:2215-2239), partition coalescing + skew-join splitting, Arrow
for any Pandas-UDF path, UTC session time so timestamp-derived group keys
match DuckDB/pandas oracles bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dask-groupby-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: "dict[str, str] | None" = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE skew handling: skewJoin splits oversized join partitions at
        # runtime (threshold: partition > 5× median AND > 256MB by default —
        # tune skewJoin.skewedPartitionFactor / skewedPartitionThresholdInBytes
        # per-cluster; forceOptimizeSkewedJoin extends the split even when it
        # adds a shuffle, worth enabling on clusters with known-pathological
        # join skew — measured ~10% planning overhead on iterative joins
        # here, so not a default).  NOTE AQE cannot split a skewed
        # AGGREGATION or WINDOW partition — a hot group key must be handled
        # in the operator plan itself: grouped_topk/sample_per_group take
        # skew_salt= (salted two-stage, asserted result-identical in
        # tests/test_skew.py), and sketch reductions (approx_quantile /
        # approx_nunique) replace the holistic buffers.  See docs/SCALE.md
        # for the per-operator contract.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores timestamp[ns]; Spark can't read TIMESTAMP(NANOS)
        # natively — read as BIGINT nanos, sources.load_table casts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # files: pack small test parquet into few tasks; at cluster scale
        # maxPartitionBytes governs scan granularity instead
        .config("spark.sql.files.maxPartitionBytes", "128MB")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
