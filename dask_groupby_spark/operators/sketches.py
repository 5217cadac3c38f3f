"""Mergeable-sketch tables: the incremental-aggregation pattern for 100 TB
streams of history (distinct users per day, cardinality per key) where
recounting the full corpus per query is the cost being amortized away.

Built on Spark's native DataSketches HLL expressions (JVM-side,
map-combinable, order-insensitive): per-batch sketch rows are persisted as
plain binary columns in parquet; queries union the sketches — never the
raw data.  A year of daily sketches is |keys|·365 KB-sized rows, and the
merge is associative, so any slice (per-day, per-month, all-time) computes
from the same table.  This is the same write-once/reuse-every-query
philosophy as ``plans.bucket_table`` and the persisted IVF/MinHash
indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hll_sketch_table(
    df: DataFrame,
    *by: str,
    value: str,
    lg_k: int = 12,
    path: str | None = None,
    mode: str = "append",
) -> DataFrame:
    """Per-group HLL sketches of ``value``: one binary sketch row per group
    (±~1.6% at the default lg_k=12, ~2.5 KB each; raise lg_k for tighter
    error).  One map-combined shuffle — raw values never leave their
    aggregation.  With ``path``, the rows are also appended to a parquet
    sketch table for :func:`hll_merge_count` queries (the incremental
    loop: sketch each new day/batch, append, never recount history)."""
    out = df.groupBy(*by).agg(F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias("hll"))
    if path is not None:
        out.write.mode(mode).parquet(path)
    return out


def hll_merge_count(
    sketches: DataFrame,
    *by: str,
    out: str = "approx_distinct",
) -> DataFrame:
    """Merged distinct-count estimates from sketch rows (the output of one
    or many :func:`hll_sketch_table` batches): groups the sketch rows by
    ``by`` (or fully, when no keys are given) and unions per group —
    associative, order-insensitive, so daily rows roll up to any window.
    The shuffle carries KB-sized sketches, never raw values."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"), F.lit(True))).alias(out)
    if by:
        return sketches.groupBy(*by).agg(agg)
    return sketches.agg(agg)


def hll_read(spark: SparkSession, path: str) -> DataFrame:
    """Load a persisted sketch table (parquet of (by…, hll) rows)."""
    return spark.read.parquet(path)


def cms_sketch_table(
    df: DataFrame,
    value: str,
    width: int = 1024,
    depth: int = 4,
    path: str | None = None,
    mode: str = "append",
    hasher: str = "fast",
) -> DataFrame:
    """Count-min sketch of ``value`` frequencies as a mergeable table of
    ``(d, bucket, cnt)`` rows — the frequency-estimation sibling of
    :func:`hll_sketch_table` (Cormode & Muthukrishnan 2005).

    Each input row maps to ``depth`` (row, bucket) counter increments; the
    groupBy is map-side combined, so the shuffle carries at most
    ``partitions x depth x width`` counter rows regardless of corpus size
    — raw values never leave their partition.  Sketch rows from separate
    batches/days ADD (counters are linear), so an appended parquet table
    rolls up over any time window without recounting history.

    ``width`` bounds the overestimate (error ~ 2N/width with probability
    1 - (1/2)^depth over the N total increments); ``hasher='portable'``
    switches to the md5-based cross-engine hash for oracle checking.
    """
    from .dedup import _hasher

    h = _hasher(hasher)
    col = F.col(value).cast("string")
    buckets = F.array(
        *[F.pmod(h(col, seed=f"cms{d}"), F.lit(width)) for d in range(depth)]
    )
    out = (
        df.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if path is not None:
        out.write.mode(mode).parquet(path)
    return out


def cms_estimate(
    sketches: DataFrame,
    queries: DataFrame,
    value: str,
    width: int = 1024,
    depth: int = 4,
    out: str = "est_count",
    hasher: str = "fast",
) -> DataFrame:
    """Frequency estimates for ``queries[value]`` from count-min sketch
    rows (one or many :func:`cms_sketch_table` batches, pre-unioned).

    Per query value: recompute its ``depth`` buckets, LEFT-join the
    counter rows (missing bucket = 0), SUM within each depth (batches
    add), then MIN across depths — the classic CM estimate, an upper
    bound on the true count.  The SKETCH side is broadcast — it is
    bounded at ``depth x width`` counter rows by construction (the
    preserved side of a left join cannot be the build side), so the
    query list may be arbitrarily large and the corpus is never
    rescanned.
    """
    from .dedup import _hasher

    h = _hasher(hasher)
    col = F.col(value).cast("string")
    buckets = F.array(
        *[F.pmod(h(col, seed=f"cms{d}"), F.lit(width)) for d in range(depth)]
    )
    q = queries.select(
        F.col(value), F.posexplode(buckets).alias("d", "bucket")
    )
    joined = q.join(F.broadcast(sketches), on=["d", "bucket"], how="left")
    per_depth = joined.groupBy(value, "d").agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("__c")
    )
    return per_depth.groupBy(value).agg(F.min("__c").alias(out))
