"""Generate a synthetic sf1 benchmark directory (10x sf0.1) for the scale-
validation bench (VERDICT r4 item 4): replicate the five bench tables ten
times with per-copy key shifts and content perturbation, so cardinalities
scale the way real data would:

- lineitem: l_orderkey shifted per copy -> 1.5M distinct orders at sf1
  (matches real TPC-H sf1), group count scales 10x with the rows;
- orders: o_orderkey shifted with the same span, so lineitem⋈orders stays
  referentially intact per copy;
- events:   event_id/user_id shifted, ts jittered by copy seconds;
- documents: doc_id shifted; text vowels rotated per copy (translate(),
  JVM-side) so copies are NOT near-duplicates of each other - the dup rate
  stays ~sf0.1's instead of every doc gaining 9 artificial clones;
- embeddings: vec_id shifted; vectors rotated by a per-copy affine tweak so
  LSH/IVF bucket occupancy scales instead of collapsing.

Output: $1 (default /tmp/sf1) with <table>.parquet files readable by
dask_groupby_spark.sources.load_table.  Bench-only data - correctness keys
still verify against the driver's own testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
VOWELS = "aeiou"


def _rot(i: int) -> str:
    return VOWELS[i % 5:] + VOWELS[: i % 5]


def main(out_dir: str = "/tmp/sf1", copies: int = 10) -> None:
    spark = get_spark()
    os.makedirs(out_dir, exist_ok=True)

    li = load_table(spark, SRC, "lineitem")
    orders = load_table(spark, SRC, "orders")
    ev = load_table(spark, SRC, "events")
    docs = load_table(spark, SRC, "documents")
    emb = load_table(spark, SRC, "embeddings")
    cust = load_table(spark, SRC, "customer")

    okey_span = li.agg(F.max("l_orderkey")).first()[0] + 1
    eid_span = ev.agg(F.max("event_id")).first()[0] + 1
    uid_span = ev.agg(F.max("user_id")).first()[0] + 1
    did_span = docs.agg(F.max("doc_id")).first()[0] + 1
    vid_span = emb.agg(F.max("vec_id")).first()[0] + 1
    ckey_span = cust.agg(F.max("c_custkey")).first()[0] + 1

    def replicate(df, build):
        parts = [build(df, i) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    tables = {
        "lineitem": replicate(
            li,
            lambda d, i: d.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span)
            ),
        ),
        # orders shares l_orderkey's per-copy shift so lineitem⋈orders joins
        # stay referentially intact at sf1 (salted_join bench row)
        "orders": replicate(
            orders,
            lambda d, i: d.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)
            ),
        ),
        "events": replicate(
            ev,
            lambda d, i: d.withColumn("event_id", F.col("event_id") + F.lit(i * eid_span))
            .withColumn("user_id", F.col("user_id") + F.lit(i * uid_span))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND")),
        ),
        "documents": replicate(
            docs,
            lambda d, i: d.withColumn("doc_id", F.col("doc_id") + F.lit(i * did_span))
            .withColumn("text", F.translate(F.col("text"), VOWELS, _rot(i))),
        ),
        # customer: c_custkey shifted and c_name REBUILT from the new key in
        # the TPC-H "Customer#%09d" shape, so fuzzy_match's 3-gram blocking
        # sees a 10x-denser zero-padded-prefix stop-gram field at sf1
        "customer": replicate(
            cust,
            lambda d, i: d.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * ckey_span)
            ).withColumn(
                "c_name",
                F.concat(
                    F.lit("Customer#"),
                    F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                ),
            ),
        ),
        "embeddings": replicate(
            emb,
            lambda d, i: d.withColumn("vec_id", F.col("vec_id") + F.lit(i * vid_span))
            .withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: x * (1.0 + 0.002 * i) + 0.003 * i * F.cos(j.cast("double")),
                ),
            ),
        ),
    }
    for name, df in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.repartition(32).write.mode("overwrite").parquet(path)
        print(f"wrote {path}: {spark.read.parquet(path).count()} rows")

    # fixed-size dims, shipped VERBATIM: nation/region are scale-invariant
    # in TPC-H (25/5 rows at every SF) and the replicated tables keep
    # their foreign keys unshifted (c_nationkey stays 0..24), so the
    # copies stay referentially intact.  nation unblocks the
    # reindex_fill battery row (its oracle reads the nation domain).
    for name in ("nation", "region"):
        path = os.path.join(out_dir, f"{name}.parquet")
        load_table(spark, SRC, name).write.mode("overwrite").parquet(path)
        print(f"wrote {path}: {spark.read.parquet(path).count()} rows (verbatim dim)")


if __name__ == "__main__":
    # make_sf1.py OUT [COPIES] — with SPARK_GRAFT_SF_SRC to replicate from
    # a different base (e.g. SRC=/tmp/sf1 COPIES=10 -> an sf10 directory,
    # 100x driver scale; the per-copy perturbations compose safely)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, copies)
