"""Tier-vs-tier certificate for the fuzzy-match family at oracle-hostile
scale (r12, VERDICT r11 #4).

At sf10 the customer corpus (~1.5M template names) yields a candidate
set whose full-blocking DuckDB oracle is a DuckDB bound (37M exact
pairs already at sf1), so `fuzzy_match`/`fuzzy_scaled` cannot get
direct oracle rows there.  This script supplies the cheaper
verification tier the batteries use for the closure-class keys: run the
engine's TWO independent blocking tiers —

  plain   every surviving-gram bucket enumerates pairs
  prefix  PPJoin prefix filter: block on the d·k+1 globally-rarest
          grams only (identical recall by the prefix-filter theorem)

— under the SAME density-relative cap, and require the final verified
pair MULTISETS (id_a, id_b, dist) to be exactly equal.  The two tiers
share no blocking plan (different candidate generation, different
shuffles), so agreement at scale certifies both against scale bugs the
sf0.01 oracle rows can't see (the r10 cliff class).  A sampled digest
(count + order-insensitive 96-bit sum of per-row md5) keeps driver
memory flat at any pair count.

Usage: python scripts/soak_fuzzy_tiers.py [sf_dir] [max_dist]
       (default /tmp/sf10, 1)
Prints one PASS/FAIL line; exit 1 on FAIL.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_groupby_spark.operators import edit_distance_pairs
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table


def digest(df):
    """(count, 96-bit order-insensitive digest) over (id_a, id_b, dist)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", "id_a", "id_b", "dist")), 1, 12),
        16, 10,
    ).cast("decimal(20,0)")
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(h).cast("decimal(38,0)").alias("d"),
    ).collect()[0]
    return row["n"], row["d"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    max_dist = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.time()
    spark = get_spark("fuzzy-tier-soak")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, sf, "customer").cache()
    cust.count()

    common = dict(
        id_col="c_custkey", text_col="c_name", max_dist=max_dist, gram_k=3,
        max_gram_df=None, rel_gram_df=0.05,
    )
    plain = edit_distance_pairs(cust, prefix_blocking=False, **common)
    prefix = edit_distance_pairs(cust, prefix_blocking=True, **common)
    n_plain, d_plain = digest(plain)
    n_prefix, d_prefix = digest(prefix)
    ok = n_plain == n_prefix and d_plain == d_prefix
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} fuzzy_tiers (plain {n_plain} pairs vs prefix {n_prefix}, "
        f"digests {'equal' if d_plain == d_prefix else 'DIFFER'}, "
        f"max_dist={max_dist}, {time.time()-t0:.1f}s)"
    )
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
