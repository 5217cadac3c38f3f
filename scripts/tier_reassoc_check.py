"""Tier-reassociation differential for the WHOLE two-pass scan family —
the generalization of the r11 one-off ``sf10_nancumsum_check.py``
(VERDICT r11 #3).

Every func that can auto-dispatch to the chunked Blelloch tier is run
under BOTH tiers (``method='window'`` vs ``method='two_pass'`` at
``rows_per_chunk=2000`` — multi-chunk groups at every test SF) on the
contract frame shape (events grouped by the 5-value ``event_type`` key,
the grouping whose group size GROWS with scale and therefore the one
auto-dispatch eventually flips).  The pass criteria encode the audited
property per func class (docs/SCALE.md "reassociation audit"):

- ORDER-INSENSITIVE funcs (cummax/cummin + nan variants, cumcount,
  ffill, bfill): selection/count combines are associative AND exact in
  IEEE — the tiers must agree BIT-FOR-BIT (zero drift), NaN/NULL
  placement included.  Any nonzero diff is a bug, not float noise.
- ORDER-SENSITIVE folds (cumsum/nancumsum/cumprod/nancumprod): chunked
  partial states REASSOCIATE float +/* relative to the window tier's
  (and any SQL oracle's) strictly sequential fold — drift is inherent
  to ANY chunked execution (the reference's blockwise dask scan
  included).  Criteria: NaN/NULL placement exact, every numeric pair
  within relative 1e-9, and the artifact line RECORDS max_abs/max_rel
  plus how many rows would flip a round-6 absolute oracle grid — the
  headroom number that told us scan_two_pass's grid dies between sf1
  (max_abs 2.5e-7, 0 flips) and sf10 (9.2e-6 — off-grid).

cumprod inputs use ``1 + value/1e7`` so products stay finite (and
order-sensitive) through sf10; the CONTRACT cumprod keys group by
``user_id``, whose cardinality scales WITH the corpus (group size is
scale-invariant — see the audit table), so this script's event_type
grouping is strictly harsher than what those keys execute.

Usage: python scripts/tier_reassoc_check.py [sf_dir]   (default
/tmp/sf10).  Prints one PASS/FAIL line per func; exits 1 on any FAIL.
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
GRID_DIGITS = 6  # the contract keys' absolute grid, reported not enforced
ROWS_PER_CHUNK = 2000

ORDER_INSENSITIVE = [
    "cummax", "cummin", "nancummax", "nancummin", "cumcount", "ffill", "bfill",
]
ORDER_SENSITIVE = ["cumsum", "nancumsum", "cumprod", "nancumprod"]


def _frames(spark, sf):
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn(
            "vnan",
            F.when(F.col("value") < 5, F.lit(float("nan"))).otherwise(
                F.col("value")
            ),
        )
        .withColumn(
            "vnull",
            F.when(F.col("value") < 50, F.lit(None)).otherwise(F.col("value")),
        )
        .withColumn(
            "vprod",
            F.when(F.col("value") < 5, F.lit(float("nan"))).otherwise(
                1.0 + F.col("value") / 1e7
            ),
        )
    )


def _value_col(func):
    if func in ("ffill", "bfill"):
        return "vnull"
    if func in ("cumprod", "nancumprod"):
        return "vprod"
    return "vnan"


def check_func(ev, func):
    t0 = time.time()
    val = _value_col(func)

    def run(method, tag):
        out = groupby_scan(
            ev, "event_type", func=func, value=val, idx_col="event_id",
            method=method, rows_per_chunk=ROWS_PER_CHUNK,
        )
        return out.select("event_id", F.col(func).alias(tag))

    j = run("window", "a").join(run("two_pass", "b"), on="event_id")
    a, b = F.col("a"), F.col("b")
    a_nan = F.isnull(a) | F.isnan(a) if dict(j.dtypes)["a"] == "double" else F.isnull(a)
    b_nan = F.isnull(b) | F.isnan(b) if dict(j.dtypes)["b"] == "double" else F.isnull(b)
    num = ~a_nan & ~b_nan
    rel = F.abs(a - b) / F.greatest(F.abs(a), F.abs(b), F.lit(1.0))
    agg = j.select(
        F.sum((a_nan != b_nan).cast("long")).alias("placement"),
        F.sum((F.isnull(a) != F.isnull(b)).cast("long")).alias("null_mismatch"),
        F.coalesce(F.max(F.when(num, F.abs(a - b))), F.lit(0.0)).alias("max_abs"),
        F.coalesce(F.max(F.when(num, rel)), F.lit(0.0)).alias("max_rel"),
        F.sum(
            F.when(num & (F.round(a, GRID_DIGITS) != F.round(b, GRID_DIGITS)), 1)
            .otherwise(0)
        ).alias("grid_flips"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    secs = time.time() - t0
    placement_ok = agg["placement"] == 0 and agg["null_mismatch"] == 0
    if func in ORDER_INSENSITIVE:
        ok = placement_ok and agg["max_abs"] == 0.0
        detail = f"bit-exact required: max_abs={agg['max_abs']:.1e}"
    else:
        ok = placement_ok and agg["max_rel"] < REL_TOL
        detail = (
            f"max_rel={agg['max_rel']:.3e} < {REL_TOL}, "
            f"max_abs={agg['max_abs']:.3e}, "
            f"round-{GRID_DIGITS} grid flips={agg['grid_flips']}"
        )
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} tier_reassoc[{func}] ({agg['n']} rows, {detail}, "
        f"placement mismatches {agg['placement']}/{agg['null_mismatch']}, "
        f"{secs:.1f}s)"
    )
    return ok


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("tier-reassoc-check")
    spark.sparkContext.setLogLevel("ERROR")
    ev = _frames(spark, sf).cache()
    ev.count()
    ok = True
    for func in ORDER_INSENSITIVE + ORDER_SENSITIVE:
        ok &= check_func(ev, func)
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
