"""sf1 pandas differential for the ewma_scan contract key.

ewma_scan's DuckDB oracle is the closed-form weighted sum over a
``list()`` running window — O(n²) memory/time per group, impractical at
sf1 (100k events, ~20k-row groups).  The capability still needs 10x-scale
exact evidence, and pandas IS the semantic the operator promises
(``GroupBy.ewm(alpha).mean()`` parity), so the 10x check is a pandas
differential over the full sf1 events table: run the contract key's
exact callable, recompute with pandas, compare every row at the key's
own 6-decimal grid.

Prints one ``PASS ewma_scan (...)`` / ``FAIL ewma_scan: ...`` line in the
gate's format so ``sf1_battery.sh`` can tally it with the DuckDB rows.

Usage: python scripts/sf1_ewma_check.py [sf_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    t0 = time.time()

    import __spark_entry__ as entry
    from dask_groupby_spark.session import get_spark
    from dask_groupby_spark.sources import load_table

    spark = get_spark("sf1-ewma-check")
    spark.sparkContext.setLogLevel("ERROR")

    got = {
        r["event_id"]: r["ewma"]
        for r in entry.queries()["ewma_scan"](spark, sf).collect()
    }

    pdf = (
        load_table(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    exp = (
        pdf.sort_values("event_id")
        .groupby("event_type", dropna=False)["value"]
        .transform(lambda s: s.ewm(alpha=0.3).mean())
    )
    pdf["exp"] = exp

    bad = []
    for eid, e in zip(pdf["event_id"], pdf["exp"]):
        g = got.get(eid)
        # normalize engine-side float NaN the same way as pandas-side
        # (e6): NaN == NaN must compare equal, not FAIL through
        # math.isclose(nan, ...) (r11 ADVICE)
        if isinstance(g, float) and math.isnan(g):
            g = None
        e6 = None if (e is None or (isinstance(e, float) and math.isnan(e))) else round(float(e), 6)
        if g is None and e6 is None:
            continue
        if g is None or e6 is None or not math.isclose(g, e6, rel_tol=0, abs_tol=5.1e-7):
            bad.append((eid, e6, g))
    if len(got) != len(pdf):
        print(f"FAIL ewma_scan: row count {len(got)} vs pandas {len(pdf)}")
        sys.exit(1)
    if bad:
        print(f"FAIL ewma_scan: {len(bad)} rows differ vs pandas, first {bad[:3]}")
        sys.exit(1)
    print(
        f"PASS ewma_scan ({len(got)} rows, pandas differential, "
        f"{time.time()-t0:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
