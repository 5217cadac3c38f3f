"""A/B cost probe for the distributed bpe_train merge loop (VERDICT r8
item #2): wall time and Spark job count per merge at num_merges>=256.

Usage: python scripts/bench_bpe.py [num_merges] [sf_dir]
Prints one JSON line {merges, seconds, per_merge_sec, jobs, jobs_per_merge}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from dask_groupby_spark import get_spark
from dask_groupby_spark.operators.bpe import bpe_train
from dask_groupby_spark.sources import load_table


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # getJobIdsForGroup reads the AppStatusStore, which evicts jobs past
    # spark.ui.retainedJobs (default 1000) — a 256-merge delta run exceeds
    # that and would silently undercount.  Raise the retention well above
    # any merge count this probe runs at.
    spark = get_spark("bench-bpe", extra_conf={"spark.ui.retainedJobs": "100000"})
    if sf.startswith("synth:"):
        # big-vocabulary mode: N distinct 12-hex-char words (the testdata
        # documents table has a tiny fixed dictionary that exhausts in
        # ~107 merges and hides vocabulary-scale costs)
        from pyspark.sql import functions as F

        nwords = int(sf.split(":", 1)[1])
        docs = spark.range(nwords).select(
            F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 12).alias("text")
        )
    else:
        docs = load_table(spark, sf, "documents").select("text")
    docs.count()  # warm the scan
    sc = spark.sparkContext
    sc.setJobGroup("bpe-train", "bpe merge loop", interruptOnCancel=False)
    t0 = time.time()
    merges = bpe_train(docs, num_merges=n, min_pair_count=1, collect_threshold=0)
    dt = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup("bpe-train"))
    print(json.dumps({
        "merges": len(merges),
        "seconds": round(dt, 2),
        "per_merge_sec": round(dt / max(1, len(merges)), 4),
        "jobs": jobs,
        "jobs_per_merge": round(jobs / max(1, len(merges)), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
