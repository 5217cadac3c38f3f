"""Stage decomposition of `near_deduplicate` at a given SF (VERDICT r11
#6: near_dedup is the sf10 headline's largest term — 59.8s of 141s —
and the next scale jump needs a per-stage baseline).

Times the four PROGRESSIVE compositions cold (each materialized with
the noop writer) — side-by-side prefix times show where the wall goes,
since the pipeline is one lazy plan (only `duplicate_clusters` caches
its edge input internally, so later prefixes are not strict supersets
of earlier measured work):

  1. signatures        minhash_signatures                (map-side hashing)
  2. + candidate pairs lsh_candidate_pairs               (band shuffle + in-bucket enumeration)
  3. + clusters        duplicate_clusters                (union-find / min-label rounds)
  4. + keeper join     near_deduplicate                  (anti-join back to the corpus)

Prints one JSON line; paste into BASELINE.md.

Usage: python scripts/profile_near_dedup.py [sf_dir] [runs]
       (default /tmp/sf10, 2 — min over runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_groupby_spark.operators.dedup import (
    duplicate_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
    near_deduplicate,
)
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

NUM_HASHES, BANDS = 8, 4  # the bench/contract config


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    load_before = os.getloadavg()
    spark = get_spark("near-dedup-profile")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf, "documents").repartition(par)
    docs.cache().count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def stage_sig():
        mat(minhash_signatures(docs, "doc_id", "text",
                               num_hashes=NUM_HASHES, shingle_k=3))

    def stage_pairs():
        sig = minhash_signatures(docs, "doc_id", "text",
                                 num_hashes=NUM_HASHES, shingle_k=3)
        mat(lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, bands=BANDS))

    def stage_clusters():
        sig = minhash_signatures(docs, "doc_id", "text",
                                 num_hashes=NUM_HASHES, shingle_k=3)
        pairs = lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, bands=BANDS)
        mat(duplicate_clusters(pairs))

    def stage_full():
        mat(near_deduplicate(docs, num_hashes=NUM_HASHES, bands=BANDS))

    stages = [
        ("signatures", stage_sig),
        ("pairs", stage_pairs),
        ("clusters", stage_clusters),
        ("full_keeper", stage_full),
    ]
    cum = {}
    for name, fn in stages:
        fn()  # warm-up (codegen; docs already cached)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        cum[name] = round(best, 3)
    # NOTE deliberately no derived "marginal" column: duplicate_clusters
    # caches its edge input internally (and ≤2M-edge subgraphs collect to
    # a driver union-find), so stage k is not a strict superset of stage
    # k-1's measured work — read the raw prefix times side by side.

    # scale facts for the record
    sig = minhash_signatures(docs, "doc_id", "text",
                             num_hashes=NUM_HASHES, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, bands=BANDS)
    n_docs = docs.count()
    n_pairs = pairs.count()
    print(json.dumps({
        "metric": "near_dedup stage decomposition (cumulative cold sec)",
        "sf_dir": sf,
        "docs": n_docs,
        "candidate_pairs": n_pairs,
        "cumulative": cum,
        "runs": runs,
        "load_avg_before": [round(x, 2) for x in load_before],
        "load_avg_after": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
