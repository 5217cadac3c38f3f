"""Sub-stage decomposition of the minhash SIGNATURE map (the 55% floor of
near_dedup's sf10 wall per the r12 stage profile — BASELINE.md).  Before
touching the plan ("vectorize the signature map" was the recorded lever),
find out where inside the map the time actually goes:

  1. scan        docs cached, id projected            (baseline overhead)
  2. tokens      split + filter                       (regex tokenization)
  3. shingles    per-position slice + array_join      (string building)
  4. base_hash   xxhash64(shingle) % p, array_min     (one digest/shingle)
  5. signatures  + H affine permutations, H mins      (the mh_0..mh_{H-1})

Each prefix is materialized with the noop writer; marginal = prefix -
previous prefix.  min over `runs` passes per stage (stage-major order so
a load wave hits one stage, not one pass).

Usage: python scripts/profile_signature_map.py [sf_dir] [runs]
       (default /tmp/sf1, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_groupby_spark.operators.dedup import (
    MINHASH_P,
    _hasher,
    minhash_params,
    minhash_signatures,
    shingles,
)
from dask_groupby_spark.operators.text import tokens
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

NUM_HASHES = 8


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    load_before = os.getloadavg()
    spark = get_spark("sig-map-profile")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf, "documents").select("doc_id", "text").repartition(par)
    docs.cache().count()
    hash_fn = _hasher("fast")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    text = F.col("text")

    def stage_scan():
        mat(docs.select("doc_id", F.length("text").alias("n")))

    def stage_tokens():
        mat(docs.select("doc_id", F.size(tokens(text)).alias("n")))

    def stage_shingles():
        mat(docs.select("doc_id", shingles(text, 3).alias("sh")))

    def stage_base_hash():
        hs = F.transform(shingles(text, 3), lambda s: hash_fn(s) % F.lit(MINHASH_P))
        mat(docs.select("doc_id", F.array_min(hs).alias("m")))

    def stage_signatures():
        mat(minhash_signatures(docs, "doc_id", "text", num_hashes=NUM_HASHES, shingle_k=3))

    stages = [
        ("scan", stage_scan),
        ("tokens", stage_tokens),
        ("shingles", stage_shingles),
        ("base_hash", stage_base_hash),
        ("signatures", stage_signatures),
    ]
    best = {}
    for name, fn in stages:
        t = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            t.append(time.monotonic() - t0)
        best[name] = min(t)
    marg, prev = {}, 0.0
    for name, _ in stages:
        marg[name] = round(best[name] - prev, 3)
        prev = best[name]
    print(json.dumps({
        "sf": sf,
        "runs": runs,
        "load_avg_before": round(load_before[0], 2),
        "prefix_sec": {k: round(v, 3) for k, v in best.items()},
        "marginal_sec": marg,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
