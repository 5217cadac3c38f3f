"""Exact sf10 verification tier for the `pack` contract key (greedy
sequential bin packing).

The key's DuckDB oracle is a RECURSIVE CTE walking one row per step and
re-joining `base` each iteration — fine at sf0.01 (500 docs), a DuckDB
bound at sf10 (500k docs: the r12 probe burned >25 min of all cores
before the battery timeout killed it).  Greedy packing is trivially
verifiable WITHOUT SQL recursion: collect the (group, order, size, bin)
quadruples — 4 narrow columns, ~16 MB at sf10 — and replay the O(n)
running-total-with-reset walk locally in sorted order.  Exact-value,
every row checked, no sampling.

Prints one PASS/FAIL line in the battery's format.

Usage: python scripts/sf10_pack_check.py [sf_dir]   (default /tmp/sf10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from dask_groupby_spark.operators.curate import pack_sequences
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

CAPACITY = 2000  # the contract key's config (q_pack)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    t0 = time.monotonic()
    spark = get_spark("sf10-pack-check")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "n_chars")
    out = pack_sequences(
        docs, "source", size_col="n_chars", order_col="doc_id", capacity=CAPACITY
    ).select("doc_id", "source", "n_chars", "bin_id")

    rows = []
    for r in out.toLocalIterator():  # stream — no driver maxResultSize cliff
        rows.append((r["source"], r["doc_id"], int(r["n_chars"]), r["bin_id"]))
    rows.sort()

    bad = 0
    n = 0
    i = 0
    while i < len(rows):
        j = i
        src = rows[i][0]
        while j < len(rows) and rows[j][0] == src:
            j += 1
        b, acc = 0, 0
        for src_, did, size, got_bin in rows[i:j]:
            if acc > 0 and acc + size > CAPACITY:
                b += 1
                acc = 0
            acc += size
            if got_bin != b:
                bad += 1
            n += 1
        i = j

    dt = time.monotonic() - t0
    if bad == 0 and n > 0:
        print(f"PASS pack ({n} rows, {dt:.1f}s, local-walk tier)")
        rc = 0
    else:
        print(f"FAIL pack ({bad} of {n} rows mismatch, {dt:.1f}s, local-walk tier)")
        rc = 1
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
