"""Time every contract query at an arbitrary SF dir — the r8 discipline
that exposed the O(n²) unboundedFollowing frames and the uncapped
ngram_jaccard (the sf0.01 driver gate is too small to surface
scale-class bugs; run this at sf0.1+ each round).

Usage: python scripts/sweep_times.py [sf_dir] [out_json] [key ...]
Defaults: /root/testdata/sf0.1, /tmp/sweep_times.json, all keys.  Prints
one line per key as it completes; slowest-first summary at the end.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from dask_groupby_spark import get_spark  # noqa: E402

import __spark_entry__ as em  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_times.json"
    only = set(sys.argv[3:])
    spark = get_spark("sweep", cpus=32, shuffle_partitions=32)
    times = {}
    for name, fn in em.queries().items():
        if only and name not in only:
            continue
        s = time.time()
        try:
            fn(spark, sf).count()
            times[name] = round(time.time() - s, 2)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            times[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, times[name], flush=True)
    json.dump(times, open(out, "w"), indent=1)
    worst = sorted(
        ((v, k) for k, v in times.items() if isinstance(v, float)), reverse=True
    )[:12]
    print("\nslowest:")
    for v, k in worst:
        print(f"  {k:24s} {v:6.2f}s")
    errs = {k: v for k, v in times.items() if not isinstance(v, float)}
    if errs:
        print("errors:", errs)


if __name__ == "__main__":
    main()
