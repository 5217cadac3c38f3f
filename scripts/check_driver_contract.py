"""Local emulation of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compare row count + schema-ish + exact values
(order-insensitive, columns sorted by name).  Exact float equality is
intentional — it surfaces any cross-engine nondeterminism before the real
driver hashes it.

Usage: python scripts/check_driver_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import os

# run from anywhere: the repo root is this script's parent directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import TABLES


def norm_cell(x):
    if x is None:
        return None
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    if hasattr(x, "isoformat"):
        return x.isoformat()
    import decimal

    if isinstance(x, decimal.Decimal):
        return float(x)
    return x


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))
    return [cols[i] for i in order], out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        # tolerate partial SF dirs (e.g. the /tmp/sf1 soak set ships only
        # the big tables) — a query actually needing a missing view still
        # fails loudly at its own oracle
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table = a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        else:
            print(f"note: {t}.parquet absent in {sf} — view skipped")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    print(f"== entry() smoke ==")
    t0 = time.time()
    res = entrymod.entry(spark)
    n = res.count()
    print(f"entry rows={n} schema={res.schema.simpleString()} ({time.time()-t0:.1f}s)")

    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"COLUMNS: spark={sorted(scols)} duckdb={sorted(ocols)}"))
            print(f"FAIL {name}: column mismatch {sorted(scols)} vs {sorted(ocols)}")
            continue
        _, snorm = normalize(scols, srows)
        _, onorm = normalize(ocols, orows)
        if len(snorm) != len(onorm):
            failures.append((name, f"ROWS: spark={len(snorm)} duckdb={len(onorm)}"))
            print(f"FAIL {name}: row count {len(snorm)} vs {len(onorm)}")
            continue
        bad = [(a, b) for a, b in zip(snorm, onorm) if a != b]
        if bad:
            failures.append((name, f"VALUES: {len(bad)}/{len(snorm)} differ; first: {bad[0]}"))
            print(f"FAIL {name}: {len(bad)}/{len(snorm)} rows differ")
            print("   spark :", bad[0][0])
            print("   duckdb:", bad[0][1])
            continue
        print(f"PASS {name} ({len(snorm)} rows, {time.time()-t0:.1f}s)")

    skipped = len(qs) - checked
    suffix = f" ({skipped} skipped by filter)" if skipped else ""
    print(f"\n{checked - len(failures)}/{checked} passed{suffix}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    if only and checked == 0:
        # a filter that matches nothing must not read as a green gate
        # (r9 review: a typo'd key name exited 0 with zero comparisons run)
        print(f"ERROR: filter matched no queries: {sorted(only)}")
        sys.exit(2)
    unknown = set(only) - set(qs) if only else set()
    if unknown:
        print(f"ERROR: unknown query key(s) in filter: {sorted(unknown)}")
        sys.exit(2)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
