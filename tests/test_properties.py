"""F9 randomized property harness (FIXTURES.md; the Spark analog of the
reference's 'dask == numpy under random chunking' property,
flox/tests/test_properties.py:150-180): results must be invariant under
repartition(p) and equal the DuckDB oracle."""

import math

import duckdb
import numpy as np
import pytest

from dask_groupby_spark import groupby_reduce

FUNCS = [
    "count",
    "nansum",
    "nanmean",
    "nanmin",
    "nanmax",
    "nanvar",
    "sum",
    "mean",
    "nanmedian",
    "nanstd",
    "nunique",
]


def make_table(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 400))
    k = int(rng.integers(1, 12))
    labels = rng.integers(0, k, n)
    vals = rng.normal(0, 100, n)
    nan_frac = rng.random() * 0.4
    vals[rng.random(n) < nan_frac] = np.nan
    return labels, vals


def duck_oracle(labels, vals, func):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (label BIGINT, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(zip(map(int, labels), map(float, vals))))
    clean = "CASE WHEN NOT isnan(val) THEN val END"
    nanc = "sum(CASE WHEN isnan(val) THEN 1 ELSE 0 END)"
    exprs = {
        "count": f"count({clean})",
        "nansum": f"coalesce(sum({clean}), 0)",
        "nanmean": f"avg({clean})",
        "nanmin": f"min({clean})",
        "nanmax": f"max({clean})",
        "nanvar": f"var_pop({clean})",
        "sum": f"CASE WHEN {nanc} > 0 THEN 'NaN'::DOUBLE ELSE sum({clean}) END",
        "mean": f"CASE WHEN {nanc} > 0 THEN 'NaN'::DOUBLE ELSE avg({clean}) END",
        "nanmedian": f"quantile_cont({clean}, 0.5)",
        "nanstd": f"stddev_pop({clean})",
        "nunique": f"count(DISTINCT {clean})",
    }
    rows = con.execute(f"SELECT label, {exprs[func]} FROM t GROUP BY label ORDER BY label").fetchall()
    con.close()
    return {r[0]: r[1] for r in rows}


def eq(a, b, tol=1e-9):
    if a is None or b is None:
        a = float("nan") if a is None else a
        b = float("nan") if b is None else b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("func", FUNCS)
def test_vs_duckdb_and_repartition_invariance(spark, seed, func):
    labels, vals = make_table(seed)
    rows = [(int(l), float(v)) for l, v in zip(labels, vals)]
    df = spark.createDataFrame(rows, "label bigint, val double")
    oracle = duck_oracle(labels, vals, func)
    for p in (1, 7):
        out = groupby_reduce(df.repartition(p), "label", func=func, value="val")
        got = {r["label"]: r[func] for r in out.collect()}
        assert set(got) == set(oracle)
        for k in oracle:
            assert eq(got[k], oracle[k]), f"seed={seed} func={func} p={p} k={k}: {got[k]} vs {oracle[k]}"


def test_no_action_during_construction(spark):
    """Laziness guard (the Spark analog of flox's CountingScheduler,
    tests/__init__.py:57-78): building the plan must not trigger a job."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = spark.createDataFrame([(0, 1.0)], "label bigint, val double")
    n_jobs_before = len(spark.sparkContext.statusTracker().getActiveJobsIds())
    out = groupby_reduce(df, "label", func="nansum", value="val",
                         expected_groups=[0, 1, 2], fill_value=0.0)
    # building `out` must not have launched work; collect() does
    assert len(spark.sparkContext.statusTracker().getActiveJobsIds()) == n_jobs_before
    assert out.collect()


def test_resample_dense_is_lazy(spark):
    """dense=True derives its bucket grid from a lazy aggregate+sequence
    subquery — construction must not run the min/max job."""
    import datetime as dt

    from dask_groupby_spark.resample import resample

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + d), float(d)) for d in range(10)],
        "ts timestamp, v double",
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = resample(df, "ts", "2 days", "nansum", "v", dense=True)
    after = tracker.getJobIdsForGroup(None)
    assert list(before) == list(after)  # no job during construction
    # 10 consecutive days over epoch-anchored 2-day buckets: 2024-01-01 is
    # an odd epoch day, so the span straddles 6 buckets
    assert out.count() == 6


@pytest.mark.parametrize("seed", [11, 47])
def test_wquantile_sketch_repartition_invariance(spark, seed):
    """The histogram sketch must be partition-layout-invariant: min/max are
    exact, per-bucket weight sums are order-independent for integer-valued
    weights, so ANY repartitioning yields bit-identical answers."""
    from dask_groupby_spark.operators.weighted import weighted_quantile_sketch

    rng = np.random.default_rng(seed)
    n = 300
    labels = rng.integers(0, 5, n)
    vals = rng.normal(0, 50, n)
    wts = rng.integers(1, 9, n).astype(float)
    rows = [(int(labels[i]), float(vals[i]), float(wts[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k bigint, x double, w double")

    def run(frame):
        return {
            r["k"]: (r["wq_0_25"], r["wq_0_5"], r["wq_0_9"])
            for r in weighted_quantile_sketch(
                frame, "k", value="x", weight="w", q=[0.25, 0.5, 0.9], bins=256
            ).collect()
        }

    base = run(df)
    for p in (1, 3, 17):
        assert run(df.repartition(p)) == base, p


@pytest.mark.parametrize("seed", [5, 23])
def test_sessionize_repartition_invariance(spark, seed):
    """Session assignment depends only on per-key event-time order — never
    on physical layout."""
    from dask_groupby_spark.operators.selection import sessionize

    rng = np.random.default_rng(seed)
    n = 200
    rows = [
        (i, int(rng.integers(0, 4)), float(rng.integers(0, 5000)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id bigint, k bigint, ts double")

    def run(frame):
        return {
            r["id"]: r["session_id"]
            for r in sessionize(frame, "k", ts_col="ts", gap=100.0).collect()
        }

    base = run(df)
    for p in (1, 7):
        assert run(df.repartition(p)) == base, p


def test_minhash_lsh_matches_python_reference_randomized(spark):
    """End-to-end MinHash→LSH differential against a from-scratch python
    implementation of the same construction (xxhash via Spark batch eval is
    avoided: the python side recomputes the md5 portable hash exactly), over
    a randomized corpus with planted near-duplicates."""
    import hashlib
    import random

    from dask_groupby_spark.operators.dedup import (
        MINHASH_P,
        lsh_candidate_pairs,
        minhash_params,
        minhash_signatures,
    )

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        n = rng.randint(3, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    for i in range(40, 50):  # planted near-dups: copy with small edits
        base = rows[i - 40][1].split()
        if len(base) > 4:
            base[rng.randrange(len(base))] = rng.choice(vocab)
        rows.append((i, " ".join(base)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def phash(s, seed=""):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    def py_sig(text, H=8, k=3):
        toks = [t for t in text.split(" ") if t]
        shs = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        if not shs:
            return None
        hs = [phash(s) % MINHASH_P for s in shs]
        out = []
        for i in range(H):
            a, b = minhash_params(i)
            out.append(min((a * h + b) % MINHASH_P for h in hs))
        return out

    sigs = {i: py_sig(t) for i, t in rows}
    sigs = {i: s for i, s in sigs.items() if s is not None}

    got_sig = {
        r["id"]: [r[f"mh_{i}"] for i in range(8)]
        for r in minhash_signatures(df, hasher="portable").collect()
    }
    assert got_sig == sigs

    # python LSH banding (2 rows/band, 4 bands) with the same band hash
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, s in sigs.items():
        for b in range(4):
            key = ",".join(str(x) for x in s[2 * b : 2 * b + 2])
            buckets[(b, phash(key, "band"))].append(i)
    expect = defaultdict(int)
    for mem in buckets.values():
        mem = sorted(mem)
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                expect[(mem[x], mem[y])] += 1

    sig_df = minhash_signatures(df, hasher="portable")
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in lsh_candidate_pairs(sig_df, hasher="portable").collect()
    }
    assert got == dict(expect)
    assert got  # planted dups must collide


@pytest.mark.parametrize("seed", [11, 12])
def test_stats_family_repartition_invariance(spark, seed):
    """grouped_bivariate / grouped_ks / grouped_auc / table_diff must be
    invariant under repartition(p) — no operator may depend on row order
    or partition boundaries."""
    from pyspark.sql import functions as F

    from dask_groupby_spark.operators import (
        grouped_auc,
        grouped_bivariate,
        grouped_ks,
        table_diff,
    )

    rng = np.random.default_rng(seed)
    n = 600
    rows = [
        (
            int(rng.integers(0, 4)),
            float(rng.normal()) if rng.random() > 0.05 else None,
            float(rng.normal()),
            int(rng.integers(0, 2)),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "g int, x double, y double, lab int")

    def rounded(out, cols):
        return sorted(
            tuple(round(r[c], 9) if isinstance(r[c], float) else r[c] for c in cols)
            for r in out.collect()
        )

    base_biv = rounded(grouped_bivariate(df, "g", "x", "y"), ["g", "n", "corr", "slope"])
    ref = df.where(F.col("g") < 2)
    cur = df.where(F.col("g") >= 0)
    base_ks = rounded(grouped_ks(ref, cur, "g", "x"), ["g", "n_ref", "ks_stat"])
    base_auc = rounded(grouped_auc(df, "g", "lab", "y"), ["g", "n_pos", "auc"])
    for p in (1, 3, 17):
        d2 = df.repartition(p)
        assert rounded(grouped_bivariate(d2, "g", "x", "y"), ["g", "n", "corr", "slope"]) == base_biv
        assert rounded(
            grouped_ks(d2.where(F.col("g") < 2), d2, "g", "x"), ["g", "n_ref", "ks_stat"]
        ) == base_ks
        assert rounded(grouped_auc(d2, "g", "lab", "y"), ["g", "n_pos", "auc"]) == base_auc

    # table_diff invariance: ids as keys
    keyed = df.withColumn("id", F.monotonically_increasing_id())
    old = keyed.select("id", "x")
    new = keyed.select("id", (F.col("x") * 2).alias("x"))
    base_diff = table_diff(old, new, "id").collect()[0].asDict()
    got = table_diff(old.repartition(7), new.repartition(3), "id").collect()[0].asDict()
    assert got == base_diff
