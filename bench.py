"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup; each query is materialized with the noop
writer (computes every column, no driver transfer).  The workload mirrors
the reference's ASV suite shapes (BASELINE.md): low- and high-cardinality
grouped reductions (ChunkReduce1D/2D), quantile, climatology-style datetime
keys, scans, plus the LLM-pipeline operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dask_groupby_spark import Bins, groupby_agg, groupby_reduce, groupby_scan
from dask_groupby_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from dask_groupby_spark.session import get_spark
from dask_groupby_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf):
    par = spark.sparkContext.defaultParallelism
    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events")
    # documents/embeddings arrive as one small parquet file = ONE input split;
    # repartition so the compute-heavy map stages (shingling, hashing, cosine)
    # use every core — at real scale the input has thousands of splits and
    # this step is a no-op in spirit
    docs = load_table(spark, sf, "documents").repartition(par)
    emb = load_table(spark, sf, "embeddings").repartition(par)
    li.cache().count()
    ev.cache().count()
    docs.cache().count()
    emb.cache().count()

    def q1_fused():
        # TPC-H-Q1-shaped fused multi-reduction (6 groups, 8 aggregates)
        _materialize(
            groupby_agg(
                li,
                "l_returnflag",
                "l_linestatus",
                funcs=[
                    ("count", "l_quantity", "count_qty"),
                    ("nansum", "l_quantity", "sum_qty"),
                    ("nansum", "l_extendedprice", "sum_price"),
                    ("nanmean", "l_quantity", "avg_qty"),
                    ("nanmean", "l_discount", "avg_disc"),
                    ("nanmin", "l_extendedprice", "min_price"),
                    ("nanmax", "l_extendedprice", "max_price"),
                    ("nanvar", "l_quantity", "var_qty", {"ddof": 1}),
                ],
            )
        )

    def reduce_low_card():
        # ChunkReduce1D shape: 600k rows → 6 groups
        _materialize(groupby_reduce(li, "l_returnflag", "l_linestatus", func="nanmean", value="l_extendedprice"))

    def reduce_high_card():
        # ChunkReduce2D shape: 600k rows → 150k groups
        _materialize(groupby_reduce(li, "l_orderkey", func="nansum", value="l_extendedprice"))

    def reduce_binned():
        _materialize(
            groupby_reduce(
                li,
                "l_quantity",
                func="nanmean",
                value="l_extendedprice",
                expected_groups=Bins([0.0, 10.0, 20.0, 30.0, 40.0, 50.0]),
            )
        )

    def quantile():
        # Quantile benchmark shape (q=0.9)
        _materialize(
            groupby_reduce(
                li, "l_returnflag", "l_linestatus", func="nanquantile",
                value="l_extendedprice", finalize_kwargs={"q": 0.9},
            )
        )

    def argreduce():
        li2 = li.withColumn("idx", F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        _materialize(
            groupby_reduce(li2, "l_returnflag", "l_linestatus", func="nanargmax",
                           value="l_extendedprice", idx_col="idx")
        )

    def climatology():
        # ERA5DayOfYear shape: datetime-derived keys
        ev2 = ev.withColumn("doy", F.dayofyear("ts").cast("bigint")).withColumn(
            "h", F.hour("ts").cast("bigint")
        )
        _materialize(groupby_reduce(ev2, "doy", "h", func="nanmean", value="value"))

    def scan_cumsum():
        _materialize(groupby_scan(ev, "user_id", func="nancumsum", value="value", idx_col="event_id"))

    def scan_ffill():
        ev2 = ev.withColumn("v", F.when(F.col("value") < 50, None).otherwise(F.col("value")))
        _materialize(groupby_scan(ev2, "user_id", func="ffill", value="v", idx_col="event_id"))

    def dedup_minhash():
        sig = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_k=3)
        _materialize(lsh_candidate_pairs(sig, num_hashes=8, bands=4))

    def ann():
        # same exact top-k as cosine_topk (rank tables verified identical in
        # tests); the BLAS path shuffles only per-batch partial top-k rows
        from dask_groupby_spark.operators.similarity import cosine_topk_blas

        _materialize(cosine_topk_blas(emb, emb.where(F.col("vec_id") < 50), k=10))

    def ann_ivf():
        from dask_groupby_spark.operators.similarity import ivf_topk

        _materialize(ivf_topk(emb, emb.where(F.col("vec_id") < 50), k=10,
                              n_cells=16, nprobe=3))

    def text_pipeline():
        from dask_groupby_spark.operators.text import (
            add_text_features,
            language_id,
            tokens,
        )

        # tokenize ONCE and share across the composed operators (tokens_col)
        toked = docs.withColumn("__tk", tokens(F.col("text")))
        feats = language_id(
            add_text_features(toked, tokens_col="__tk"), tokens_col="__tk"
        )
        _materialize(
            feats.groupBy("lang_pred").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_tokens").alias("total_tokens"),
                F.avg("stopword_ratio").alias("avg_sw"),
            )
        )

    def asof():
        from dask_groupby_spark.operators.joins import asof_join

        left = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        right = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
        _materialize(asof_join(left, right, on="ts", by=["user_id"], right_cols=["value"]))

    def tfidf():
        from dask_groupby_spark.operators.text import tfidf_top_terms

        _materialize(tfidf_top_terms(docs, k=3))

    def centroids():
        from dask_groupby_spark.operators.similarity import group_centroids

        _materialize(
            group_centroids(
                emb.withColumn("g", F.pmod(F.col("vec_id"), F.lit(16))), "g"
            )
        )

    def near_dedup():
        from dask_groupby_spark.operators.dedup import near_deduplicate

        _materialize(near_deduplicate(docs, num_hashes=8, bands=4))

    def quantile_sketch():
        # the skew-safe path: same shape as `quantile` but GK-sketch backed
        _materialize(
            groupby_reduce(
                li, "l_returnflag", "l_linestatus", func="approx_quantile",
                value="l_extendedprice", finalize_kwargs={"q": 0.9},
            )
        )

    return {
        "q1_fused": q1_fused,
        "reduce_low_card": reduce_low_card,
        "reduce_high_card": reduce_high_card,
        "reduce_binned": reduce_binned,
        "quantile": quantile,
        "argreduce": argreduce,
        "climatology": climatology,
        "scan_cumsum": scan_cumsum,
        "scan_ffill": scan_ffill,
        "dedup_minhash": dedup_minhash,
        "ann_topk": ann,
        "ann_ivf": ann_ivf,
        "text_pipeline": text_pipeline,
        "quantile_sketch": quantile_sketch,
        "asof_join": asof,
        "tfidf": tfidf,
        "centroids": centroids,
        "near_dedup": near_dedup,
    }


def bench_queries_ext(spark, sf):
    """SECOND stable series (r9+): the r8-family operators, so a perf
    regression there is visible round-over-round.  Kept separate from the
    18-query headline — `value` stays comparable to the fixed r1 baseline;
    this series reports under `queries_ext`/`value_ext`."""
    from dask_groupby_spark.operators import (
        edit_distance_pairs,
        kmv_distinct,
        retention,
        target_encode,
    )
    from dask_groupby_spark.operators.funnel import funnel_conversion
    from dask_groupby_spark.binning import quantile_bins

    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events")
    cust = load_table(spark, sf, "customer")
    li.cache().count()
    ev.cache().count()
    cust.cache().count()

    def funnel():
        _materialize(
            funnel_conversion(
                ev, ["view", "click", "purchase"],
                entity_col="user_id", type_col="event_type", ts_col="ts",
            )
        )

    def retention_q():
        _materialize(
            retention(ev, entity_col="user_id", ts_col="ts", period="week",
                      horizon=12)
        )

    def kmv():
        _materialize(kmv_distinct(ev, "event_type", value="user_id",
                                  k=1 << 16, out="distinct_users"))

    def target_enc():
        _materialize(target_encode(li, "l_partkey", label="l_quantity",
                                   smoothing=20.0))

    def qcut_grouped():
        _materialize(quantile_bins(li, "l_extendedprice", q=10,
                                   by="l_returnflag", out="qbin"))

    def fuzzy():
        # max_gram_df=256 PINNED (not the r11 density-robust default):
        # this series is compared round-over-round against its r9/r10
        # records, which ran the absolute cap — at sf0.1 the new
        # default resolves to the same 256 anyway (floor binds below
        # 5120 records), but the pin keeps the measured plan
        # construction identical (no count job) across rounds
        _materialize(
            edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=2,
                                gram_k=3, max_gram_df=256)
        )

    return {
        "funnel": funnel,
        "retention": retention_q,
        "kmv_distinct": kmv,
        "target_encode": target_enc,
        "qcut_grouped": qcut_grouped,
        "fuzzy_match": fuzzy,
    }


def bench_queries_uncached(spark, sf):
    """THIRD series (r13, VERDICT r12 #3 — ADDITIVE): the scan-sensitive
    grid queries with NO base-table caching, so §6 I/O work (e.g. the r12
    3-scans→1 observed-grid fix) is measurable in the artifact instead of
    hiding behind the warm series' cache.  The caller clears the session
    cache first; every run here re-reads parquet.  Reported under
    `queries_uncached`/`value_uncached`; the warm headline series above is
    UNCHANGED for round-over-round continuity."""
    li = load_table(spark, sf, "lineitem")
    ev = load_table(spark, sf, "events")

    def quantile_uc():
        _materialize(
            groupby_reduce(
                li, "l_returnflag", "l_linestatus", func="nanquantile",
                value="l_extendedprice", finalize_kwargs={"q": 0.9},
            )
        )

    def climatology_uc():
        ev2 = ev.withColumn("doy", F.dayofyear("ts").cast("bigint")).withColumn(
            "h", F.hour("ts").cast("bigint")
        )
        _materialize(groupby_reduce(ev2, "doy", "h", func="nanmean", value="value"))

    def reduce_high_card_uc():
        _materialize(
            groupby_reduce(li, "l_orderkey", func="nansum", value="l_extendedprice")
        )

    def q1_fused_uc():
        _materialize(
            groupby_agg(
                li,
                "l_returnflag",
                "l_linestatus",
                funcs=[
                    ("count", "l_quantity", "count_qty"),
                    ("nansum", "l_quantity", "sum_qty"),
                    ("nansum", "l_extendedprice", "sum_price"),
                    ("nanmean", "l_quantity", "avg_qty"),
                    ("nanmean", "l_discount", "avg_disc"),
                    ("nanmin", "l_extendedprice", "min_price"),
                    ("nanmax", "l_extendedprice", "max_price"),
                    ("nanvar", "l_quantity", "var_qty", {"ddof": 1}),
                ],
            )
        )

    return {
        "quantile_uncached": quantile_uc,
        "climatology_uncached": climatology_uc,
        "reduce_high_card_uncached": reduce_high_card_uc,
        "q1_fused_uncached": q1_fused_uc,
    }


_RUNS = 3  # min over back-to-back repeats: drops GC/scheduler jitter
# min over full-series passes: a multi-minute host-load WAVE
_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
# (env knob: big-SF readings where one pass already runs tens of minutes
# can set SPARK_GRAFT_BENCH_PASSES=1)
# (the shared VM's duty cycle) poisons every back-to-back repeat of the
# queries it overlaps; a second, temporally-separated pass de-correlates
# it (r11 — observed a wave turn ann_ivf 1.7s into 10.3s mid-run)


def _run_series(qs, passes=_PASSES):
    times = {}
    for p in range(passes):
        for name, fn in qs.items():
            if p == 0:
                fn()  # warm-up run (JIT/codegen/cache)
            best = times.get(name, float("inf"))
            for _ in range(_RUNS):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            times[name] = best
    return {k: round(v, 3) for k, v in times.items()}


# Artifact-integrity guard (r12, VERDICT r11 #5): BENCH_r11.json shipped a
# 17.39s headline measured at load 6.5 that read as a 17% regression to
# anyone not cross-referencing BASELINE.md's quiet-window 12.7s.  Before
# measuring, wait (bounded) for the shared VM's load wave to pass; if it
# never does, measure anyway but SELF-FLAG the artifact.
_LOAD_THRESHOLD = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0"))
_LOAD_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "600"))


def _wait_for_quiet_host():
    """Poll the 1-min load average until it drops under the threshold or
    the wait budget runs out.  Returns (final_load, seconds_waited)."""
    waited = 0
    load = os.getloadavg()[0]
    while load > _LOAD_THRESHOLD and waited < _LOAD_WAIT_SEC:
        time.sleep(30)
        waited += 30
        load = os.getloadavg()[0]
    return load, waited


def main():
    # host-load bookkeeping (r11, VERDICT r10 item #5): this is a shared
    # VM — round-over-round comparisons were repeatedly confounded by a
    # noisy duty cycle (20-40% inflation on untouched queries in r10).
    # Recording the 1/5/15-min load averages before and after makes "was
    # the host quiet?" a fact IN the artifact instead of a narrative.
    load_1min, load_waited = _wait_for_quiet_host()
    load_inflated = load_1min > _LOAD_THRESHOLD
    load_before = os.getloadavg()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    times = _run_series(bench_queries(spark, SF_DIR))
    # load sampled BETWEEN the two series (r12): a load wave arriving
    # mid-run poisons only the trailing series, and the before/after pair
    # cannot localize it (r12 observed: headline clean, ext 1.5× — the
    # mid sample makes that a recorded fact instead of forensics)
    load_mid = os.getloadavg()
    # The ext series must never cost us the headline measurement: it needs
    # tables (e.g. customer) that older ad-hoc SF dirs may lack.
    try:
        times_ext = _run_series(bench_queries_ext(spark, SF_DIR))
    except Exception as exc:  # pragma: no cover - environment-dependent
        times_ext = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    # UNCACHED series last (r13, VERDICT r12 #3): clear every cached base
    # table first — Spark's CacheManager substitutes cached plans by
    # logical-plan match, so a fresh load_table would silently hit the warm
    # series' cache otherwise.  Running last means clearing cannot perturb
    # the two comparable series above.
    load_pre_uncached = os.getloadavg()
    try:
        spark.catalog.clearCache()
        times_uncached = _run_series(bench_queries_uncached(spark, SF_DIR))
    except Exception as exc:  # pragma: no cover - environment-dependent
        times_uncached = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (18 queries, warm)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_ext": times_ext,
                # None (not 0.0) when the ext series errored — a zero would
                # read as an extreme speedup in round-over-round comparisons
                "value_ext": (
                    round(sum(times_ext.values()), 3)
                    if all(isinstance(v, float) for v in times_ext.values())
                    else None
                ),
                # ADDITIVE uncached series (r13): same noop-sink
                # methodology, cache cleared, cold parquet reads each run
                "queries_uncached": times_uncached,
                "value_uncached": (
                    round(sum(times_uncached.values()), 3)
                    if all(isinstance(v, float) for v in times_uncached.values())
                    else None
                ),
                "load_avg_pre_uncached": [
                    round(x, 2) for x in load_pre_uncached
                ],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # min-of-N per query (after one warm-up); load averages
                # bracket the measurement — own-load inflates the trailing
                # numbers, so the leading triple is the "was the host
                # already busy?" signal
                "runs": _RUNS,
                "passes": _PASSES,
                "load_avg_before": [round(x, 2) for x in load_before],
                "load_avg_mid": [round(x, 2) for x in load_mid],
                "load_avg_after": [round(x, 2) for x in os.getloadavg()],
                # self-flagging (VERDICT r11 #5): when the pre-measurement
                # 1-min load still exceeded the threshold after the bounded
                # wait, `value` is an UPPER BOUND, not a regression signal —
                # compare against BASELINE.md's quiet-window records instead
                "load_threshold": _LOAD_THRESHOLD,
                "load_wait_sec": load_waited,
                "load_inflated": load_inflated,
                **(
                    {
                        "note": (
                            "host 1-min load exceeded threshold for the whole "
                            "wait budget; treat value as an upper bound and "
                            "compare to BASELINE.md quiet-window records"
                        )
                    }
                    if load_inflated
                    else {}
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
