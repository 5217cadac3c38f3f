"""Structured Streaming tests: windowed reductions with watermark and
cross-batch stateful cumsum, driven through real file-source micro-batches."""

import datetime
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.streaming import streaming_cumsum, windowed_reduce


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dgs-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_reduce(spark, tmpdir):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=m), "a" if (m // 10) % 2 == 0 else "b", float(m))
        for m in range(0, 120, 10)
    ]
    spark.createDataFrame(rows, "ts timestamp, k string, v double").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(f"{tmpdir}/in")
    agg = windowed_reduce(
        stream, "k", func="nansum", value="v", ts_col="ts", window="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winsum")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["k"]): r["nansum"]
        for r in spark.sql("select * from winsum").collect()
    }
    # hour 0: minutes 0..50 → a: 0+20+40=60, b: 10+30+50=90
    assert got[("2024-01-01T00:00:00", "a")] == 60.0
    assert got[("2024-01-01T00:00:00", "b")] == 90.0
    assert got[("2024-01-01T01:00:00", "a")] == 240.0  # 60+80+100


def test_session_reduce(spark, tmpdir):
    from dask_groupby_spark.streaming import session_reduce

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # key "a": two bursts separated by 2h → two sessions; "b": one burst
    rows = [
        (base + datetime.timedelta(minutes=m), "a", 1.0) for m in (0, 5, 10)
    ] + [
        (base + datetime.timedelta(minutes=m), "a", 1.0) for m in (130, 135)
    ] + [
        (base + datetime.timedelta(minutes=m), "b", 2.0) for m in (0, 20)
    ]
    spark.createDataFrame(rows, "ts timestamp, k string, v double").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(f"{tmpdir}/in")
    agg = session_reduce(stream, "k", func="nansum", value="v", ts_col="ts", gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["session_start"].isoformat(), r["nansum"])
        for r in spark.sql("select * from sess").collect()
    )
    assert got == [
        ("a", "2024-01-01T00:00:00", 3.0),
        ("a", "2024-01-01T02:10:00", 2.0),
        ("b", "2024-01-01T00:00:00", 4.0),
    ]


def test_streaming_dedup(spark, tmpdir):
    from dask_groupby_spark.streaming import streaming_dedup

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base, 1, "x"),
        (base + datetime.timedelta(minutes=1), 1, "x-dup"),
        (base + datetime.timedelta(minutes=2), 2, "y"),
    ]
    spark.createDataFrame(rows, "ts timestamp, id bigint, payload string").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    stream = spark.readStream.schema("ts timestamp, id bigint, payload string").parquet(
        f"{tmpdir}/in"
    )
    out = streaming_dedup(stream, "id", ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["id"] for r in spark.sql("select * from dedup").collect())
    assert ids == [1, 2]


def test_streaming_cumsum_state_across_batches(spark, tmpdir):
    # two separate files + maxFilesPerTrigger=1 → two micro-batches;
    # state must carry the running totals across them
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "key bigint, v double"
    ).coalesce(1).write.parquet(f"{tmpdir}/in/f1")
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "key bigint, v double"
    ).coalesce(1).write.parquet(f"{tmpdir}/in/f2")
    stream = (
        spark.readStream.schema("key bigint, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in/*")
    )
    out = streaming_cumsum(stream, "key", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("runsum")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from runsum").collect()
    # last update per key reflects the full history
    final = {}
    for r in rows:
        final[r["key"]] = max(final.get(r["key"], (0, 0.0)), (r["n_seen"], r["running_sum"]))
    assert final[1] == (3, 17.0)
    assert final[2] == (2, 4.0)


def test_streaming_ffill_state_across_batches(spark, tmpdir):
    from dask_groupby_spark.streaming import streaming_ffill

    base = datetime.datetime(2024, 1, 1)
    t = lambda m: base + datetime.timedelta(minutes=m)
    # batch 1 ends with key 1 = 7.0; batch 2 starts with a null → must fill 7.0
    spark.createDataFrame(
        [(1, t(0), None), (1, t(1), 7.0), (2, t(2), 3.0)],
        "key bigint, ts timestamp, v double",
    ).coalesce(1).write.parquet(f"{tmpdir}/in/f1")
    spark.createDataFrame(
        [(1, t(3), None), (2, t(4), None), (2, t(5), 9.0)],
        "key bigint, ts timestamp, v double",
    ).coalesce(1).write.parquet(f"{tmpdir}/in/f2")
    stream = (
        spark.readStream.schema("key bigint, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in/*")
    )
    out = streaming_ffill(stream, "key", "v", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("ffillout")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["key"], r["ts"].minute): r["ffill"]
           for r in spark.sql("select * from ffillout").collect()}
    # leading gap: nothing to fill from — the Pandas-UDF path surfaces NaN
    # as NULL (Arrow treats pandas NaN as null), unlike the batch scan's NaN
    assert got[(1, 0)] is None
    assert got[(1, 1)] == 7.0
    assert got[(1, 3)] == 7.0           # carried across micro-batches
    assert got[(2, 4)] == 3.0           # carried across micro-batches
    assert got[(2, 5)] == 9.0


def test_windowed_agg_fused(spark, tmpdir):
    """Multiple reductions share ONE stateful window aggregate and must
    equal the per-func windowed_reduce results."""
    from dask_groupby_spark.streaming import windowed_agg

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=m), "a" if m % 20 == 0 else "b", float(m))
        for m in range(0, 120, 10)
    ]
    spark.createDataFrame(rows, "ts timestamp, k string, v double").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(
        f"{tmpdir}/in"
    )
    agg = windowed_agg(
        stream, "k",
        funcs=[("count", "v", "n"), ("nansum", "v", "s"), ("nanmean", "v", "m")],
        ts_col="ts", window="1 hour",
    )
    q = (
        agg.writeStream.format("memory").queryName("winagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["k"]): (r["n"], r["s"], r["m"])
        for r in spark.sql("select * from winagg").collect()
    }
    # hour 0, k='a': minutes 0,20,40 → n=3, s=60, m=20
    assert got[("2024-03-01T00:00:00", "a")] == (3, 60.0, 20.0)
    # hour 1, k='b': minutes 70,90,110 → n=3, s=270, m=90
    assert got[("2024-03-01T01:00:00", "b")] == (3, 270.0, 90.0)

    with pytest.raises(ValueError, match="not supported in streaming"):
        windowed_agg(stream, "k", funcs=[("first", "v", "f")], ts_col="ts")


def test_stream_enrich_static_join(spark, tmpdir):
    """Stream-static broadcast enrichment: per-batch lookup, stream never
    shuffles; unmatched keys survive a left join."""
    from dask_groupby_spark.streaming import stream_enrich

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=10 * i), (i % 3) + 1, float(i))
        for i in range(9)
    ]
    spark.createDataFrame(rows, "ts timestamp, uid bigint, v double").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "uid bigint, tier string"
    )
    stream = spark.readStream.schema("ts timestamp, uid bigint, v double").parquet(
        f"{tmpdir}/in"
    )
    out = stream_enrich(stream, dim, on="uid", how="left").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        out.writeStream.format("memory").queryName("enrich")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["tier"]: r["n"] for r in spark.sql("select * from enrich").collect()}
    assert got == {"gold": 3, "silver": 3, None: 3}  # uid 3 unmatched

    with pytest.raises(ValueError, match="stream-static"):
        stream_enrich(stream, dim, on="uid", how="full")


def test_stream_stream_join_matches_batch(spark, tmpdir):
    """Stream-stream inner join with event-time range == the batch join on
    the same finite data; the range is relative to the LEFT timestamp."""
    from dask_groupby_spark.streaming import stream_stream_join

    base = datetime.datetime(2024, 4, 1, 0, 0, 0)
    # clicks at :60 and :180 min; views spread every 25 min
    clicks = [(100 + i, base + datetime.timedelta(minutes=m), i % 2)
              for i, m in enumerate((60, 180))]
    views = [(200 + i, base + datetime.timedelta(minutes=25 * i), i % 2)
             for i in range(8)]
    spark.createDataFrame(clicks, "click_id bigint, click_ts timestamp, uid bigint") \
        .write.parquet(f"{tmpdir}/clicks", mode="overwrite")
    spark.createDataFrame(views, "view_id bigint, view_ts timestamp, uid bigint") \
        .write.parquet(f"{tmpdir}/views", mode="overwrite")

    cs = spark.readStream.schema("click_id bigint, click_ts timestamp, uid bigint") \
        .parquet(f"{tmpdir}/clicks")
    vs = spark.readStream.schema("view_id bigint, view_ts timestamp, uid bigint") \
        .parquet(f"{tmpdir}/views")
    out = stream_stream_join(
        cs, vs, on="uid", left_ts="click_ts", right_ts="view_ts",
        before="1 hour", after="0 seconds", watermark="1 day",
    )
    q = (
        out.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["click_id"], r["view_id"])
           for r in spark.sql("select * from ssj").collect()}

    expect = {
        (c_id, v_id)
        for c_id, c_ts, c_uid in clicks
        for v_id, v_ts, v_uid in views
        if c_uid == v_uid and c_ts - datetime.timedelta(hours=1) <= v_ts <= c_ts
    }
    assert got == expect and len(expect) > 0

    with pytest.raises(ValueError, match="how must be"):
        stream_stream_join(cs, vs, on="uid", left_ts="click_ts",
                           right_ts="view_ts", how="anti")


def test_stream_stream_join_colliding_columns(spark, tmpdir):
    """Both sides share 'ts' AND a non-key payload column 'v': every
    colliding right column is suffixed _r, the predicate stays unambiguous,
    and output column names are unique."""
    from dask_groupby_spark.streaming import stream_stream_join

    base = datetime.datetime(2024, 4, 1, 0, 0, 0)
    lrows = [(i, base + datetime.timedelta(minutes=60 * i), 10.0 * i, i % 2)
             for i in range(3)]
    rrows = [(i, base + datetime.timedelta(minutes=30 * i), -1.0 * i, i % 2)
             for i in range(6)]
    spark.createDataFrame(lrows, "lid bigint, ts timestamp, v double, uid bigint") \
        .write.parquet(f"{tmpdir}/l", mode="overwrite")
    spark.createDataFrame(rrows, "rid bigint, ts timestamp, v double, uid bigint") \
        .write.parquet(f"{tmpdir}/r", mode="overwrite")
    ls = spark.readStream.schema("lid bigint, ts timestamp, v double, uid bigint") \
        .parquet(f"{tmpdir}/l")
    rs = spark.readStream.schema("rid bigint, ts timestamp, v double, uid bigint") \
        .parquet(f"{tmpdir}/r")

    out = stream_stream_join(
        ls, rs, on="uid", left_ts="ts", right_ts="ts",
        before="1 hour", after="0 seconds", watermark="1 day",
    )
    assert sorted(out.columns) == sorted(
        ["lid", "ts", "v", "rid", "ts_r", "v_r", "uid"]
    )
    q = (out.writeStream.format("memory").queryName("ssjc")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["lid"], r["rid"]) for r in spark.sql("select * from ssjc").collect()}
    expect = {
        (lid, rid)
        for lid, lts, _, luid in lrows
        for rid, rts, _, ruid in rrows
        if luid == ruid and lts - datetime.timedelta(hours=1) <= rts <= lts
    }
    assert got == expect and len(expect) > 0


def test_late_rows_dropped_after_watermark(spark, tmpdir):
    """Rows arriving beyond the watermark are dropped, not merged or
    re-emitted.  Spark >= 3.4 filters late events with a ONE-BATCH-DELAYED
    watermark (SPARK-40925), so the straggler arrives two batches after the
    event-time jump: by then even the delayed watermark has passed its
    window and the row must vanish."""
    import glob
    import os
    import shutil

    from dask_groupby_spark.streaming import windowed_reduce

    stage = f"{tmpdir}/in"
    os.makedirs(stage)
    batches = [
        [("a", "2024-01-02 12:00:00", 1.0)],                      # on time
        [("a", "2024-01-20 12:00:00", 2.0)],                      # jump
        [("a", "2024-01-28 12:00:00", 4.0)],                      # advance
        [("a", "2024-01-05 12:00:00", 100.0)],                    # straggler
    ]
    for i, rows in enumerate(batches, 1):
        df = spark.createDataFrame(rows, "k string, ts_s string, v double") \
            .select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
        d = f"{tmpdir}/b{i}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        dst = f"{stage}/batch{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (1700000000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", "1").parquet(stage)
    )
    out = windowed_reduce(
        stream, "k", func="nansum", value="v",
        ts_col="ts", window="1 day", watermark="5 days",
    )
    q = (out.writeStream.format("memory").queryName("late_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"].isoformat(), r["nansum"])
           for r in spark.sql("select * from late_t").collect()}
    # final watermark = Jan 28 12:00 - 5d = Jan 23 12:00: Jan 2 and Jan 20
    # windows are finalized; Jan 28's is still open; the Jan 5 straggler
    # (100.0) is dropped - its window was finalized (and late-filtered)
    # long before it arrived
    assert got == {("2024-01-02T00:00:00", 1.0), ("2024-01-20T00:00:00", 2.0)}
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1


def test_stream_ingest_dedup(spark, tmp_path_factory):
    """Streaming ingest loop: batch 2's duplicate-of-batch-1 is only dropped
    because batch 1's survivor was appended to the index — proves the
    cross-batch incremental-dedup state actually grows."""
    import os
    import time as _time

    from dask_groupby_spark.operators.dedup import minhash_index_write
    from dask_groupby_spark.streaming import stream_ingest_dedup

    base = tmp_path_factory.mktemp("ingest_dedup")
    index = str(base / "index")
    indir = str(base / "in")
    out = str(base / "out")
    ckpt = str(base / "ckpt")
    os.makedirs(indir)

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank"),
         (2, "a completely different document about spark catalyst optimizer rules")],
        "doc_id bigint, text string",
    )
    minhash_index_write(corpus, index)

    novel_1 = "entirely new material discussing large scale stream ingestion loops"
    novel_2 = "yet another unrelated passage describing watermark based state eviction"
    batch1 = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog near the river bank"),
         (102, novel_1),
         (103, novel_1)],  # intra-batch dup: one-hop keeper keeps 102
        "doc_id bigint, text string",
    )
    batch2 = spark.createDataFrame(
        [(201, novel_1),  # dup of batch 1's survivor — needs the grown index
         (202, novel_2)],
        "doc_id bigint, text string",
    )
    batch1.coalesce(1).write.parquet(f"{indir}/b1")
    _time.sleep(1.1)
    batch2.coalesce(1).write.parquet(f"{indir}/b2")
    now = _time.time()
    for sub, age in (("b1", 20), ("b2", 10)):
        for root, _, files in os.walk(f"{indir}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (now - age, now - age))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_ingest_dedup(stream, index, out, ckpt, threshold=0.8)
    q.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [102, 202]
    indexed = {r["id"] for r in spark.read.parquet(f"{index}/signatures").collect()}
    assert indexed == {1, 2, 102, 202}


def test_stream_cms_update_matches_batch(spark, tmp_path_factory):
    """Streaming CMS: per-batch sketch partitions merge to EXACTLY the
    batch sketch of the full input (counters are linear), and estimates
    answer over the whole stream history."""
    import os
    import time as _time

    from dask_groupby_spark.operators.sketches import cms_estimate, cms_sketch_table
    from dask_groupby_spark.streaming import stream_cms_update

    base = tmp_path_factory.mktemp("stream_cms")
    indir, skpath, ckpt = str(base / "in"), str(base / "sk"), str(base / "ckpt")
    os.makedirs(indir)

    b1 = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "term string")
    b2 = spark.createDataFrame([("a",)] * 3 + [("c",)] * 4, "term string")
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{indir}/b2")
    now = _time.time()
    for sub, age in (("b1", 20), ("b2", 10)):
        for root, _, files in os.walk(f"{indir}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (now - age, now - age))

    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_cms_update(stream, "term", skpath, ckpt, width=64, depth=3)
    q.awaitTermination(120)

    merged = spark.read.parquet(skpath)
    assert {r["batch_id"] for r in merged.select("batch_id").distinct().collect()} == {0, 1}
    qdf = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    got = {
        r["term"]: r["est_count"]
        for r in cms_estimate(merged, qdf, "term", width=64, depth=3).collect()
    }
    full = b1.unionByName(b2)
    want_sk = cms_sketch_table(full, "term", width=64, depth=3)
    want = {
        r["term"]: r["est_count"]
        for r in cms_estimate(want_sk, qdf, "term", width=64, depth=3).collect()
    }
    assert got == want
    assert got["a"] >= 9 and got["b"] >= 2 and got["c"] >= 4


def test_stream_hist_update_matches_batch(spark, tmp_path_factory):
    """Streaming histogram: merged per-batch partitions give the SAME
    quantile estimates as the one-shot batch sketch of the full input."""
    import os
    import time as _time

    from dask_groupby_spark.operators.sketches import hist_quantile, hist_sketch_table
    from dask_groupby_spark.streaming import stream_hist_update

    base = tmp_path_factory.mktemp("stream_hist")
    indir, skpath, ckpt = str(base / "in"), str(base / "sk"), str(base / "ckpt")
    os.makedirs(indir)
    b1 = spark.createDataFrame([("a", float(i)) for i in range(50)], "k string, v double")
    b2 = spark.createDataFrame([("a", float(i)) for i in range(50, 100)], "k string, v double")
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{indir}/b2")
    now = _time.time()
    for sub, age in (("b1", 20), ("b2", 10)):
        for root, _, files in os.walk(f"{indir}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (now - age, now - age))

    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_hist_update(stream, "v", skpath, ckpt, lo=0.0, hi=100.0, by=["k"], bins=100)
    q.awaitTermination(120)

    merged = spark.read.parquet(skpath)
    got = hist_quantile(merged, 0.5, lo=0.0, hi=100.0, by=["k"], bins=100).collect()[0]
    full = b1.unionByName(b2)
    want = hist_quantile(
        hist_sketch_table(full, "v", lo=0.0, hi=100.0, by=["k"], bins=100),
        0.5, lo=0.0, hi=100.0, by=["k"], bins=100,
    ).collect()[0]
    assert got["p0_5"] == want["p0_5"] == 49.5


def test_stream_hll_update_matches_batch(spark, tmp_path_factory):
    """Streaming HLL: merged per-batch sketch rows union to the same
    distinct-count estimates as the one-shot batch sketch."""
    import os
    import time as _time

    from dask_groupby_spark.operators.sketches import (
        hll_merge_count,
        hll_sketch_table,
    )
    from dask_groupby_spark.streaming import stream_hll_update

    base = tmp_path_factory.mktemp("stream_hll")
    indir, skpath, ckpt = str(base / "in"), str(base / "sk"), str(base / "ckpt")
    os.makedirs(indir)
    b1 = spark.createDataFrame(
        [("a", i) for i in range(100)], "k string, u bigint"
    )
    b2 = spark.createDataFrame(
        [("a", i) for i in range(50, 150)] + [("b", 1)], "k string, u bigint"
    )
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{indir}/b2")
    now = _time.time()
    for sub, age in (("b1", 20), ("b2", 10)):
        for root, _, files in os.walk(f"{indir}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (now - age, now - age))

    stream = (
        spark.readStream.schema("k string, u bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_hll_update(stream, "k", value="u", path=skpath, checkpoint=ckpt)
    q.awaitTermination(120)

    got = {
        r["k"]: r["approx_distinct"]
        for r in hll_merge_count(spark.read.parquet(skpath), "k").collect()
    }
    full = b1.unionByName(b2)
    want = {
        r["k"]: r["approx_distinct"]
        for r in hll_merge_count(hll_sketch_table(full, "k", value="u"), "k").collect()
    }
    assert got == want
    assert got["a"] == 150 and got["b"] == 1  # exact at this cardinality


def test_stream_kmv_update_matches_batch(spark, tmp_path_factory):
    """Streaming KMV: kmv_merge over the per-batch sketch partitions must
    equal the one-shot batch sketch (merge is idempotent+commutative),
    and the merged sketches must answer set-overlap queries."""
    import os
    import time as _time

    from dask_groupby_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_overlap,
        kmv_sketch_table,
    )
    from dask_groupby_spark.streaming import stream_kmv_update

    base = tmp_path_factory.mktemp("stream_kmv")
    indir, skpath, ckpt = str(base / "in"), str(base / "sk"), str(base / "ckpt")
    os.makedirs(indir)
    b1 = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(50, 120)],
        "k string, u bigint",
    )
    b2 = spark.createDataFrame(
        [("a", i) for i in range(50, 150)] + [("b", 1)], "k string, u bigint"
    )
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{indir}/b2")
    now = _time.time()
    for sub, age in (("b1", 20), ("b2", 10)):
        for root, _, files in os.walk(f"{indir}/{sub}"):
            for f in files:
                os.utime(os.path.join(root, f), (now - age, now - age))

    stream = (
        spark.readStream.schema("k string, u bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_kmv_update(stream, "k", value="u", path=skpath, checkpoint=ckpt, k=256)
    q.awaitTermination(120)

    merged = kmv_merge(spark.read.parquet(skpath), "k", k=256)
    full = b1.unionByName(b2)
    want = {
        r["k"]: r["kmv"]
        for r in kmv_sketch_table(full, "k", value="u", k=256).collect()
    }
    got = {r["k"]: r["kmv"] for r in merged.collect()}
    assert got == want
    # whole-history set questions from the merged table: exact regime here
    est = {
        r["k"]: r["distinct_est"]
        for r in kmv_distinct(full, "k", value="u", k=256).collect()
    }
    assert est == {"a": 150.0, "b": 71.0}
    ov = kmv_overlap(
        merged.withColumn("kmv_k", F.lit(256)), group_col="k", k=256
    ).collect()[0]
    # B = {50..119, 1} is a subset of A = {0..149}
    assert (ov["union_est"], ov["inter_est"]) == (150.0, 71.0)


def test_streaming_drift_psi_ks_from_stream_histograms(spark, tmp_path_factory):
    """The streaming-drift composition: two stream_hist_update runs (a
    'reference' week and a 'current' week, each consumed as a file
    stream) feed psi_from_histograms / ks_from_histograms, and the PSI
    equals the direct raw-data population_stability over the same
    declared-domain edges — drift monitoring without rescanning raw
    data, exactly-once per batch."""
    import os
    import time as _time

    from dask_groupby_spark.operators import ks_from_histograms, psi_from_histograms
    from dask_groupby_spark.operators.stats import population_stability
    from dask_groupby_spark.streaming import stream_hist_update

    base = tmp_path_factory.mktemp("stream_drift")
    ref_rows = [(float(i % 10),) for i in range(300)]
    cur_rows = [(float((i % 10) + 2),) for i in range(200)]     # shifted
    ref_df = spark.createDataFrame(ref_rows, "v double")
    cur_df = spark.createDataFrame(cur_rows, "v double")

    paths = {}
    for tag, df in (("ref", ref_df), ("cur", cur_df)):
        indir = str(base / f"in_{tag}")
        os.makedirs(indir)
        df.coalesce(1).write.parquet(f"{indir}/b1")
        stream = spark.readStream.schema("v double").parquet(f"{indir}/*")
        q = stream_hist_update(
            stream, "v", str(base / f"sk_{tag}"), str(base / f"ck_{tag}"),
            lo=0.0, hi=12.0, bins=6,
        )
        q.awaitTermination(120)
        paths[tag] = spark.read.parquet(str(base / f"sk_{tag}"))

    psi = psi_from_histograms(paths["ref"], paths["cur"]).collect()
    # direct PSI over the same interior edges [2,4,6,8,10] (domain [0,12)/6)
    direct = population_stability(ref_df, cur_df, "v", [2.0, 4.0, 6.0, 8.0, 10.0]).collect()
    got = {r["bin"]: r["psi_term"] for r in psi}
    want = {r["bin"]: r["psi_term"] for r in direct}
    assert set(got) == set(want)
    for b in got:
        assert got[b] == pytest.approx(want[b], rel=1e-9)

    ks = ks_from_histograms(paths["ref"], paths["cur"]).collect()[0]
    assert ks["n_ref"] == 300 and ks["n_cur"] == 200
    assert ks["ks_stat"] > 0.1    # the shift registers through the sketch path


def test_stream_rules_update_matches_batch(spark, tmp_path_factory):
    """Streaming quality monitor: merged per-batch rule-violation
    counters equal the one-shot batch check_rules of the full input, and
    per-batch rows are inspectable as a time series."""
    import os

    from pyspark.sql import functions as F

    from dask_groupby_spark.operators import check_rules
    from dask_groupby_spark.streaming import stream_rules_update

    base = tmp_path_factory.mktemp("stream_rules")
    indir, mpath, ckpt = str(base / "in"), str(base / "m"), str(base / "ck")
    os.makedirs(indir)
    b1 = spark.createDataFrame([(i, float(i % 7) - 1) for i in range(40)], "id bigint, v double")
    b2 = spark.createDataFrame([(i, None) for i in range(40, 50)], "id bigint, v double")
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    b2.coalesce(1).write.parquet(f"{indir}/b2")

    rules = lambda: {"v_nonneg": F.col("v") >= 0, "id_set": F.col("id").isNotNull()}
    stream = spark.readStream.schema("id bigint, v double").parquet(f"{indir}/*")
    q = stream_rules_update(stream, rules(), mpath, ckpt)
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(mpath)
        .groupBy("rule")
        .agg(F.sum("n_rows").alias("n_rows"), F.sum("n_violations").alias("n_violations"))
    )
    got = {r["rule"]: (r["n_rows"], r["n_violations"]) for r in merged.collect()}
    full = b1.unionByName(b2)
    want = {r["rule"]: (r["n_rows"], r["n_violations"])
            for r in check_rules(full, rules()).collect()}
    assert got == want
    assert got["v_nonneg"][1] > 0        # NULLs + negatives counted
    # the time series is per-batch partitioned
    import glob
    assert len(glob.glob(f"{mpath}/batch_id=*")) >= 1


# ------------------------------------------------- crash recovery (r7)


def _drain(q):
    """availableNow queries self-stop, but the session's StreamingQueryManager
    can still hold the checkpoint registration briefly — wait for full
    termination and force-stop so a restart on the SAME checkpoint doesn't
    trip the concurrent-use guard."""
    import time as _time

    q.awaitTermination(120)
    q.stop()
    for _ in range(100):
        if not q.isActive:
            break
        _time.sleep(0.2)


def _age_files(root_dir, age_s):
    import os
    import time as _time

    now = _time.time()
    for root, _, files in os.walk(root_dir):
        for f in files:
            os.utime(os.path.join(root, f), (now - age_s, now - age_s))


def test_stream_cms_crash_recovery_no_double_count(spark, tmp_path_factory):
    """Kill-and-restart-from-checkpoint (VERDICT r5 item #7): run batch 0,
    then forge the canonical crash point — sink output for the batch is on
    disk but the epoch commit marker is NOT (delete checkpoint/commits/0).
    On restart Structured Streaming replays batch 0 with the SAME batch_id
    and the SAME recorded source offsets; the batch_id=-partition overwrite
    contract must absorb the replay (rewrite, not append) so counters are
    exactly-once, then process the newly-arrived file as batch 1."""
    import os

    from dask_groupby_spark.operators.sketches import cms_estimate, cms_sketch_table
    from dask_groupby_spark.streaming import stream_cms_update

    base = tmp_path_factory.mktemp("cms_crash")
    indir, skpath, ckpt = str(base / "in"), str(base / "sk"), str(base / "ckpt")
    os.makedirs(indir)

    b1 = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "term string")
    b2 = spark.createDataFrame([("a",)] * 3 + [("c",)] * 4, "term string")

    # phase 1: only b1 exists; availableNow drains it as batch 0 and stops
    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _age_files(f"{indir}/b1", 20)
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_cms_update(stream, "term", skpath, ckpt, width=64, depth=3)
    _drain(q)
    assert os.path.isdir(f"{skpath}/batch_id=0")

    # forge the crash: epoch commit lost, sink output + offsets survive
    os.remove(f"{ckpt}/commits/0")
    if os.path.exists(f"{ckpt}/commits/.0.crc"):
        os.remove(f"{ckpt}/commits/.0.crc")  # checksum sibling blocks rewrite

    # phase 2: new data arrives while "down"; restart from the checkpoint
    b2.coalesce(1).write.parquet(f"{indir}/b2")
    _age_files(f"{indir}/b2", 10)
    stream2 = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q2 = stream_cms_update(stream2, "term", skpath, ckpt, width=64, depth=3)
    _drain(q2)

    merged = spark.read.parquet(skpath)
    assert {
        r["batch_id"] for r in merged.select("batch_id").distinct().collect()
    } == {0, 1}
    qdf = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    got = {
        r["term"]: r["est_count"]
        for r in cms_estimate(merged, qdf, "term", width=64, depth=3).collect()
    }
    want_sk = cms_sketch_table(b1.unionByName(b2), "term", width=64, depth=3)
    want = {
        r["term"]: r["est_count"]
        for r in cms_estimate(want_sk, qdf, "term", width=64, depth=3).collect()
    }
    # replayed batch 0 REWROTE its partition: a double-count would inflate
    # 'a' to >= 15 and 'b' to >= 4
    assert got == want


def test_stream_ingest_dedup_crash_recovery_self_heals(spark, tmp_path_factory):
    """Same forged crash for the at-least-once append loop: the replayed
    batch's survivors are ALREADY in the MinHash index (appended before the
    crash), so on replay they match themselves at Jaccard 1.0 and are
    dropped — the ingest loop converges to exactly-once output without any
    sink-side transaction."""
    import os

    from dask_groupby_spark.operators.dedup import minhash_index_write
    from dask_groupby_spark.streaming import stream_ingest_dedup

    base = tmp_path_factory.mktemp("ingest_crash")
    index, indir = str(base / "index"), str(base / "in")
    out, ckpt = str(base / "out"), str(base / "ckpt")
    os.makedirs(indir)

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank"),
         (2, "a completely different document about spark catalyst optimizer rules")],
        "doc_id bigint, text string",
    )
    minhash_index_write(corpus, index)

    novel_1 = "entirely new material discussing large scale stream ingestion loops"
    novel_2 = "yet another unrelated passage describing watermark based state eviction"
    b1 = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog near the river bank"),
         (102, novel_1)],
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [(201, novel_1), (202, novel_2)], "doc_id bigint, text string"
    )

    b1.coalesce(1).write.parquet(f"{indir}/b1")
    _age_files(f"{indir}/b1", 20)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q = stream_ingest_dedup(stream, index, out, ckpt, threshold=0.8)
    _drain(q)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [102]

    os.remove(f"{ckpt}/commits/0")  # crash after sink write, before commit
    if os.path.exists(f"{ckpt}/commits/.0.crc"):
        os.remove(f"{ckpt}/commits/.0.crc")

    b2.coalesce(1).write.parquet(f"{indir}/b2")
    _age_files(f"{indir}/b2", 10)
    stream2 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/*")
    )
    q2 = stream_ingest_dedup(stream2, index, out, ckpt, threshold=0.8)
    _drain(q2)

    # replayed 102 matched itself in the index and was dropped; 201 matched
    # 102; 202 is the only new survivor — NO duplicate rows in out
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [102, 202]
    indexed = sorted(
        r["id"] for r in spark.read.parquet(f"{index}/signatures").collect()
    )
    assert indexed == [1, 2, 102, 202]


def test_streaming_cumsum_string_keys(spark, tmpdir):
    """r7 review: the output key column keeps the input's NAME and TYPE —
    the former hardcoded `key bigint` schema broke on string keys."""
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], "domain string, v double"
    ).coalesce(1).write.parquet(f"{tmpdir}/in/f1")
    stream = spark.readStream.schema("domain string, v double").parquet(
        f"{tmpdir}/in/*"
    )
    out = streaming_cumsum(stream, "domain", "v")
    assert out.schema["domain"].dataType.typeName() == "string"
    q = (
        out.writeStream.format("memory")
        .queryName("strsum")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["domain"]: (r["n_seen"], r["running_sum"])
        for r in spark.sql("select * from strsum").collect()
    }
    assert got == {"a": (2, 4.0), "b": (1, 2.0)}


def test_streaming_rejects_holistic_funcs(spark, tmpdir):
    """median/quantile buffer O(rows) per group in a state store and
    nunique lowers to a streaming-unsupported distinct aggregate — the
    gate must reject them up front (r9 review), not let the state grow
    unbounded / fail at analysis."""
    import pytest as _pytest

    from dask_groupby_spark.streaming import (
        session_reduce,
        windowed_agg,
        windowed_reduce,
    )

    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "key bigint, ts timestamp, v double",
    ).write.mode("overwrite").parquet(f"{tmpdir}/in/h1")
    stream = (
        spark.readStream.schema("key bigint, ts timestamp, v double")
        .parquet(f"{tmpdir}/in/*")
    )
    for bad in ("median", "nanmedian", "quantile", "nanquantile", "nunique"):
        with _pytest.raises(ValueError, match="not supported in streaming"):
            windowed_reduce(stream, "key", func=bad, value="v")
        with _pytest.raises(ValueError, match="not supported in streaming"):
            session_reduce(stream, "key", func=bad, value="v")
        with _pytest.raises(ValueError, match="not supported in streaming"):
            windowed_agg(stream, "key", funcs=[(bad, "v", "x")])
    # the sketch alternatives stay available
    windowed_reduce(stream, "key", func="approx_nunique", value="v")
    windowed_reduce(stream, "key", func="approx_median", value="v")


def test_windowed_reduce_bool_values_and_null_keys_match_batch(spark, tmpdir):
    """Batch-parity (r9 review): boolean values get the registry's
    bool->int cast (nansum of flags = flag count) and NULL-keyed rows are
    dropped exactly like batch groupby_reduce's missing-label exclusion."""
    from dask_groupby_spark.streaming import windowed_reduce

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (1, base, True),
        (1, base + datetime.timedelta(minutes=1), False),
        (1, base + datetime.timedelta(minutes=2), True),
        (None, base + datetime.timedelta(minutes=3), True),
    ]
    spark.createDataFrame(
        rows, "key bigint, ts timestamp, flag boolean"
    ).coalesce(1).write.parquet(f"{tmpdir}/in/b1")
    stream = (
        spark.readStream.schema("key bigint, ts timestamp, flag boolean")
        .parquet(f"{tmpdir}/in/*")
    )
    out = windowed_reduce(
        stream, "key", func="nansum", value="flag", window="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("boolsum")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select key, nansum from boolsum").collect()
    assert {(r["key"], r["nansum"]) for r in got} == {(1, 2)}


def test_streaming_ffill_multichunk_event_order(spark, tmpdir):
    """A key whose micro-batch rows span several Arrow chunks must be
    forward-filled in GLOBAL event-time order (r9 review: per-chunk
    sorting filled earlier rows from a later-ts chunk and persisted the
    wrong last-value)."""
    from dask_groupby_spark.streaming import streaming_ffill

    base = datetime.datetime(2024, 6, 1)
    t = lambda m: base + datetime.timedelta(minutes=m)
    # written in DESCENDING ts order so chunk 1 holds the latest rows
    rows = [(1, t(5), 50.0), (1, t(4), None), (1, t(1), 10.0), (1, t(0), None)]
    spark.createDataFrame(
        rows, "key bigint, ts timestamp, v double"
    ).coalesce(1).write.parquet(f"{tmpdir}/in/m1")
    stream = (
        spark.readStream.schema("key bigint, ts timestamp, v double")
        .parquet(f"{tmpdir}/in/*")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = streaming_ffill(stream, "key", "v", ts_col="ts")
        q = (
            out.writeStream.format("memory")
            .queryName("ffillchunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r["ts"].minute: r["ffill"]
           for r in spark.sql("select * from ffillchunks").collect()}
    assert got[0] is None          # nothing before t0 — never fill from t5
    assert got[1] == 10.0
    assert got[4] == 10.0          # filled from t1, not from the later t5
    assert got[5] == 50.0
