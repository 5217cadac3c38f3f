"""Sources/sinks: multi-format batch readers, streaming file source, and
the ns-timestamp normalization in load_table."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.sources import load_table, read_source, read_stream, save_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dgs-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], "id bigint, k string, v double"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_formats(spark, tmpdir, fmt):
    df = _sample(spark)
    path = f"{tmpdir}/t_{fmt}"
    save_table(df, path, fmt=fmt, **({"header": True} if fmt == "csv" else {}))
    schema = None if fmt in ("parquet", "orc") else "id bigint, k string, v double"
    back = read_source(spark, path, fmt=fmt, schema=schema, **(
        {"header": True} if fmt == "csv" else {}
    ))
    got = {(r["id"], r["k"], r["v"]) for r in back.collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)}


def test_save_table_partitioned_prunes(spark, tmpdir):
    df = _sample(spark)
    save_table(df, f"{tmpdir}/part", partition_by=("k",))
    back = read_source(spark, f"{tmpdir}/part").where(F.col("k") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 2
    # partition filter reaches the scan (directory pruning, not a row filter)
    assert "PartitionFilters: [isnotnull(k" in plan


def test_read_stream_requires_schema(spark, tmpdir):
    with pytest.raises(ValueError, match="schema"):
        read_stream(spark, tmpdir)


def test_read_stream_file_source(spark, tmpdir):
    _sample(spark).write.parquet(f"{tmpdir}/in", mode="overwrite")
    stream = read_stream(
        spark, f"{tmpdir}/in", schema="id bigint, k string, v double",
        max_files_per_trigger=1,
    )
    q = (
        stream.groupBy("k").agg(F.sum("v").alias("s"))
        .writeStream.format("memory").queryName("srcsum")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["k"]: r["s"] for r in spark.sql("select * from srcsum").collect()}
    assert got == {"a": 5.0, "b": 2.5}


# ---------------------------------------------------------------------------
# timestamp-encoding robustness: the driver testdata has shipped events.ts as
# INT64 TIMESTAMP(NANOS) (round 1-2) and naive timestamp[us] → TIMESTAMP_NTZ
# (round 3+).  load_table must yield a plain TIMESTAMP for all three parquet
# encodings, same instants (ref behavior to match: flox views datetimes as
# int64 and restores dtype, flox/core.py:2506-2520).


def _write_ts_parquet(path, unit, tz):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    instants = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 1, 1, 12, 34, 56, 789000),
        datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
    ]
    arr = pa.array(instants, type=pa.timestamp(unit, tz=tz))
    pq.write_table(pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arr}), path)
    return instants


@pytest.mark.parametrize(
    "unit,tz", [("ns", None), ("us", None), ("us", "UTC")],
    ids=["int64-nanos", "timestamp-ntz", "timestamp-utc"],
)
def test_load_table_timestamp_encodings(spark, tmpdir, unit, tz):
    instants = _write_ts_parquet(f"{tmpdir}/events.parquet", unit, tz)
    df = load_table(spark, tmpdir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"].replace(tzinfo=None) for r in df.select("ts").collect())
    assert got == instants


@pytest.mark.parametrize(
    "unit,tz", [("us", None), ("us", "UTC")], ids=["ntz", "utc"]
)
def test_time_to_seconds_on_raw_encodings(spark, tmpdir, unit, tz):
    """Operators must survive a user handing them a RAW parquet read (no
    load_table normalization): time_to_seconds handles NTZ directly."""
    from dask_groupby_spark.dtypes import time_to_seconds

    _write_ts_parquet(f"{tmpdir}/events.parquet", unit, tz)
    df = spark.read.parquet(f"{tmpdir}/events.parquet")
    secs = sorted(
        r["s"] for r in df.select(time_to_seconds(df, "ts").alias("s")).collect()
    )
    # 2024-01-01T00:00:00Z epoch seconds
    assert secs[0] == 1704067200.0
    assert abs(secs[1] - (1704067200.0 + 12 * 3600 + 34 * 60 + 56.789)) < 1e-6


def test_operators_accept_ntz_input(spark, tmpdir):
    """sessionize / time_weighted_mean / asof_join / resample on a raw NTZ
    frame — the exact shape that broke 8 queries in round 3."""
    import datetime

    from dask_groupby_spark.operators.selection import sessionize
    from dask_groupby_spark.operators.weighted import time_weighted_mean
    from dask_groupby_spark.resample import resample

    _write_ts_parquet(f"{tmpdir}/events.parquet", "us", None)
    df = (
        spark.read.parquet(f"{tmpdir}/events.parquet")
        .withColumn("k", F.lit("a"))
        .withColumn("v", F.col("event_id").cast("double"))
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"

    s = sessionize(df, "k", ts_col="ts", gap=3600.0)
    assert [r["session_id"] for r in s.orderBy("ts").collect()] == [0, 1, 2]

    t = time_weighted_mean(df, "k", ts_col="ts", value="v").collect()
    assert len(t) == 1 and t[0]["twa"] is not None

    r = resample(df, "ts", "1 day", "nansum", "v")
    assert r.count() == 2  # 2024-01-01 (two rows), 2024-06-30
    assert dict(r.dtypes)["bucket"] == "timestamp"


def test_write_stream_file_sink_roundtrip(spark, tmpdir):
    """Streaming file sink: stream in → windowed reduce (watermarked,
    append mode) → parquet out, exactly-once via checkpoint; the landed
    files must equal the batch result."""
    import datetime

    from dask_groupby_spark.sources import write_stream
    from dask_groupby_spark.streaming import windowed_reduce

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (base + datetime.timedelta(minutes=30 * i), "k" + str(i % 2), float(i))
        for i in range(8)
    ]
    spark.createDataFrame(rows, "ts timestamp, k string, v double").write.parquet(
        f"{tmpdir}/in", mode="overwrite"
    )
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(
        f"{tmpdir}/in"
    )
    agg = windowed_reduce(
        stream, "k", func="nansum", value="v", ts_col="ts",
        window="1 hour", watermark="0 seconds",
    )
    q = write_stream(
        agg, f"{tmpdir}/out", checkpoint=f"{tmpdir}/ckpt", available_now=True
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["k"]): r["nansum"]
        for r in spark.read.parquet(f"{tmpdir}/out").collect()
    }
    # hour 0: i=0 (k0, 0.0) + i=1 (k1, 1.0); hour 1: i=2,3 ...
    assert got[("2024-05-01T00:00:00", "k0")] == 0.0
    assert got[("2024-05-01T01:00:00", "k0")] == 2.0
    assert got[("2024-05-01T01:00:00", "k1")] == 3.0


def test_save_table_sort_by_tightens_rowgroup_stats(spark, tmp_path):
    """sort_by clusters values so parquet row-group min/max stats become
    selective: with multiple row groups, each sorted group must span a
    small, non-overlapping slice of the domain (that is what lets a range
    filter skip groups at scan time)."""
    import glob

    import pyarrow.parquet as pq

    from dask_groupby_spark.sources import save_table

    df = (
        spark.range(0, 200_000)
        .select(
            (F.col("id") * 48271 % 200_000).alias("k"),  # shuffled order
            F.col("id").alias("payload"),
        )
        .coalesce(1)
    )
    path = str(tmp_path / "sorted")
    save_table(df, path, sort_by=("k",), **{"parquet.block.size": "65536"})
    f = glob.glob(f"{path}/part-*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    assert md.num_row_groups >= 4  # small block size -> many groups
    spans = []
    for i in range(md.num_row_groups):
        col = md.row_group(i).column(0)
        assert col.path_in_schema == "k"
        st = col.statistics
        spans.append((st.min, st.max))
    spans.sort()
    # each group's span is a narrow slice, and consecutive groups don't
    # overlap (strictly increasing min after sort)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
        assert hi1 - lo1 < 200_000 / 2


def test_compact_table_shrinks_files_keeps_data(spark, tmp_path):
    from dask_groupby_spark.sources import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before_sum = spark.read.parquet(path).agg(F.sum("id")).first()[0]

    n_before, n_after = compact_table(spark, path, target_file_mb=512)
    assert n_before >= 40 and n_after <= 2

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).first()[0] == before_sum
    assert set(back.columns) == {"id", "g"}


# ---------------------------------------------------------------- upsert


class TestUpsertTable:
    def test_first_write_then_update_and_insert(self, spark, tmp_path):
        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k bigint, name string, v double",
        )
        upsert_table(spark, p, base, "k")          # missing path -> first write
        upd = spark.createDataFrame(
            [(2, "B2", 22.0), (4, "d", 40.0)], "k bigint, name string, v double"
        )
        upsert_table(spark, p, upd, "k")
        got = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(p).collect()}
        assert got == {1: ("a", 10.0), 2: ("B2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    def test_multi_column_key(self, spark, tmp_path):
        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t2")
        base = spark.createDataFrame(
            [(1, "x", 1.0), (1, "y", 2.0)], "a bigint, b string, v double"
        )
        upsert_table(spark, p, base, ["a", "b"])
        upd = spark.createDataFrame([(1, "y", 99.0)], "a bigint, b string, v double")
        upsert_table(spark, p, upd, ["a", "b"])
        got = {(r["a"], r["b"]): r["v"] for r in spark.read.parquet(p).collect()}
        assert got == {(1, "x"): 1.0, (1, "y"): 99.0}

    def test_bad_key_raises_and_leaves_table_intact(self, spark, tmp_path):
        import pytest as _pt

        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t3")
        base = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
        upsert_table(spark, p, base, "k")
        upd = spark.createDataFrame([(2, 2.0)], "nope bigint, v double")
        with _pt.raises(ValueError):
            upsert_table(spark, p, upd, "nope")
        assert spark.read.parquet(p).count() == 1

    def test_no_leftover_temp_dirs(self, spark, tmp_path):
        import os

        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t4")
        base = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
        upsert_table(spark, p, base, "k")
        upsert_table(spark, p, base, "k")
        assert sorted(os.listdir(tmp_path)) == ["t4"]

    def test_null_key_rows_replaced_not_appended(self, spark, tmp_path):
        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t5")
        base = spark.createDataFrame([(None, "old"), (1, "x")], "k bigint, v string")
        upsert_table(spark, p, base, "k")
        upd = spark.createDataFrame([(None, "new")], "k bigint, v string")
        upsert_table(spark, p, upd, "k")
        got = {r["k"]: r["v"] for r in spark.read.parquet(p).collect()}
        assert got == {None: "new", 1: "x"}

    # -------- crash-window recovery (ADVICE r6 #1: silent data loss) --------

    def test_crash_between_renames_recovers_original(self, spark, tmp_path):
        """Simulate a crash landing BETWEEN the two swap renames: the live
        path is missing, the real data is parked at __upsert_old, a merged
        temp sits at __upsert_tmp.  The next upsert must NOT take the
        first-write branch (which would drop the original silently) — it
        must restore the parked data, drop the stale temp, and apply the
        fresh updates on top."""
        import os
        import shutil

        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t6")
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
        )
        upsert_table(spark, p, base, "k")
        # forge the mid-swap crash state: park the live dir, leave a temp
        os.rename(p, p + "__upsert_old")
        shutil.copytree(p + "__upsert_old", p + "__upsert_tmp")
        assert not os.path.exists(p)

        upd = spark.createDataFrame([(2, "B2"), (4, "d")], "k bigint, v string")
        upsert_table(spark, p, upd, "k")
        got = {r["k"]: r["v"] for r in spark.read.parquet(p).collect()}
        # original rows 1 and 3 survived the crash; update + insert applied
        assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
        assert not os.path.exists(p + "__upsert_old")
        assert not os.path.exists(p + "__upsert_tmp")

    def test_crash_after_swap_before_cleanup(self, spark, tmp_path):
        """Crash AFTER the swap completed but before the parked copy was
        deleted: live path and __upsert_old both exist.  The next upsert
        must drop the superseded _old (else its own park rename collides)
        and proceed normally."""
        import os
        import shutil

        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t7")
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
        upsert_table(spark, p, base, "k")
        shutil.copytree(p, p + "__upsert_old")  # superseded parked copy

        upd = spark.createDataFrame([(2, "B2")], "k bigint, v string")
        upsert_table(spark, p, upd, "k")
        got = {r["k"]: r["v"] for r in spark.read.parquet(p).collect()}
        assert got == {1: "a", 2: "B2"}
        assert not os.path.exists(p + "__upsert_old")
        assert not os.path.exists(p + "__upsert_tmp")

    def test_compact_recovers_parked_table(self, spark, tmp_path):
        """compact_table shares the swap sequence — a mid-swap crash state
        must heal (restore the parked original) instead of failing on the
        missing live path."""
        import os

        from dask_groupby_spark.sources import compact_table

        p = str(tmp_path / "t8")
        spark.range(100).repartition(8).write.parquet(p)
        os.rename(p, p + "__compact_old")

        n_before, n_after = compact_table(spark, p, target_file_mb=512)
        assert n_after <= n_before
        assert sorted(
            r["id"] for r in spark.read.parquet(p).collect()
        ) == list(range(100))
        assert not os.path.exists(p + "__compact_old")

    def test_cross_stem_recovery(self, spark, tmp_path):
        """r7 review finding: a COMPACT-crash wreck must be healed by the
        next UPSERT too (and vice versa) — healing only one's own stem
        would re-open the silent first-write data loss through the other
        maintenance op."""
        import os

        from dask_groupby_spark.sources import upsert_table

        p = str(tmp_path / "t9")
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
        upsert_table(spark, p, base, "k")
        # forge a compact_table mid-swap crash state
        os.rename(p, p + "__compact_old")
        assert not os.path.exists(p)

        upd = spark.createDataFrame([(3, "c")], "k bigint, v string")
        upsert_table(spark, p, upd, "k")
        got = {r["k"]: r["v"] for r in spark.read.parquet(p).collect()}
        assert got == {1: "a", 2: "b", 3: "c"}  # original healed, not dropped
        assert not os.path.exists(p + "__compact_old")


def test_extract_json_fields(spark):
    """Schema-on-read JSON extraction: typed paths, nested paths, lenient
    NULL semantics for missing/malformed payloads."""
    from dask_groupby_spark.sources import extract_json_fields

    rows = [
        (1, '{"k": 69, "meta": {"tag": "a"}}'),
        (2, '{"k": "7"}'),          # string number still casts
        (3, '{"other": 1}'),        # missing path -> NULL
        (4, "not json at all"),     # malformed -> NULL
        (5, None),                  # NULL input -> NULL
    ]
    df = spark.createDataFrame(rows, "event_id bigint, props string")
    out = extract_json_fields(
        df, "props",
        {"k": ("$.k", "bigint"), "tag": "$.meta.tag"},
        drop=True,
    )
    assert "props" not in out.columns
    got = {r["event_id"]: (r["k"], r["tag"]) for r in out.collect()}
    assert got == {
        1: (69, "a"),
        2: (7, None),
        3: (None, None),
        4: (None, None),
        5: (None, None),
    }
    # real driver data round-trip: events.props carries {"k": N}
    from dask_groupby_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got2 = extract_json_fields(ev, "props", {"pk": ("$.k", "bigint")})
    n_null = got2.where(F.col("pk").isNull()).count()
    assert n_null == 0 and got2.count() > 0
