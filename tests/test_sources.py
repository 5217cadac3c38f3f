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
