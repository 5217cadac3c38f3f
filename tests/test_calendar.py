"""Non-standard-calendar datetime encode/decode (cftime parity — ref
datetime_to_numeric, flox/xrutils.py:189-247) as pure Catalyst arithmetic."""

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.calendar import (
    decode_calendar_datetime,
    encode_calendar_datetime,
)


def _enc(spark, vals, calendar, unit="second"):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    return [
        r["e"] for r in df.select(
            encode_calendar_datetime(F.col("t"), calendar, unit).alias("e")
        ).collect()
    ]


def test_known_offsets_noleap(spark):
    got = _enc(spark, [
        "0001-01-01 00:00:00", "0001-03-01", "0002-01-01", "1979-07-02T12:00:00",
    ], "noleap")
    assert got[0] == 0
    assert got[1] == 59 * 86400            # Jan(31) + Feb(28, never leap)
    assert got[2] == 365 * 86400
    assert got[3] == ((1978 * 365 + 181 + 1) * 86400 + 12 * 3600)


def test_known_offsets_360day_feb30_valid(spark):
    # Feb 30 exists in the 360-day calendar — the exact value TIMESTAMP
    # cannot represent, the reason the axis ships as strings
    got = _enc(spark, ["0005-02-30", "0001-01-01"], "360_day", unit="day")
    assert got[1] == 0
    assert got[0] == 4 * 360 + 30 + 29


def test_roundtrip_all_calendars(spark):
    vals = [
        "0001-01-01 00:00:00", "0123-12-30 23:59:59", "1979-07-02 12:34:56",
        "2100-02-28 00:00:01",
    ]
    for cal in ("noleap", "360_day", "all_leap"):
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        back = df.select(
            "t",
            decode_calendar_datetime(
                encode_calendar_datetime(F.col("t"), cal), cal
            ).alias("b"),
        ).collect()
        for r in back:
            assert r["b"] == r["t"].replace("T", " "), (cal, r)


def test_malformed_and_errors(spark):
    got = _enc(spark, ["not-a-date", "1979-07-02"], "noleap")
    assert got[0] is None and got[1] is not None
    with pytest.raises(ValueError, match="unknown calendar"):
        _enc(spark, ["0001-01-01"], "standard")
    with pytest.raises(ValueError, match="unit"):
        _enc(spark, ["0001-01-01"], "noleap", unit="hour")


def test_grouped_mean_over_noleap_axis(spark):
    """The reference use-case: mean of a cftime axis per group — encode,
    nanmean on the int64 view, decode (flox/core.py:2506-2520 analog)."""
    from dask_groupby_spark import groupby_reduce

    rows = [
        ("a", "0010-01-01 00:00:00"), ("a", "0010-01-03 00:00:00"),
        ("b", "0020-06-15 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, t string").withColumn(
        "e", encode_calendar_datetime(F.col("t"), "noleap")
    )
    out = groupby_reduce(df, "k", func="nanmean", value="e")
    dec = out.select(
        "k", decode_calendar_datetime(F.col("nanmean").cast("bigint"), "noleap").alias("m")
    )
    got = {r["k"]: r["m"] for r in dec.collect()}
    assert got["a"] == "0010-01-02 00:00:00"
    assert got["b"] == "0020-06-15 12:00:00"


def test_roundtrip_property(spark):
    """Property: decode∘encode is the identity over the calendar's valid
    date space — seeded random ymd-hms tuples per calendar.  r13
    (suite-runtime, VERDICT r12 #4): sampling was hypothesis-driven with
    one tiny Spark job per example, and per-query PLANNING of the deep
    calendar CASE tree dominated (~60 s for 12 examples); the same ~100
    sampled datetimes per calendar now ride ONE job per calendar — row
    coverage equal (seeded, reproducible), only hypothesis shrinking is
    lost, which a printed failing row replaces."""
    import random

    month_days = {
        "noleap": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
        "all_leap": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
        "360_day": [30] * 12,
    }
    rng = random.Random(0xCA1)
    for cal, mlen in month_days.items():
        vals = []
        for _ in range(96):
            y = rng.randint(1, 9999)
            m = rng.randint(1, 12)
            d = rng.randint(1, mlen[m - 1])
            vals.append(
                f"{y:04d}-{m:02d}-{d:02d} "
                f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:"
                f"{rng.randint(0, 59):02d}"
            )
        # domain edges ride along with the random sample
        vals += ["0001-01-01 00:00:00", f"9999-12-{mlen[11]:02d} 23:59:59"]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        back = df.select(
            "t",
            decode_calendar_datetime(
                encode_calendar_datetime(F.col("t"), cal), cal
            ).alias("b"),
        ).collect()
        for r in back:
            assert r["b"] == r["t"], (cal, r["t"], r["b"])


def test_decode_negative_offset_is_null(spark):
    """Offsets before year 1 are outside the encodable domain: decode
    returns NULL instead of a sign-garbled string (Spark % follows the
    dividend's sign)."""
    df = spark.createDataFrame([(-1,), (-86400,), (0,), (86400,)], "off long")
    got = [
        r["d"]
        for r in df.select(
            decode_calendar_datetime(F.col("off"), "noleap").alias("d")
        ).orderBy("off").collect()
    ]
    assert got[0] is None and got[1] is None
    assert got[2] == "0001-01-01 00:00:00"
    assert got[3] == "0001-01-02 00:00:00"


def test_encode_rejects_malformed_and_out_of_range(spark):
    """Anchored validity + field-range checks (r9 review): trailing garbage
    and out-of-range fields yield NULL instead of ANSI cast errors or
    silently clamped encodings."""
    from dask_groupby_spark.calendar import (
        decode_calendar_datetime,
        encode_calendar_datetime,
    )

    df = spark.createDataFrame(
        [
            ("2000-01-01junk",),
            ("2000-13-05",),
            ("2000-02-29",),          # noleap: February has 28 days
            ("2000-01-01 23:59:60",), # ss out of range
            ("2000-01-02",),
            ("2000-01-02T03:04:05Z",),
        ],
        "s string",
    )
    got = [
        r["e"]
        for r in df.select(
            encode_calendar_datetime(F.col("s"), "noleap").alias("e")
        ).collect()
    ]
    assert got[0] is None and got[1] is None and got[2] is None and got[3] is None
    assert got[4] == 1999 * 365 * 86400 + 86400
    assert got[5] == got[4] + 3 * 3600 + 4 * 60 + 5
    # decode: year > 9999 is outside the 4-digit format domain -> NULL
    big = spark.createDataFrame(
        [(10000 * 365 * 86400,), (0,)], "o bigint"
    ).select(decode_calendar_datetime(F.col("o"), "noleap").alias("d"))
    vals = [r["d"] for r in big.collect()]
    assert vals[0] is None and vals[1] == "0001-01-01 00:00:00"
