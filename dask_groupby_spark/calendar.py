"""Non-standard-calendar datetimes (cftime parity, Spark-first).

The reference accepts cftime / object-dtype datetime arrays — climate-model
time axes on ``noleap``/``360_day``/``all_leap`` calendars — by viewing them
as numeric offsets and restoring afterwards (``datetime_to_numeric``,
flox/xrutils.py:189-247, used at flox/core.py:2507,2518-2520).  Spark has no
cftime object type: a non-standard-calendar axis arrives as an ISO-ish
STRING column (the common parquet encoding for cftime coordinates, since
proleptic-Gregorian TIMESTAMP cannot represent e.g. Feb 30 of a 360-day
calendar).

This module is the Spark-native equivalent: a pair of pure Catalyst column
expressions converting calendar datetime strings to exact integer epoch
offsets and back.  No cftime dependency, no UDF — the calendars below have
CLOSED-FORM day arithmetic (fixed-length years, no leap rules except
all-leap), so the conversion is regexp + integer math, map-side, fully
codegen-friendly, and bit-exact in both directions.

Usage: ``encode_calendar_datetime`` → a BIGINT seconds-since-0001-01-01
column any reduction/scan can consume (mean, min/max, resample arithmetic);
``decode_calendar_datetime`` restores the string form — mirroring the
reference's view-as-int64 + restore-dtype round trip.

The ``standard``/``proleptic_gregorian`` calendar is intentionally NOT here:
that is a plain TIMESTAMP — use :func:`~dask_groupby_spark.dtypes.
time_to_seconds` / ``load_table`` normalization instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# days in each year for the fixed-length calendars (cftime names + aliases)
_YEAR_DAYS = {
    "noleap": 365,
    "365_day": 365,
    "all_leap": 366,
    "366_day": 366,
    "360_day": 360,
}

# cumulative days before each month, noleap (=365_day) and all_leap (=366_day)
_CUM_365 = (0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
_CUM_366 = (0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335)

# anchored at BOTH ends (r9 review: an unanchored tail let
# '2000-01-01junk' through to the ANSI bigint casts, killing the job
# instead of yielding NULL); optional fraction + Z tolerated like the
# split pattern always did
# a trailing UTC-offset annotation (+HH:MM / -HH:MM / Z) is ACCEPTED and
# IGNORED — cftime-style calendar datetimes are naive, and the split
# pattern below has always tokenized past the offset (r9 meta-review:
# the first anchored form NULLed offset-suffixed rows the unanchored
# original encoded)
_TS_RE = (
    r"^(\d{1,4})-(\d{1,2})-(\d{1,2})"
    r"([ Tt](\d{1,2}):(\d{1,2}):(\d{1,2})(\.\d+)?"
    r"(Z|z| ?[+-]\d{1,2}:?\d{2})?)?$"
)


def _check_calendar(calendar: str) -> str:
    cal = calendar.lower()
    if cal not in _YEAR_DAYS:
        raise ValueError(
            f"unknown calendar {calendar!r}; supported: {sorted(_YEAR_DAYS)} "
            "(for 'standard'/proleptic use a TIMESTAMP column and "
            "dtypes.time_to_seconds)"
        )
    return cal


def encode_calendar_datetime(
    col: Column,
    calendar: str = "noleap",
    unit: str = "second",
) -> Column:
    """Seconds (or days) since 0001-01-01 00:00:00 of ``calendar``, as
    BIGINT — NULL for malformed strings.

    Accepts ``"YYYY-M-D"`` / ``"YYYY-M-D HH:MM:SS"`` / ``"...T..."`` string
    datetimes.  Exact integer arithmetic (a bigint holds ±292e9 years of
    seconds), so encode∘decode is the identity — the same guarantee the
    reference gets from its int64 view (flox/core.py:2506-2520).
    """
    cal = _check_calendar(calendar)
    if unit not in ("second", "day"):
        raise ValueError("unit must be 'second' or 'day'")
    s = F.trim(col.cast("string"))
    # Hot-path discipline (this runs per row of a 100 TB time axis): ONE
    # validity regex + ONE split, then every field reference goes through a
    # higher-order-function lambda variable — the bound array is evaluated
    # exactly once per row, where naive repeated `split(...)[i]` subtrees
    # would re-split for every field and every month-CASE branch (measured
    # 20×).  Month day-offsets come from an array literal lookup, not an
    # 11-branch CASE.  CASE-WHEN laziness keeps the ANSI casts off
    # malformed rows; F.get is NULL- (not error-) on short arrays.
    valid = s.rlike(_TS_RE)
    parts = F.split(F.translate(s, "Tt", "  "), r"[-: .+Zz]+")
    if cal == "360_day":
        cum = [(m - 1) * 30 for m in range(1, 13)]
    else:
        cum = list(_CUM_365 if cal in ("noleap", "365_day") else _CUM_366)
    cum_arr = F.array(*[F.lit(c) for c in cum])

    mlen = [cum[m] - cum[m - 1] for m in range(1, 12)] + [
        _YEAR_DAYS[cal] - cum[11]
    ]
    mlen_arr = F.array(*[F.lit(n) for n in mlen])

    def _build(p: Column) -> Column:
        year = F.get(p, 0).cast("bigint")
        month = F.get(p, 1).cast("bigint")
        day = F.get(p, 2).cast("bigint")
        hh = F.coalesce(F.get(p, 3), F.lit("0")).cast("bigint")
        mm = F.coalesce(F.get(p, 4), F.lit("0")).cast("bigint")
        ss = F.coalesce(F.get(p, 5), F.lit("0")).cast("bigint")
        midx = F.greatest(F.least(month, F.lit(12)), F.lit(1)) - 1
        # field-RANGE validity (r9 review: '2000-13-05' used to clamp into
        # December and encode garbage instead of NULL)
        ok = (
            month.between(1, 12)
            & day.between(1, F.get(mlen_arr, midx.cast("int")))
            & hh.between(0, 23)
            & mm.between(0, 59)
            & ss.between(0, 59)
        )
        days = (
            (year - 1) * F.lit(_YEAR_DAYS[cal])
            + F.get(cum_arr, midx.cast("int"))
            + (day - 1)
        )
        val = days if unit == "day" else (
            days * F.lit(86400) + hh * F.lit(3600) + mm * F.lit(60) + ss
        )
        return F.struct(ok.alias("ok"), val.alias("val"))

    built = F.get(F.transform(F.array(parts), _build), 0)
    return F.when(valid & built["ok"], built["val"])


def decode_calendar_datetime(
    col: Column,
    calendar: str = "noleap",
    unit: str = "second",
) -> Column:
    """Inverse of :func:`encode_calendar_datetime`: BIGINT offset →
    ``"YYYY-MM-DD HH:MM:SS"`` string in ``calendar``.

    Negative offsets (dates before year 1 — outside the encodable domain,
    since :func:`encode_calendar_datetime` never produces them) decode to
    NULL rather than a garbage string: Spark's ``%`` follows the dividend's
    sign, so the day-of-year arithmetic is only valid for ``col >= 0``.
    """
    cal = _check_calendar(calendar)
    if unit not in ("second", "day"):
        raise ValueError("unit must be 'second' or 'day'")
    ydays = _YEAR_DAYS[cal]
    secs = col.cast("bigint") * F.lit(86400 if unit == "day" else 1)
    days = F.floor(secs / F.lit(86400)).cast("bigint")
    rem = (secs - days * F.lit(86400)).cast("bigint")
    year = F.floor(days / F.lit(ydays)).cast("bigint") + F.lit(1)
    doy = (days % F.lit(ydays)).cast("bigint")  # 0-based day of year
    if cal == "360_day":
        month = F.floor(doy / F.lit(30)).cast("bigint") + F.lit(1)
        dom = (doy % F.lit(30)).cast("bigint") + F.lit(1)
    else:
        cum = _CUM_365 if cal in ("noleap", "365_day") else _CUM_366
        month = F.lit(12)
        dom = doy - F.lit(cum[11]) + F.lit(1)
        for m in range(11, 0, -1):
            in_m = doy < F.lit(cum[m])
            month = F.when(in_m, F.lit(m)).otherwise(month)
            dom = F.when(in_m, doy - F.lit(cum[m - 1]) + F.lit(1)).otherwise(dom)
    hh = F.floor(rem / F.lit(3600)).cast("bigint")
    mm = F.floor((rem % F.lit(3600)) / F.lit(60)).cast("bigint")
    ss = (rem % F.lit(60)).cast("bigint")
    formatted = F.concat(
        F.lpad(year.cast("string"), 4, "0"), F.lit("-"),
        F.lpad(month.cast("string"), 2, "0"), F.lit("-"),
        F.lpad(dom.cast("string"), 2, "0"), F.lit(" "),
        F.lpad(hh.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(mm.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(ss.cast("string"), 2, "0"),
    )
    # year > 9999: lpad TRUNCATES overlong strings, so a 5-digit year would
    # silently decode 9000 years off (r9 review) — outside the 4-digit
    # formatting domain, decode to NULL like the negative side
    return F.when((secs >= 0) & (year <= 9999), formatted)
