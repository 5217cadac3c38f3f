"""r9 hypothesis sweep for the audit-hardened semantics: calendar
encode∘decode identity over random valid datetimes (+ rejection of random
malformed strings), two-pass vs window parity under NULL group keys, and
encode_tokens row-count reconciliation with empty/NULL docs mixed in.
One collect per example."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_MLEN_NOLEAP = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


@st.composite
def valid_noleap_datetimes(draw):
    y = draw(st.integers(1, 9999))
    m = draw(st.integers(1, 12))
    d = draw(st.integers(1, _MLEN_NOLEAP[m - 1]))
    hh = draw(st.integers(0, 23))
    mm = draw(st.integers(0, 59))
    ss = draw(st.integers(0, 59))
    return f"{y:04d}-{m:02d}-{d:02d} {hh:02d}:{mm:02d}:{ss:02d}"


def test_calendar_encode_decode_identity(spark):
    """decode(encode(s)) == s for every valid noleap datetime — the exact
    integer-arithmetic identity the reference gets from its int64 view,
    over randomized dates (r9: the encode gained range validation and
    the decode a year-domain guard; neither may break the identity).
    r13 (suite-runtime): the hypothesis loop paid per-query planning of
    the deep calendar CASE tree once per example (~40 s for 12 tiny
    jobs); the same sampled row space — 240 seeded draws from the
    identical strategy — now rides ONE Spark job."""
    from dask_groupby_spark.calendar import (
        decode_calendar_datetime,
        encode_calendar_datetime,
    )

    import random

    rng = random.Random(0x9E)
    dts = []
    for _ in range(240):
        y = rng.randint(1, 9999)
        m = rng.randint(1, 12)
        d = rng.randint(1, _MLEN_NOLEAP[m - 1])
        dts.append(
            f"{y:04d}-{m:02d}-{d:02d} "
            f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:"
            f"{rng.randint(0, 59):02d}"
        )
    df = spark.createDataFrame([(s,) for s in dts], "s string")
    out = df.select(
        "s",
        decode_calendar_datetime(
            encode_calendar_datetime(F.col("s"), "noleap"), "noleap"
        ).alias("rt"),
    ).collect()
    for r in out:
        assert r["rt"] == r["s"], (r["s"], r["rt"])


@given(
    st.lists(
        st.text(
            alphabet="0123456789-: TZjunk",
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_calendar_encode_never_throws_on_garbage(spark, strs):
    """Arbitrary near-datetime garbage must yield NULL or a valid encoding,
    never an ANSI cast error (r9: unanchored regex let trailing garbage
    reach the bigint casts)."""
    from dask_groupby_spark.calendar import encode_calendar_datetime

    df = spark.createDataFrame([(s,) for s in strs], "s string")
    # success criterion: the job completes; values are bigint-or-NULL
    rows = df.select(
        encode_calendar_datetime(F.col("s"), "noleap").alias("e")
    ).collect()
    for r in rows:
        assert r["e"] is None or isinstance(r["e"], int)


@st.composite
def null_key_frames(draw):
    n = draw(st.integers(4, 40))
    keys = [None, "a", "b"]
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.sampled_from(keys)),
                i,
                float(draw(st.integers(-50, 50))),
            )
        )
    return rows


@given(null_key_frames(), st.sampled_from(["nancumsum", "ffill"]))
@settings(**_SETTINGS)
def test_two_pass_null_keys_match_window(spark, rows, func):
    """Window partitioning treats NULL keys as a real group — the two-pass
    tier must agree row-for-row on frames mixing NULL and real keys
    (r9: the null-intolerant stats joins stranded the NULL-key group)."""
    from dask_groupby_spark import groupby_scan

    df = spark.createDataFrame(rows, "k string, i bigint, v double")
    win = groupby_scan(
        df, "k", func=func, value="v", idx_col="i"
    ).orderBy("k", "i").collect()
    twp = groupby_scan(
        df, "k", func=func, value="v", idx_col="i",
        method="two_pass", rows_per_chunk=3,
    ).orderBy("k", "i").collect()

    def norm(rs):
        out = []
        for r in rs:
            d = r.asDict()
            for k, v in d.items():
                if isinstance(v, float) and math.isnan(v):
                    d[k] = "NaN"
            out.append(d)
        return out

    assert norm(win) == norm(twp)


@given(
    st.lists(
        st.sampled_from(["a b", "c", "", None, "a c c"]),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_encode_tokens_reconciles_rowcount(spark, texts):
    """encode_tokens output has EXACTLY one row per input document —
    empty/NULL docs survive as empty arrays (r9: they used to vanish)."""
    from dask_groupby_spark.operators.vocab import build_vocab, encode_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    vocab = build_vocab(df)
    enc = encode_tokens(df, vocab).collect()
    assert len(enc) == len(texts)
    got = {r["doc_id"]: r["token_ids"] for r in enc}
    for i, t in enumerate(texts):
        expected_n = len(t.split()) if t else 0
        assert len(got[i]) == expected_n, (t, got[i])
