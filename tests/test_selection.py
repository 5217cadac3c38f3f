"""Row-selection operators: grouped_topk, sessionize, sample_per_group."""

import datetime as dt

from dask_groupby_spark.operators.selection import (
    grouped_topk,
    sample_per_group,
    sessionize,
)


def test_grouped_topk(spark):
    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
            ("b", 5, 1.0)]
    df = spark.createDataFrame(rows, "k string, id bigint, v double")
    out = grouped_topk(df, "k", order_col="v", k=2, tiebreak="id").collect()
    got = {(r["k"], r["rank"]): r["id"] for r in out}
    # tie at v=30 broken by smaller id
    assert got == {("a", 1): 2, ("a", 2): 4, ("b", 1): 5}


def test_grouped_topk_skew_salt_identical(spark):
    rows = [("a", i, float(i % 17)) for i in range(200)] + [("b", 1000, 5.0)]
    df = spark.createDataFrame(rows, "k string, id bigint, v double")
    plain = {(r["k"], r["rank"], r["id"])
             for r in grouped_topk(df, "k", order_col="v", k=5, tiebreak="id").collect()}
    salted = {(r["k"], r["rank"], r["id"])
              for r in grouped_topk(df, "k", order_col="v", k=5, tiebreak="id",
                                    skew_salt=8).collect()}
    assert plain == salted


def test_grouped_topk_skew_salt_requires_tiebreak(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, id bigint, v double")
    with pytest.raises(ValueError, match="tiebreak"):
        grouped_topk(df, "k", order_col="v", k=1, skew_salt=4)


def test_sample_per_group_skew_salt_identical(spark):
    rows = [(i % 2, i) for i in range(300)]
    df = spark.createDataFrame(rows, "grp bigint, id bigint")
    plain = {(r["grp"], r["id"]) for r in
             sample_per_group(df, "grp", n=7, id_col="id", seed="s").collect()}
    salted = {(r["grp"], r["id"]) for r in
              sample_per_group(df, "grp", n=7, id_col="id", seed="s",
                               skew_salt=6).collect()}
    assert plain == salted


def test_sessionize(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(hours=3)),     # > 1h gap → new session
        (1, base + dt.timedelta(hours=3, minutes=5)),
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    out = sessionize(df, "user", ts_col="ts", gap=3600.0).collect()
    sess = {(r["user"], r["ts"].isoformat()): r["session_id"] for r in out}
    assert sess[(1, "2024-01-01T00:00:00")] == 0
    assert sess[(1, "2024-01-01T00:10:00")] == 0
    assert sess[(1, "2024-01-01T03:00:00")] == 1
    assert sess[(1, "2024-01-01T03:05:00")] == 1
    assert sess[(2, "2024-01-01T00:00:00")] == 0


def test_sample_per_group_deterministic(spark):
    rows = [(i % 3, i) for i in range(60)]
    df = spark.createDataFrame(rows, "grp bigint, id bigint")
    s1 = {(r["grp"], r["id"]) for r in
          sample_per_group(df, "grp", n=4, id_col="id", seed="s").collect()}
    s2 = {(r["grp"], r["id"]) for r in
          sample_per_group(df.repartition(7), "grp", n=4, id_col="id", seed="s").collect()}
    assert s1 == s2  # invariant under partitioning
    assert len(s1) == 12  # 4 per group × 3 groups
    s3 = {(r["grp"], r["id"]) for r in
          sample_per_group(df, "grp", n=4, id_col="id", seed="other").collect()}
    assert s1 != s3  # seed changes the sample


def test_weighted_sample_matches_python_reference(spark):
    """weight_col sampling (Efraimidis-Spirakis keys) vs an exact Python
    recomputation of the same portable-hash keys — fully deterministic."""
    import hashlib
    import math

    from dask_groupby_spark.operators.selection import sample_per_group

    rows = []
    for g in range(3):
        for i in range(40):
            doc = g * 100 + i
            rows.append((g, doc, 0.5 + (doc % 7)))
    # some bad weights → excluded
    rows += [(0, 900, None), (1, 901, -3.0), (2, 902, float("nan"))]
    df = spark.createDataFrame(rows, "g bigint, doc bigint, w double")

    out = sample_per_group(
        df, "g", n=5, id_col="doc", seed="ws", hasher="portable", weight_col="w"
    )
    got = {g: sorted(r["doc"] for r in rws) for g, rws in
           __import__("itertools").groupby(
               sorted(out.collect(), key=lambda r: r["g"]), key=lambda r: r["g"])}

    def phash(x):
        return int(hashlib.md5(f"ws:{x}".encode()).hexdigest()[:15], 16)

    M = 1 << 53
    expect = {}
    for g in range(3):
        keyed = []
        for gg, doc, w in rows:
            if gg != g or w is None or not (w > 0) or math.isnan(w):
                continue
            u = (phash(doc) % M + 1.0) / (M + 1.0)
            keyed.append((-math.log(u) / w, doc))
        keyed.sort()
        expect[g] = sorted(doc for _, doc in keyed[:5])
    assert got == expect
    # salted plan returns the identical set
    salted = sample_per_group(
        df, "g", n=5, id_col="doc", seed="ws", hasher="portable",
        weight_col="w", skew_salt=4,
    )
    got_salted = {g: sorted(r["doc"] for r in rws) for g, rws in
                  __import__("itertools").groupby(
                      sorted(salted.collect(), key=lambda r: r["g"]),
                      key=lambda r: r["g"])}
    assert got_salted == expect
