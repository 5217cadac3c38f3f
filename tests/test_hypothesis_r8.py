"""r8 hypothesis parity sweep: randomized inputs for the event-analytics
and ML-prep family — funnel vs a brute-force per-entity oracle, retention
vs a python cohort fold, target_encode vs the closed-form LOO arithmetic,
and the KMV merge==sketch-of-union property.  One collect per example."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def event_streams(draw):
    n = draw(st.integers(10, 120))
    types = ["s1", "s2", "s3", "x"]
    rows = [
        (
            draw(st.integers(0, 12)),
            draw(st.sampled_from(types)),
            float(draw(st.integers(0, 500))) + draw(st.sampled_from([0.0, 0.5])),
        )
        for _ in range(n)
    ]
    k = draw(st.integers(1, 3))
    within = draw(st.one_of(st.none(), st.integers(1, 300).map(float)))
    return rows, ["s1", "s2", "s3"][:k], within


def _brute_funnel(rows, steps, within):
    by = {}
    for u, ty, ts in rows:
        by.setdefault(u, []).append((ty, ts))
    out = {}
    for u, evs in by.items():
        times, prev = [], None
        for k, s in enumerate(steps):
            c = [
                t
                for ty, t in evs
                if ty == s
                and (prev is None if k == 0 else t > prev)
                and (k == 0 or within is None or t <= times[0] + within)
            ]
            t = min(c) if c else None
            times.append(t)
            if t is None:
                break
            prev = t
        if times[0] is not None:
            out[u] = tuple(times + [None] * (len(steps) - len(times)))
    return out


@given(event_streams())
@settings(**_SETTINGS)
def test_funnel_matches_bruteforce_hypothesis(spark, case):
    from dask_groupby_spark.operators import funnel

    rows, steps, within = case
    df = spark.createDataFrame(rows, "u bigint, ty string, ts double")
    got = {
        r["u"]: tuple(r[f"t{i + 1}"] for i in range(len(steps)))
        for r in funnel(
            df, steps, entity_col="u", type_col="ty", ts_col="ts", within=within
        ).collect()
    }
    assert got == _brute_funnel(rows, steps, within)


@st.composite
def retention_streams(draw):
    n = draw(st.integers(5, 150))
    rows = [
        (draw(st.integers(0, 15)), float(draw(st.integers(0, 40_000))))
        for _ in range(n)
    ]
    period = draw(st.sampled_from([100, 1000, 7000]))
    horizon = draw(st.integers(0, 30))
    return rows, period, horizon


@given(retention_streams())
@settings(**_SETTINGS)
def test_retention_matches_bruteforce_hypothesis(spark, case):
    from dask_groupby_spark.operators import retention

    rows, period, horizon = case
    df = spark.createDataFrame(rows, "u bigint, ts double")
    got = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention(
            df, entity_col="u", ts_col="ts", period=period, horizon=horizon
        ).collect()
    }
    periods = {}
    for u, ts in rows:
        periods.setdefault(u, set()).add(math.floor(ts / period))
    exp = {}
    for ps in periods.values():
        c = min(ps)
        for p in ps:
            if p - c <= horizon:
                exp[(c, p - c)] = exp.get((c, p - c), 0) + 1
    assert got == exp


@st.composite
def te_tables(draw):
    n = draw(st.integers(3, 80))
    rows = [
        (
            i,
            draw(st.sampled_from("abcd")),
            draw(st.one_of(st.none(), st.integers(0, 50).map(float))),
        )
        for i in range(n)
    ]
    m = draw(st.sampled_from([0.5, 2.0, 10.0]))
    return rows, m


@given(te_tables())
@settings(**_SETTINGS)
def test_target_encode_matches_closed_form_hypothesis(spark, case):
    from dask_groupby_spark.operators import target_encode

    rows, m = case
    valid = [(c, y) for _, c, y in rows if y is not None]
    if not valid:
        return  # no prior derivable; operator raises (covered in unit tests)
    df = spark.createDataFrame(rows, "i bigint, c string, y double")
    got = {
        r["i"]: r["te"]
        for r in target_encode(df, "c", label="y", smoothing=m).collect()
    }
    prior = sum(y for _, y in valid) / len(valid)
    st_ = {}
    for c, y in valid:
        n0, s0 = st_.get(c, (0, 0.0))
        st_[c] = (n0 + 1, s0 + y)
    for i, c, y in rows:
        n0, s0 = st_.get(c, (0, 0.0))
        if y is None:
            want = (s0 + m * prior) / (n0 + m)
        else:
            want = (s0 - y + m * prior) / (n0 - 1 + m)
        assert got[i] is not None
        assert abs(got[i] - want) <= 1e-9 * max(1.0, abs(want)), (i, c, y)


@st.composite
def kmv_corpora(draw):
    a = draw(st.sets(st.integers(0, 3000), min_size=1, max_size=400))
    b = draw(st.sets(st.integers(0, 3000), min_size=1, max_size=400))
    k = draw(st.sampled_from([4, 32, 256]))
    parts = draw(st.integers(1, 6))
    return sorted(a), sorted(b), k, parts


@given(kmv_corpora())
@settings(**_SETTINGS)
def test_kmv_merge_equals_union_sketch_hypothesis(spark, case):
    from dask_groupby_spark.operators import kmv_merge, kmv_sketch_table

    a, b, k, parts = case
    d1 = spark.createDataFrame([("g", v) for v in a], "g string, v bigint")
    d2 = spark.createDataFrame([("g", v) for v in b], "g string, v bigint")
    both = kmv_sketch_table(
        d1.unionAll(d2).repartition(parts), "g", value="v", k=k
    ).collect()[0]["kmv"]
    merged = kmv_merge(
        kmv_sketch_table(d1, "g", value="v", k=k).unionByName(
            kmv_sketch_table(d2, "g", value="v", k=k)
        ),
        "g",
        k=k,
    ).collect()[0]["kmv"]
    assert merged == both
    assert len(both) == min(k, len(set(a) | set(b)))
