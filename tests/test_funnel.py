"""Funnel operator: brute-force per-entity oracle + strict-order edge cases."""

import random

import pytest
from pyspark.sql import functions as F

from dask_groupby_spark.operators.funnel import funnel, funnel_conversion

STEPS = ["view", "click", "purchase"]
TYPES = STEPS + ["error", "signup"]


def _brute_funnel(rows, steps, within=None):
    """rows: (user, type, ts). Returns {user: [t1..tK or None]}."""
    by_user = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((ty, ts))
    out = {}
    for u, evs in by_user.items():
        times = []
        prev = None
        for k, step in enumerate(steps):
            cand = [
                ts
                for ty, ts in evs
                if ty == step
                and (prev is None if k == 0 else ts > prev)
                and (k == 0 or within is None or ts <= times[0] + within)
            ]
            t = min(cand) if cand else None
            times.append(t)
            if t is None:
                break
            prev = t
        if times[0] is not None:
            out[u] = times + [None] * (len(steps) - len(times))
    return out


@pytest.fixture(scope="module")
def event_rows():
    rng = random.Random(80801)
    rows = []
    for i in range(600):
        rows.append(
            (
                rng.randrange(40),
                rng.choice(TYPES),
                float(rng.randrange(10_000)),
            )
        )
    return rows


def test_funnel_matches_bruteforce(spark, event_rows):
    df = spark.createDataFrame(
        event_rows, "user_id bigint, event_type string, ts double"
    )
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel(
            df, STEPS, entity_col="user_id", type_col="event_type", ts_col="ts"
        ).collect()
    }
    assert got == _brute_funnel(event_rows, STEPS)


def test_funnel_conversion_counts(spark, event_rows):
    df = spark.createDataFrame(
        event_rows, "user_id bigint, event_type string, ts double"
    )
    exp = _brute_funnel(event_rows, STEPS)
    n = [
        sum(1 for ts in exp.values() if ts[k] is not None)
        for k in range(len(STEPS))
    ]
    rows = funnel_conversion(
        df, STEPS, entity_col="user_id", type_col="event_type", ts_col="ts"
    ).collect()
    got = {r["step_idx"]: (r["step"], r["n_entities"], r["conversion"]) for r in rows}
    assert len(rows) == 3
    for k in range(3):
        step, cnt, conv = got[k + 1]
        assert step == STEPS[k]
        assert cnt == n[k]
        assert conv == pytest.approx(n[k] / n[0]) if n[0] else conv is None


def test_conversion_window_matches_bruteforce(spark, event_rows):
    df = spark.createDataFrame(
        event_rows, "user_id bigint, event_type string, ts double"
    )
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel(
            df,
            STEPS,
            entity_col="user_id",
            type_col="event_type",
            ts_col="ts",
            within=1500.0,
        ).collect()
    }
    exp = _brute_funnel(event_rows, STEPS, within=1500.0)
    assert got == exp
    # the window must actually bite on this data
    unwindowed = _brute_funnel(event_rows, STEPS)
    assert sum(t[2] is not None for t in exp.values()) < sum(
        t[2] is not None for t in unwindowed.values()
    )


def test_conversion_window_boundary_inclusive(spark):
    rows = [
        (1, "view", 0.0),
        (1, "click", 10.0),   # exactly t1 + within -> counts
        (2, "view", 0.0),
        (2, "click", 10.5),   # past the window -> does not count
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts double")
    got = {
        r["user_id"]: r["t2"]
        for r in funnel(
            df, ["view", "click"], entity_col="user_id", type_col="event_type",
            ts_col="ts", within=10.0,
        ).collect()
    }
    assert got == {1: 10.0, 2: None}
    with pytest.raises(ValueError):
        funnel(df, ["view"], entity_col="user_id", type_col="event_type",
               ts_col="ts", within=0.0)


def test_strict_order_same_timestamp_not_counted(spark):
    # click at the SAME instant as view must NOT advance the funnel
    rows = [
        (1, "view", 5.0),
        (1, "click", 5.0),
        (2, "view", 5.0),
        (2, "click", 6.0),
        # user 3: click BEFORE view — not a conversion
        (3, "click", 1.0),
        (3, "view", 2.0),
        # user 4: never viewed — not in the funnel at all
        (4, "click", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts double")
    got = {
        r["user_id"]: (r["t1"], r["t2"])
        for r in funnel(
            df, ["view", "click"], entity_col="user_id", type_col="event_type", ts_col="ts"
        ).collect()
    }
    assert got == {1: (5.0, None), 2: (5.0, 6.0), 3: (2.0, None)}


def test_earliest_qualifying_step_time_used(spark):
    # t2 is the EARLIEST click after t1, not just any; and t3 must be
    # after that earliest t2, not after a later click
    rows = [
        (1, "view", 1.0),
        (1, "click", 3.0),
        (1, "click", 8.0),
        (1, "purchase", 5.0),  # after t2=3 -> counts
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts double")
    r = funnel(
        df, STEPS, entity_col="user_id", type_col="event_type", ts_col="ts"
    ).collect()[0]
    assert (r["t1"], r["t2"], r["t3"]) == (1.0, 3.0, 5.0)


def test_segment_from_step1_event(spark):
    rows = [
        (1, "view", 2.0, "mobile"),
        (1, "view", 1.0, "web"),  # earliest view wins the segment
        (1, "click", 3.0, "mobile"),
        (2, "view", 1.0, "mobile"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts double, device string"
    )
    got = {
        (r["segment"], r["step_idx"]): r["n_entities"]
        for r in funnel_conversion(
            df,
            ["view", "click"],
            entity_col="user_id",
            type_col="event_type",
            ts_col="ts",
            segment_col="device",
        ).collect()
    }
    assert got == {("web", 1): 1, ("web", 2): 1, ("mobile", 1): 1, ("mobile", 2): 0}


def test_timestamp_column_types(spark):
    # real TIMESTAMP column goes through time_to_seconds
    df = spark.createDataFrame(
        [(1, "view", "2024-01-01 00:00:00"), (1, "click", "2024-01-01 00:00:01")],
        "user_id bigint, event_type string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    r = funnel(
        df, ["view", "click"], entity_col="user_id", type_col="event_type", ts_col="ts"
    ).collect()[0]
    assert r["t2"] - r["t1"] == pytest.approx(1.0)


def _brute_retention(rows, period_s, horizon):
    """rows: (user, ts). Returns {(cohort, offset): n_active}."""
    periods = {}
    for u, ts in rows:
        periods.setdefault(u, set()).add(int(ts // period_s))
    out = {}
    for u, ps in periods.items():
        c = min(ps)
        for p in ps:
            if p - c <= horizon:
                out[(c, p - c)] = out.get((c, p - c), 0) + 1
    return out


def test_retention_matches_bruteforce(spark):
    from dask_groupby_spark.operators import retention

    rng = random.Random(80807)
    rows = [
        (rng.randrange(60), float(rng.randrange(0, 40 * 86_400)))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts double")
    exp = _brute_retention(rows, 7 * 86_400, horizon=3)
    got = {}
    sizes = {}
    for r in retention(
        df, entity_col="user_id", ts_col="ts", period="week", horizon=3
    ).collect():
        got[(r["cohort"], r["offset"])] = r["n_active"]
        sizes.setdefault(r["cohort"], {})[r["offset"]] = r["retention"]
    assert got == exp
    # retention = n_active / cohort size; offset 0 is always 1.0
    for c, offs in sizes.items():
        assert offs[0] == 1.0
        for o, rate in offs.items():
            assert rate == pytest.approx(exp[(c, o)] / exp[(c, 0)])


def test_retention_period_forms_and_validation(spark):
    from dask_groupby_spark.operators import retention

    rows = [(1, 0.0), (1, 86_400.0 * 2), (2, 0.0)]
    df = spark.createDataFrame(rows, "user_id bigint, ts double")
    by_day = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention(
            df, entity_col="user_id", ts_col="ts", period="day", horizon=12
        ).collect()
    }
    assert by_day == {(0, 0): 2, (0, 2): 1}
    # explicit seconds == named period
    by_sec = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention(
            df, entity_col="user_id", ts_col="ts", period=86_400, horizon=12
        ).collect()
    }
    assert by_sec == by_day
    # horizon filter drops late offsets
    h1 = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention(
            df, entity_col="user_id", ts_col="ts", period="day", horizon=1
        ).collect()
    }
    assert h1 == {(0, 0): 2}
    with pytest.raises(ValueError):
        retention(df, entity_col="user_id", ts_col="ts", period="fortnight")
    with pytest.raises(ValueError):
        retention(df, entity_col="user_id", ts_col="ts", period=0)
    with pytest.raises(ValueError):
        retention(df, entity_col="user_id", ts_col="ts", horizon=-1)


def test_funnel_timing_matches_bruteforce(spark, event_rows):
    import statistics

    from dask_groupby_spark.operators import funnel_timing

    df = spark.createDataFrame(
        event_rows, "user_id bigint, event_type string, ts double"
    )
    exp = _brute_funnel(event_rows, STEPS)
    rows = funnel_timing(
        df, STEPS, entity_col="user_id", type_col="event_type", ts_col="ts"
    ).collect()
    got = {r["step_idx"]: r for r in rows}
    assert set(got) == {2, 3}
    for k in (2, 3):
        gaps = [
            t[k - 1] - t[k - 2] for t in exp.values() if t[k - 1] is not None
        ]
        r = got[k]
        assert r["step"] == STEPS[k - 1]
        assert r["n"] == len(gaps)
        assert r["mean_gap_s"] == pytest.approx(sum(gaps) / len(gaps))
        assert r["median_gap_s"] == pytest.approx(statistics.median(gaps))
    with pytest.raises(ValueError):
        funnel_timing(df, ["view"], entity_col="user_id",
                      type_col="event_type", ts_col="ts")


def test_single_step_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "view", 1.0)], "user_id bigint, event_type string, ts double"
    )
    assert funnel(
        df, ["view"], entity_col="user_id", type_col="event_type", ts_col="ts"
    ).count() == 1
    assert (
        funnel(
            df.where(F.lit(False)),
            ["view", "click"],
            entity_col="user_id",
            type_col="event_type",
            ts_col="ts",
        ).count()
        == 0
    )
    with pytest.raises(ValueError):
        funnel(df, [], entity_col="user_id", type_col="event_type", ts_col="ts")


def test_funnel_entity_col_collision_guard(spark):
    df = spark.createDataFrame([(1, "view", 1.0)], "t1 bigint, ty string, ts double")
    with pytest.raises(ValueError, match="collide"):
        funnel(df, ["view", "click"], entity_col="t1", type_col="ty", ts_col="ts")
