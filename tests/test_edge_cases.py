"""Degenerate inputs: empty tables, all-missing labels, single rows.

Mirrors the reference's empty-bin / all-NaN-block edge tests
(flox/tests/test_core.py:823,1191)."""

import math

from pyspark.sql import functions as F

from dask_groupby_spark import Bins, groupby_reduce, groupby_scan

NAN = float("nan")


def _empty(spark):
    return spark.createDataFrame([], "label bigint, idx bigint, val double")


def test_empty_input_reduce(spark):
    out = groupby_reduce(_empty(spark), "label", func="nansum", value="val")
    assert out.collect() == []


def test_empty_input_with_expected_groups(spark):
    out = groupby_reduce(
        _empty(spark), "label", func="nansum", value="val",
        expected_groups=[0, 1], fill_value=0.0,
    ).collect()
    assert {r["label"]: r["nansum"] for r in out} == {0: 0.0, 1: 0.0}


def test_empty_input_scan(spark):
    out = groupby_scan(_empty(spark), "label", func="nancumsum", value="val", idx_col="idx")
    assert out.collect() == []


def test_all_labels_missing(spark):
    df = spark.createDataFrame(
        [(None, 1, 1.0), (None, 2, 2.0)], "label bigint, idx bigint, val double"
    )
    assert groupby_reduce(df, "label", func="count", value="val").collect() == []
    # with expected_groups the domain still materializes, filled
    out = groupby_reduce(
        df, "label", func="count", value="val", expected_groups=[5]
    ).collect()
    assert [(r["label"], r["count"]) for r in out] == [(5, 0)]


def test_single_row(spark):
    df = spark.createDataFrame([(1, 1, 3.0)], "label bigint, idx bigint, val double")
    for func, exp in [("nansum", 3.0), ("nanmean", 3.0), ("nanvar", None), ("count", 1)]:
        got = groupby_reduce(df, "label", func=func, value="val",
                             finalize_kwargs={"ddof": 1} if func == "nanvar" else None
                             ).collect()[0][func]
        if exp is None:
            assert got is None or math.isnan(got)  # ddof=1 var of 1 element
        else:
            assert got == exp


def test_empty_bins(spark):
    # values all out of bin range → every bin empty but present (ref
    # test_core.py:1191 test_empty_bins)
    df = spark.createDataFrame([(100.0, 1.0)], "x double, val double")
    out = groupby_reduce(
        df, "x", func="nansum", value="val",
        expected_groups=Bins([0.0, 1.0, 2.0]), fill_value=0.0,
    ).collect()
    assert {r["x_bin"]: r["nansum"] for r in out} == {0: 0.0, 1: 0.0}


def test_two_binned_groupers(spark):
    """BOTH groupers binned simultaneously (ref: flox test_core.py:1337
    test_multiple_groupers_bins): pairs (i, i) over breaks [2..7] land on
    the diagonal of the 5x5 bin grid; out-of-bounds pairs drop; the dense
    grid fills the rest with 0."""
    from dask_groupby_spark import Bins, groupby_reduce

    rows = [(float(i), float(i), 1) for i in range(10)]
    df = spark.createDataFrame(rows, "b1 double, b2 double, val bigint")
    breaks = [2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    out = groupby_reduce(
        df, "b1", "b2", func="count", value="val",
        expected_groups=(Bins(breaks), Bins(breaks)), fill_value=0,
    )
    got = {(r["b1_bin"], r["b2_bin"]): r["count"] for r in out.collect()}
    assert len(got) == 25  # full 5x5 grid
    for i in range(5):
        for j in range(5):
            assert got[(i, j)] == (1 if i == j else 0), (i, j)


def test_minhash_signatures_edge_semantics(spark):
    """Pins the r12 explode+agg plan's documented edge behavior: documents
    with fewer than shingle_k tokens (or empty / NULL text) are OMITTED,
    and two input rows sharing an id merge into ONE signature equal to the
    min over the union of their shingles (ids are documented as unique per
    row; this pins what happens when the contract is violated so a future
    plan change can't silently alter it)."""
    from dask_groupby_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "too short"),          # 2 tokens < k=3 -> omitted
            (3, ""),                   # empty -> omitted
            (4, None),                 # NULL -> omitted
            (5, "alpha beta gamma"),
            (5, "beta gamma delta"),   # duplicate id -> merged signature
        ],
        "doc_id bigint, text string",
    )
    sig = {r["id"]: [r[f"mh_{i}"] for i in range(8)]
           for r in minhash_signatures(df).collect()}
    assert set(sig) == {1, 5}

    union_doc = spark.createDataFrame(
        [(5, "alpha beta gamma"), (6, "beta gamma delta")],
        "doc_id bigint, text string",
    )
    per_row = {r["id"]: [r[f"mh_{i}"] for i in range(8)]
               for r in minhash_signatures(union_doc).collect()}
    expect = [min(a, b) for a, b in zip(per_row[5], per_row[6])]
    assert sig[5] == expect
