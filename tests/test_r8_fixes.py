"""Regression tests for the round-8 ADVICE fixes.

Each test pins the exact failure scenario from ADVICE.md r7:
1. groupby_interpolate: NULL ordering-axis rows must not anchor (the (x, v)
   carries desynchronized and a later gap lerped mismatched endpoints).
2. cosine_topk_blas: neighbor_id's Arrow type must come from the CORPUS id
   column, query_id's from the queries frame (mixed-type id spaces with
   exclude_self=False).
3. duplicate_clusters driver tier: output id/cluster type = the COMMON
   wider type of id_a/id_b, matching the distributed tier.
4. bm25_scores: the persisted (id, dl) table must expose/release its handle
   on the early-return branches too.
5. pagerank oracle: round-5 rank compare — symmetric nodes tie exactly and
   the id tie-break orders them deterministically.
"""

import math

import pytest
from pyspark.sql import functions as F


def test_interpolate_null_axis_not_anchor(spark):
    """ADVICE scenario verbatim: (x=2,v=10),(x=NULL,v=20),(x=4,NULL),
    (x=6,v=30) — the gap at x=4 must lerp (2,10)..(6,30) -> 20.0, not pair
    v=20 with x=2 (the desync gave 25.0)."""
    from dask_groupby_spark.core import groupby_interpolate

    rows = [
        (1, 2.0, 10.0),
        (2, None, 20.0),
        (3, 4.0, None),
        (4, 6.0, 30.0),
    ]
    df = spark.createDataFrame(rows, "rid bigint, x double, v double")
    out = groupby_interpolate(
        df.withColumn("g", F.lit(1)), "g", value="v", order_by=["x", "rid"]
    )
    got = {r["rid"]: r["v"] for r in out.collect()}
    assert got[3] == pytest.approx(20.0)
    assert got[1] == 10.0 and got[4] == 30.0
    # the NULL-axis row keeps its own valid value untouched
    assert got[2] == 20.0


def test_interpolate_nan_axis_not_anchor(spark):
    """Same desync via a NaN (not NULL) float axis value."""
    from dask_groupby_spark.core import groupby_interpolate

    rows = [
        (1, 0.0, 0.0),
        (2, float("nan"), 99.0),
        (3, 10.0, None),
        (4, 20.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "rid bigint, x double, v double")
    out = groupby_interpolate(
        df.withColumn("g", F.lit(1)), "g", value="v", order_by=["x", "rid"]
    )
    got = {r["rid"]: r["v"] for r in out.collect()}
    # gap at x=10 lerps (0,0)..(20,40) -> 20, never touches the NaN-axis 99
    assert got[3] == pytest.approx(20.0)


def test_blas_topk_mixed_id_types(spark):
    """String query ids against bigint corpus ids (exclude_self=False):
    both output columns must carry their own side's type."""
    from dask_groupby_spark.operators.similarity import cosine_topk_blas

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("qa", [1.0, 0.0]), ("qb", [0.0, 2.0])],
        "vec_id string, embedding array<double>",
    )
    out = cosine_topk_blas(corpus, queries, k=2, exclude_self=False)
    types = dict(out.dtypes)
    assert types["query_id"] == "string"
    assert types["neighbor_id"] == "bigint"
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    # qa = [1,0]: best neighbor is corpus 1 (cos 1.0)
    assert by_q["qa"][0][0] == 1 and by_q["qa"][0][1] == pytest.approx(1.0)
    assert by_q["qb"][0][0] == 2 and by_q["qb"][0][1] == pytest.approx(1.0)


def test_duplicate_clusters_mixed_id_types(spark):
    """int id_a vs bigint id_b: driver tier must emit the wider type for
    BOTH columns (matching the distributed tier's union coercion)."""
    from dask_groupby_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 5_000_000_000), (2, 3)],
        "id_a int, id_b bigint",
    )
    out = duplicate_clusters(pairs, id_a="id_a", id_b="id_b")
    types = dict(out.dtypes)
    assert types["id"] == "bigint" and types["cluster_id"] == "bigint"
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got[5_000_000_000] == 1  # min-label root
    assert got[1] == 1 and got[2] == 2 and got[3] == 2
    # parity with the distributed tier on the same input
    dist = duplicate_clusters(pairs, id_a="id_a", id_b="id_b", max_driver_edges=0)
    dtypes = dict(dist.dtypes)
    assert dtypes["id"] == types["id"]
    assert {r["id"]: r["cluster_id"] for r in dist.collect()} == got


def test_bm25_early_return_handles(spark):
    """Both early-return branches follow the persist-handle convention:
    empty corpus unpersists immediately; all-NULL corpus attaches the
    bm25_doc_lengths handle to the returned frame."""
    from dask_groupby_spark.operators.text import bm25_scores

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out0 = bm25_scores(empty, ["x"])
    assert out0.count() == 0

    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    out1 = bm25_scores(allnull, ["x"])
    assert hasattr(out1, "bm25_doc_lengths")
    got = {r["doc_id"]: r["bm25"] for r in out1.collect()}
    assert got == {1: 0.0, 2: 0.0}
    out1.bm25_doc_lengths.unpersist()


def test_pagerank_round5_symmetric_tie(spark):
    """Symmetric sinks get bit-equal ranks; the round-5 compare plus id
    tie-break yields one deterministic order — the convention the oracle
    now shares (oracle_queries.py round(rank, 5))."""
    from dask_groupby_spark.operators import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3)], "src bigint, dst bigint"
    )
    pr = pagerank(edges, iters=5)
    out = (
        pr.select("id", F.round("rank", 5).alias("rank"))
        .orderBy(F.col("rank").desc(), "id")
        .collect()
    )
    ranks = {r["id"]: r["rank"] for r in out}
    assert ranks[2] == ranks[3]  # symmetry survives rounding
    order = [r["id"] for r in out]
    assert order.index(2) < order.index(3)  # id breaks the tie
