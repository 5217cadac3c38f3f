"""Hypothesis property tests for the round-7 operators: BM25 against a
pure-Python oracle on generated corpora, and the duplicate_clusters
driver-union-find tier against a Python connected-components oracle on
random graphs (the tier-equality guarantee, randomized).

One Spark collect() per example; tiny sizes keep the suite fast.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["a", "b", "c", "dd", "ee"]


@st.composite
def corpus(draw):
    n = draw(st.integers(1, 8))
    docs = []
    for i in range(n):
        m = draw(st.integers(0, 6))
        docs.append((i, " ".join(draw(
            st.lists(st.sampled_from(WORDS), min_size=m, max_size=m)
        ))))
    return docs


def _bm25_oracle(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    dls = {i: len(tk) for i, tk in toks.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in set(terms):
            tf = tk.count(t)
            if tf == 0:
                continue
            df = sum(1 for tk2 in toks.values() if t in tk2)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dls[i] / avgdl)
            )
        out[i] = (dls[i], s)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=corpus(), terms=st.lists(st.sampled_from(WORDS + ["zz"]),
                                     min_size=1, max_size=3))
def test_bm25_matches_python_oracle(spark, data, terms):
    from dask_groupby_spark.operators import bm25_scores

    df = spark.createDataFrame(data, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["dl"], r["bm25"])
        for r in bm25_scores(df, terms).collect()
    }
    want = _bm25_oracle(data, terms)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        if want[i][1] == 0.0:
            assert got[i][1] == 0.0  # no-hit docs are exactly zero
        else:
            assert math.isclose(
                got[i][1], want[i][1], rel_tol=1e-9, abs_tol=1e-12
            )


def _cc_oracle(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            label[v] = m
    return set(label.items())


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1, max_size=20,
))
def test_duplicate_clusters_uf_matches_python_cc(spark, edges):
    """Random graphs (self-loops, parallel edges, reversed duplicates
    included): the driver union-find tier must equal a Python BFS
    connected-components min-label oracle."""
    from dask_groupby_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        (r["id"], r["cluster_id"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == _cc_oracle(edges)


def test_uf_tier_edge_cases(spark):
    """Empty pair list and non-numeric ids through the driver tier:
    schema preserved, min-label = lexicographic min for strings (same
    ordering Spark's F.min uses in the distributed tier)."""
    from dask_groupby_spark.operators.dedup import duplicate_clusters

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = duplicate_clusters(empty)
    assert out.collect() == []
    assert out.schema.simpleString() == "struct<id:bigint,cluster_id:bigint>"

    sp = spark.createDataFrame([("x", "y"), ("y", "z")], "id_a string, id_b string")
    got = sorted((r["id"], r["cluster_id"]) for r in duplicate_clusters(sp).collect())
    assert got == [("x", "x"), ("y", "x"), ("z", "x")]


def test_bm25_empty_corpus_preserves_id_type(spark):
    from dask_groupby_spark.operators import bm25_scores

    e = spark.createDataFrame([], "name string, text string")
    out = bm25_scores(e, ["a"], id_col="name")
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<name:string,dl:int,bm25:double>"


def test_uf_tier_null_endpoints_dropped(spark):
    """r7 review finding: NULL-endpoint edges must not NaN-poison the
    driver tier's Arrow columns — both tiers drop them uniformly."""
    from dask_groupby_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (None, None)],
        "id_a bigint, id_b bigint",
    )
    for mde in (2_000_000, None):
        got = sorted(
            (r["id"], r["cluster_id"])
            for r in duplicate_clusters(pairs, max_driver_edges=mde).collect()
        )
        assert got == [(1, 1), (2, 1)], mde


def test_bm25_all_null_text_scores_zero(spark):
    """r7 review finding: a corpus whose every text is NULL must return
    all rows at bm25=0.0 (dl NULL), not crash on avgdl=None."""
    from dask_groupby_spark.operators import bm25_scores

    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    got = sorted(
        (r["doc_id"], r["dl"], r["bm25"]) for r in bm25_scores(df, ["a"]).collect()
    )
    assert got == [(1, None, 0.0), (2, None, 0.0)]


def test_interpolate_rejects_temp_column_collision(spark):
    import pytest as _pt

    from dask_groupby_spark import groupby_interpolate

    df = spark.createDataFrame([(1, 1.0, 2.0, 9.0)], "g int, x double, __x double, v double")
    with _pt.raises(ValueError, match="__x"):
        groupby_interpolate(df, "g", value="v", order_by="x")


def test_bm25_exposes_doc_length_unpersist_handle(spark):
    from dask_groupby_spark.operators import bm25_scores

    df = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id bigint, text string")
    out = bm25_scores(df, ["a"])
    assert out.bm25_doc_lengths.storageLevel.useMemory
    out.count()
    out.bm25_doc_lengths.unpersist(blocking=True)
    assert not out.bm25_doc_lengths.storageLevel.useMemory


def test_distributed_clusters_string_ids_converge(spark):
    """r7 deep-review finding: the distributed tier's old convergence
    certificate was sum(lbl), which is NULL for STRING ids — the loop
    stopped after one double-hop round, wrong for diameter > 4 chains.
    An 11-vertex chain needs 3 double-hop rounds; all must label 'a'."""
    from dask_groupby_spark.operators.dedup import duplicate_clusters

    chain = [(chr(ord("a") + i), chr(ord("a") + i + 1)) for i in range(10)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, max_driver_edges=0).collect()
    }
    assert got == {chr(ord("a") + i): "a" for i in range(11)}


def test_remove_duplicate_spans_id_col_named_id(spark):
    from dask_groupby_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d a b c d"), (2, "x y")], "id bigint, text string"
    )
    out = {
        r["id"]: r["text"]
        for r in remove_duplicate_spans(df, id_col="id", k=4).collect()
    }
    assert out[1] == "a b c d" and out[2] == "x y"


def test_dedup_paragraphs_null_text_kept_as_empty_row(spark):
    """r7 deep-review finding: a NULL text exploded to zero segment rows
    and the doc vanished from the inner reassembly join — it must come
    back as '' like any fully-deduped document."""
    from dask_groupby_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "p1\np2", "m1"), (2, None, "m2")],
        "doc_id bigint, text string, meta string",
    )
    out = {r["doc_id"]: (r["text"], r["meta"]) for r in dedup_paragraphs(df).collect()}
    assert out[1] == ("p1\np2", "m1")
    assert out[2] == ("", "m2")


def test_embedding_pca_one_partial_row_per_partition(spark):
    """r7 review: the PCA moment pass must emit ONE partial row per
    partition, not one per Arrow batch — tiny Arrow batches (standing in
    for a corpus-scale run) must not multiply the driver collect."""
    import numpy as np

    from dask_groupby_spark.operators.similarity import embedding_pca

    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(400)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).repartition(4)
    ref = embedding_pca(df, k=2)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        tiny = embedding_pca(df, k=2)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert np.allclose(ref.mean, tiny.mean)
    assert np.allclose(ref.components, tiny.components, atol=1e-9)
