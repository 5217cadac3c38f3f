"""Persisted MinHash-LSH index: incremental near-dedup against a stored
corpus must agree exactly with the batch (recompute-everything) plan."""

import pytest

from dask_groupby_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_index_probe,
    minhash_index_write,
    minhash_signatures,
    near_duplicates_against_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a completely different document about spark catalyst optimizer rules"),
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),
    (4, "minhash locality sensitive hashing buckets candidate pairs by band"),
    (5, "short text"),
]

BATCH = [
    (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    (102, "totally novel content with no overlap in any shingle whatsoever yes"),
    (103, "minhash locality sensitive hashing buckets candidate pairs by band"),
]


def _batch_cross_pairs(spark, corpus_rows, batch_rows):
    """Reference: batch LSH over the union, restricted to corpus×batch."""
    union = _docs(spark, corpus_rows + batch_rows)
    sig = minhash_signatures(union)
    pairs = lsh_candidate_pairs(sig)
    out = {}
    corpus_ids = {r[0] for r in corpus_rows}
    batch_ids = {r[0] for r in batch_rows}
    for r in pairs.collect():
        a, b = r["id_a"], r["id_b"]
        if a in corpus_ids and b in batch_ids:
            out[(b, a)] = r["n_shared_bands"]
        elif b in corpus_ids and a in batch_ids:
            out[(a, b)] = r["n_shared_bands"]
    return out


def test_probe_matches_batch_plan(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhidx"))
    minhash_index_write(_docs(spark, CORPUS), path)
    got = {
        (r["new_id"], r["index_id"]): r["n_shared_bands"]
        for r in minhash_index_probe(spark, path, _docs(spark, BATCH)).collect()
    }
    assert got == _batch_cross_pairs(spark, CORPUS, BATCH)
    assert got  # the fixture must actually produce candidates


def test_append_equals_rebuild(spark, tmp_path_factory):
    grown = str(tmp_path_factory.mktemp("mhidx_grow"))
    rebuilt = str(tmp_path_factory.mktemp("mhidx_rebuild"))
    first, second = CORPUS[:3], CORPUS[3:]
    minhash_index_write(_docs(spark, first), grown)
    minhash_index_write(_docs(spark, second), grown, mode="append")
    minhash_index_write(_docs(spark, first + second), rebuilt)
    probe = lambda p: {
        (r["new_id"], r["index_id"]): r["n_shared_bands"]
        for r in minhash_index_probe(spark, p, _docs(spark, BATCH)).collect()
    }
    assert probe(grown) == probe(rebuilt)


def test_append_validates_params(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhidx_params"))
    minhash_index_write(_docs(spark, CORPUS), path, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="built with"):
        minhash_index_write(_docs(spark, CORPUS), path, num_hashes=8, bands=2, mode="append")


def test_est_jaccard_verification(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhidx_jac"))
    minhash_index_write(_docs(spark, CORPUS), path)
    out = near_duplicates_against_index(
        spark, path, _docs(spark, BATCH), threshold=0.0
    ).collect()
    # exact-copy pairs must estimate Jaccard 1.0 (all minhashes agree)
    exact = {(r["new_id"], r["index_id"]): r["est_jaccard"] for r in out}
    assert exact[(101, 1)] == 1.0
    assert exact[(103, 4)] == 1.0
    # a high threshold drops everything below it but keeps the exact copies
    kept = near_duplicates_against_index(
        spark, path, _docs(spark, BATCH), threshold=0.9
    ).collect()
    assert {(r["new_id"], r["index_id"]) for r in kept} >= {(101, 1), (103, 4)}
    assert all(r["est_jaccard"] >= 0.9 for r in kept)


def test_probe_pushes_bucket_filter(spark, tmp_path_factory):
    """The small-batch probe must reach the index scan as a bh IN (…)
    pushed filter (row-group skipping on the bh-sorted layout)."""
    path = str(tmp_path_factory.mktemp("mhidx_push"))
    minhash_index_write(_docs(spark, CORPUS), path)
    plan = (
        minhash_index_probe(spark, path, _docs(spark, BATCH))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(bh" in plan
