"""Hot-key (skew) stress: one key owning 50% of all rows.

AQE splits skewed JOIN partitions but cannot split a skewed aggregation or
window partition, so the salted two-stage plans in operators/selection.py
are the scale path for hot group keys.  These tests pin down, on a
one-key-dominates dataset:

- result identity: salted == unsalted for top-k and per-group sampling;
- the structural bound that makes salting work: the partial stage's
  per-(key, salt) task never sees more than ~|group|/S rows, and the final
  stage ranks at most k*S survivors per key;
- plan shape: the salted plan adds exactly one extra Exchange (the partial
  window on (keys..., __salt)).
"""

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.operators.selection import grouped_topk, sample_per_group
from dask_groupby_spark.plans import count_exchanges

N = 20_000
SALT = 8


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" = 50% of rows; 10 cold keys share the rest
    df = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")))
        .alias("k"),
        F.col("id").alias("id"),
        (F.col("id") % 977).cast("double").alias("v"),
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_topk_salted_identical_under_skew(skewed):
    plain = {(r["k"], r["rank"], r["id"]) for r in
             grouped_topk(skewed, "k", order_col="v", k=25, tiebreak="id").collect()}
    salted = {(r["k"], r["rank"], r["id"]) for r in
              grouped_topk(skewed, "k", order_col="v", k=25, tiebreak="id",
                           skew_salt=SALT).collect()}
    assert plain == salted
    assert len({t[:2] for t in plain}) == len(plain)  # ranks unique per key


def test_topk_salted_plan_bounds_task_size(skewed):
    # structural property that bounds executor memory: the partial stage
    # partitions on (k, salt-of-tiebreak) — the hot key's rows spread across
    # SALT partitions within ~2x of evenly
    salt = F.pmod(F.xxhash64(F.col("id"), F.lit("topk-salt")), F.lit(SALT))
    sizes = (
        skewed.where(F.col("k") == "hot")
        .groupBy(salt.alias("s"))
        .count()
        .collect()
    )
    assert len(sizes) == SALT
    hot_total = sum(r["count"] for r in sizes)
    assert hot_total == N // 2
    assert max(r["count"] for r in sizes) < 2 * hot_total / SALT

    # survivor bound: the final window ranks <= k*SALT rows per key
    k = 25
    partial = grouped_topk(skewed, "k", order_col="v", k=k, tiebreak="id",
                           skew_salt=SALT)
    # (indirect but exact: per construction the pre-final filter keeps
    # row_number <= k within (k, salt) → <= k*SALT survivors per key)
    surv = (
        skewed.withColumn("__salt", salt)
        .withColumn(
            "__prank",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("k", "__salt")
                .orderBy(F.col("v").desc(), F.col("id").asc())
            ),
        )
        .where(F.col("__prank") <= k)
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] <= k * SALT for r in surv)
    assert partial.count() == len({r["k"] for r in skewed.select("k").distinct().collect()}) * k


def test_topk_salted_one_extra_exchange(skewed):
    plain = grouped_topk(skewed, "k", order_col="v", k=5, tiebreak="id")
    salted = grouped_topk(skewed, "k", order_col="v", k=5, tiebreak="id",
                          skew_salt=SALT)
    assert count_exchanges(plain) == 1
    assert count_exchanges(salted) == 2  # partial (k, salt) + final (k)


def test_sample_salted_identical_under_skew(skewed):
    plain = {(r["k"], r["id"]) for r in
             sample_per_group(skewed, "k", n=50, id_col="id", seed="s1").collect()}
    salted = {(r["k"], r["id"]) for r in
              sample_per_group(skewed, "k", n=50, id_col="id", seed="s1",
                               skew_salt=SALT).collect()}
    assert plain == salted
    # hot key contributes exactly n rows despite owning half the data
    hot = [t for t in plain if t[0] == "hot"]
    assert len(hot) == 50


def test_groupby_reduce_hot_key_sketch_path(skewed):
    """Sketch reductions keep bounded per-group state on a hot key and stay
    within the sketch's rank-error bound (percentile_approx guarantee)."""
    from dask_groupby_spark import groupby_reduce

    out = groupby_reduce(
        skewed, "k", func="approx_quantile", value="v",
        finalize_kwargs={"q": 0.5, "accuracy": 100},
    ).collect()
    got = {r["k"]: r["approx_quantile"] for r in out}
    # v = id % 977 over the hot key (uniform) → true median ≈ 488;
    # accuracy=100 bounds rank error at n/100 → value error ~ ±10 here
    assert abs(got["hot"] - 488.0) < 30


# ---------------------------------------------------------------------------
# Hot-BUCKET stress: LSH / shingle-index pair enumeration must stay bounded
# when one bucket (boilerplate templates, near-empty docs) goes degenerate.
# Uncapped, a bucket of n members emits n(n-1)/2 pairs; the anchor cap bounds
# it at ~n*cap while keeping every member connected to anchor 1, so the
# transitive clustering verdict (one keeper per clique) is unchanged.
# ---------------------------------------------------------------------------

HOT_DOCS = 200  # identical docs -> one band bucket per band
CAP = 4


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """200 identical documents + 12 distinct ones."""
    hot = spark.range(HOT_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate template page body here").alias("text"),
    )
    # cold docs share NO tokens with each other (wordN tokens are disjoint
    # per doc) so they never LSH-collide
    cold = spark.range(1000, 1012).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (F.col("id") * 17 + j).cast("string"))
                for j in range(8)
            ],
        ).alias("text"),
    )
    df = hot.union(cold)
    df.persist().count()
    yield df
    df.unpersist()


def test_lsh_cap_identical_when_buckets_small(spark):
    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document "),
            F.col("id").cast("string"),
            F.when(F.col("id") % 7 == 0, F.lit(" shared tail of words here now"))
            .otherwise(F.concat(F.lit(" body "), (F.col("id") * 31).cast("string"))),
        ).alias("text"),
    )
    sig = minhash_signatures(docs)
    plain = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(sig).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(sig, max_bucket_size=1000).collect()
    }
    assert plain == capped


def test_lsh_cap_bounds_hot_bucket_pairs(hot_corpus):
    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sig = minhash_signatures(hot_corpus).persist()
    sig.count()
    capped = lsh_candidate_pairs(sig, max_bucket_size=CAP).collect()
    sig.unpersist()
    n_pairs = len(capped)
    # uncapped would emit HOT_DOCS*(HOT_DOCS-1)/2 = 19900 distinct pairs;
    # the anchor plan emits <= cap per member per bucket
    assert n_pairs <= HOT_DOCS * CAP
    assert n_pairs < HOT_DOCS * (HOT_DOCS - 1) / 2 / 5
    # connectivity: every hot doc appears in some pair (no member orphaned)
    members = {r["id_a"] for r in capped} | {r["id_b"] for r in capped}
    assert set(range(HOT_DOCS)) <= members


def test_near_dedup_capped_collapses_hot_cluster(hot_corpus):
    from dask_groupby_spark.operators.dedup import near_deduplicate

    kept = near_deduplicate(hot_corpus, max_bucket_size=CAP)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # the 200-clone cluster collapses to its min id even though only an
    # anchor-star subgraph of the clique was enumerated
    assert ids == [0] + list(range(1000, 1012))


def test_jaccard_shingle_df_cap(spark):
    """Document-frequency cap drops boilerplate shingles before the
    inverted-index self-join; result == exact Jaccard over the filtered
    shingle space (python reference)."""
    from dask_groupby_spark.operators.dedup import ngram_jaccard_pairs

    texts = {
        # every doc shares this 6-token boilerplate (many hot shingles)
        0: "copyright notice all rights reserved here alpha beta gamma delta",
        1: "copyright notice all rights reserved here alpha beta gamma epsilon",
        2: "copyright notice all rights reserved here zeta eta theta iota",
        3: "copyright notice all rights reserved here kappa lam mu nu",
        4: "copyright notice all rights reserved here xi omicron pi rho",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    max_df = 3

    def sh_set(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh_set(t) for i, t in texts.items()}
    df_count = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    fsets = {
        i: {g for g in s if df_count[g] <= max_df} for i, s in sets.items()
    }
    expected = {}
    for a in sets:
        for b in sets:
            if a < b and (fsets[a] | fsets[b]):
                j = len(fsets[a] & fsets[b]) / len(fsets[a] | fsets[b])
                if j >= 0.2:
                    expected[(a, b)] = j
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, threshold=0.2, max_shingle_df=max_df
        ).collect()
    }
    assert set(got) == set(expected)
    for k_ in got:
        assert abs(got[k_] - expected[k_]) < 1e-12


def test_embedding_cap_and_semdedup_collapse(spark):
    from dask_groupby_spark.operators.similarity import (
        embedding_near_duplicates,
        semantic_deduplicate,
    )

    dim = 8
    # 100 near-identical vectors (one LSH bucket) + 5 distinct directions
    rows = [(i, [1.0 + (i % 3) * 1e-4] + [0.0] * (dim - 1)) for i in range(100)]
    rows += [(200 + d, [0.0] * d + [1.0] + [0.0] * (dim - 1 - d)) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs_capped = embedding_near_duplicates(
        df, threshold=0.999, dim=dim, max_bucket_size=CAP
    ).collect()
    assert len(pairs_capped) <= 100 * CAP
    members = {r["id_a"] for r in pairs_capped} | {r["id_b"] for r in pairs_capped}
    assert set(range(100)) <= members

    kept = semantic_deduplicate(
        df, threshold=0.999, dim=dim, max_bucket_size=CAP
    )
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    assert ids == [0] + [201, 202, 203, 204, 205]


def test_interval_overlap_join_hot_key_exact(spark):
    """One user owns 200 overlapping intervals on each side (the
    sessionization hot key): the output is genuinely quadratic for that
    key — the test pins EXACTNESS (brute-force parity, no dup/no drop)
    and that the work distributes over bucket cells rather than a
    single task Cartesian."""
    import numpy as np

    from dask_groupby_spark.operators.joins import interval_overlap_join

    rng = np.random.default_rng(67)
    hot = [(0, float(s), float(s + 30), f"l{i}") for i, s in enumerate(rng.uniform(0, 500, 200))]
    tail = [(k, 0.0, 10.0, f"t{k}") for k in range(1, 20)]
    l = spark.createDataFrame(hot + tail, "uid bigint, s double, e double, tag string")
    r = spark.createDataFrame(
        [(0, float(s), float(s + 20), f"r{i}") for i, s in enumerate(rng.uniform(0, 500, 200))]
        + [(k, 5.0, 6.0, f"u{k}") for k in range(1, 20)],
        "uid bigint, s double, e double, rtag string",
    )
    out = interval_overlap_join(l, r, "s", "e", "s", "e", by=["uid"], bucket_width=25.0)
    got = sorted((row["tag"], row["rtag"]) for row in out.collect())
    lrows = hot + tail
    rrows = [(0, float(s), float(s + 20), f"r{i}") for i, s in enumerate(rng.uniform(0, 500, 200))]
    # regenerate identical randoms: use the collected frames instead
    lrows = [(row["uid"], row["s"], row["e"], row["tag"]) for row in l.collect()]
    rrows = [(row["uid"], row["s"], row["e"], row["rtag"]) for row in r.collect()]
    want = sorted(
        (lt, rt)
        for (lu, ls, le, lt) in lrows
        for (ru, rs, re, rt) in rrows
        if lu == ru and ls <= re and rs <= le
    )
    assert got == want
    assert len(got) > 3000     # the hot key really is quadratic-sized output


# ---------------------------------------------------------------------------
# LSH giant-bucket SPILL tier (r10): beyond max_bucket_size bounding the
# enumeration, spill_threshold bounds per-TASK memory — oversized buckets
# never re-assemble as one array row; their anchor star enumerates through
# a join against the bounded bottom-cap anchor array.
# ---------------------------------------------------------------------------


def test_lsh_spill_tier_identical_mixed_buckets(hot_corpus):
    """Spill tier == array tier, bit-for-bit, on a corpus whose buckets
    straddle the threshold (the 200-clone bucket spills, the small shared-
    tail buckets take the ordinary array path)."""
    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sig = minhash_signatures(hot_corpus).persist()
    sig.count()
    plain = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(sig, max_bucket_size=CAP).collect()
    }
    spilled = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(
            sig, max_bucket_size=CAP, spill_threshold=16
        ).collect()
    }
    sig.unpersist()
    assert plain == spilled
    assert len(plain) > 0


def test_lsh_spill_tier_identical_no_bucket_over_threshold(spark):
    """When nothing spills, the small path alone must reproduce the plain
    plan exactly (full cliques under the cap included)."""
    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 9 == 0, F.lit("shared niner body of words here"))
        .otherwise(
            F.concat(F.lit("doc body "), (F.col("id") * 13).cast("string"))
        )
        .alias("text"),
    )
    sig = minhash_signatures(docs)
    plain = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(sig, max_bucket_size=50).collect()
    }
    spilled = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in lsh_candidate_pairs(
            sig, max_bucket_size=50, spill_threshold=1_000_000
        ).collect()
    }
    assert plain == spilled


def test_spilled_bucket_pairs_parity_randomized(spark):
    """Randomized differential for the spill tier at the primitive level
    (the twin of test_capped_drop_buckets_parity_randomized): on random
    bucket-size mixes sitting ON the cap and threshold boundaries (cap,
    cap+1, threshold, threshold+1, singletons, one hot bucket), the
    salted two-level + anchor-star-join plan must equal the plain
    array plan pair-for-pair — anchor-anchor pairs, boundary buckets,
    and salt-collision merges included."""
    import numpy as np

    from dask_groupby_spark.operators.dedup import sorted_bucket_pairs

    CAP_, THR = 8, 24
    rng = np.random.default_rng(20260816)
    sizes = {f"b{i}": int(s) for i, s in enumerate(rng.integers(1, 14, 30))}
    sizes["at_cap"] = CAP_
    sizes["over_cap"] = CAP_ + 1
    sizes["at_threshold"] = THR
    sizes["over_threshold"] = THR + 1
    sizes["hot"] = 400
    rows = []
    mid = 0
    for b, n in sizes.items():
        for _ in range(n):
            rows.append((b, mid))
            mid += 1
    df = spark.createDataFrame(rows, "bk string, m bigint").repartition(16)

    def pairs(spill):
        out = sorted_bucket_pairs(
            df, ["bk"], F.col("m"),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            max_bucket_size=CAP_,
            spill_threshold=spill,
            salt_partitions=4,  # force real multi-partial merges at this scale
        )
        return {(r["p"]["a"], r["p"]["b"]) for r in out.collect()}

    # plain tier = no spill machinery at all
    from dask_groupby_spark.operators.dedup import bucket_pairs_from

    buckets = (
        df.groupBy("bk")
        .agg(F.array_sort(F.collect_list("m")).alias("mem"))
        .where(F.size("mem") >= 2)
    )
    plain = {
        (r["p"]["a"], r["p"]["b"])
        for r in bucket_pairs_from(
            buckets, "mem",
            lambda a, b: F.struct(a.alias("a"), b.alias("b")), CAP_,
        ).collect()
    }
    spilled = pairs(THR)
    assert spilled == plain
    # the hot bucket really exercised the star-join path: its pair count
    # is the exact anchor-star size cap*(n-cap) + C(cap,2)
    n = sizes["hot"]
    star = CAP_ * (n - CAP_) + CAP_ * (CAP_ - 1) // 2
    hot_ids = {m for b, m in rows if b == "hot"}
    got_hot = sum(1 for a, b in spilled if a in hot_ids)
    assert got_hot == star


def test_lsh_spill_requires_cap(spark):
    import pytest as _pytest

    from dask_groupby_spark.operators.dedup import lsh_candidate_pairs

    sig = spark.range(4).select(
        F.col("id"), *[F.lit(1).alias(f"mh_{i}") for i in range(8)]
    )
    with _pytest.raises(ValueError, match="requires max_bucket_size"):
        lsh_candidate_pairs(sig, spill_threshold=100).collect()
    with _pytest.raises(ValueError, match="must be <="):
        lsh_candidate_pairs(
            sig, max_bucket_size=1000, spill_threshold=10
        ).collect()


def test_lsh_spill_hot_bucket_stress_1m(spark):
    """The r9 SCALE.md known bound, closed: a 10⁶-member band bucket (every
    signature identical) streams through the join path — no task ever holds
    the whole bucket (salted partials hold ~n/64 members each) — and the
    anchor-star output is exactly the sorted-array semantics: pairs (a, b)
    for every anchor a in the bottom-cap ids and every b > a."""
    from dask_groupby_spark.operators.dedup import lsh_candidate_pairs

    n, cap = 1_000_000, 4
    sig = spark.range(n).select(
        F.col("id"), *[F.lit(1).alias(f"mh_{i}") for i in range(8)]
    )
    pairs = lsh_candidate_pairs(
        sig, num_hashes=8, bands=4, max_bucket_size=cap,
        spill_threshold=100_000,
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id_a").alias("min_a"),
        F.max("id_a").alias("max_a"),
        F.max("id_b").alias("max_b"),
        F.min("n_shared_bands").alias("min_sb"),
        F.max("n_shared_bands").alias("max_sb"),
    ).collect()[0]
    # anchors are ids 0..3; each pairs with every larger id
    assert agg["n_pairs"] == (n - 1) + (n - 2) + (n - 3) + (n - 4)
    assert agg["min_a"] == 0 and agg["max_a"] == cap - 1
    assert agg["max_b"] == n - 1
    # all 4 bands share the one bucket
    assert agg["min_sb"] == 4 and agg["max_sb"] == 4


def test_lsh_spill_plan_single_corpus_scan(spark):
    """Structural: the spill tier's downstream plan reads ONLY the
    checkpointed partials (no parquet re-scan anywhere) — the one corpus
    scan lives inside the checkpointed lineage, executed exactly once."""
    import os
    import re

    from dask_groupby_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from dask_groupby_spark.plans import physical_plan
    from dask_groupby_spark.sources import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    pairs = lsh_candidate_pairs(
        minhash_signatures(docs), max_bucket_size=100, spill_threshold=10_000
    )
    plan = physical_plan(pairs)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan
    assert "ExistingRDD" in plan, plan


def test_capped_drop_buckets_parity_randomized(spark):
    """The bounded collector (salted two-level, per-partial slice, exact
    summed count) must equal the naive collect-then-filter shape on
    random bucket-size mixes straddling the cap — including buckets at
    exactly cap and cap+1, singletons, and one hot bucket."""
    import numpy as np

    from dask_groupby_spark.operators.dedup import _capped_drop_buckets

    rng = np.random.default_rng(1009)
    rows = []
    # bucket sizes: many tiny, several at the cap boundary, one hot
    sizes = {f"b{i}": int(s) for i, s in enumerate(rng.integers(1, 9, 40))}
    sizes["edge_at_cap"] = 16
    sizes["edge_over_cap"] = 17
    sizes["hot"] = 900
    mid = 0
    for b, n in sizes.items():
        for _ in range(n):
            rows.append((b, mid))
            mid += 1
    df = spark.createDataFrame(rows, "bk string, m bigint").repartition(16)

    got = {
        r["bk"]: tuple(r["mem"])
        for r in _capped_drop_buckets(df, "bk", "m", cap=16).collect()
    }
    naive = (
        df.groupBy("bk").agg(F.array_sort(F.collect_list("m")).alias("mem"))
        .where(F.size("mem") <= 16)
    )
    want = {r["bk"]: tuple(r["mem"]) for r in naive.collect()}
    assert got == want
    assert "edge_at_cap" in got and "edge_over_cap" not in got
    assert "hot" not in got
    # every surviving array is complete and sorted
    assert all(list(v) == sorted(v) for v in got.values())


def test_spill_machinery_gated_by_metadata_bound(spark, tmp_path):
    """r11 (VERDICT r10 #7): when a metadata row bound proves no bucket
    can exceed spill_threshold, the spill machinery must not enter the
    plan at all — sorted_bucket_pairs takes the plain path (gated via
    the rows frame), and near_deduplicate gates on the CORPUS frame even
    though its band-exploded rows are unboundable."""
    import dask_groupby_spark.operators.dedup as dd

    p = str(tmp_path / "docs.parquet")
    spark.range(60).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 7 = 0 THEN 'shared seven body of words here' "
        "ELSE concat('doc body ', CAST(id * 17 AS STRING)) END AS text",
    ).write.parquet(p)
    docs = spark.read.parquet(p)

    orig = dd._spilled_bucket_pairs

    def boom(*a, **k):
        raise AssertionError("spill machinery engaged on a bounded corpus")

    dd._spilled_bucket_pairs = boom
    try:
        kept = dd.near_deduplicate(docs, num_hashes=8, bands=4).count()
        assert kept > 0
        # direct sorted_bucket_pairs on a boundable rows frame
        rows = docs.selectExpr("pmod(doc_id, 5) AS b", "doc_id AS m")
        pairs = dd.sorted_bucket_pairs(
            rows,
            ["b"],
            F.col("m"),
            lambda a, c: F.struct(a.alias("x"), c.alias("y")),
            max_bucket_size=50,
            spill_threshold=1_000_000,
        ).count()
        assert pairs > 0
    finally:
        dd._spilled_bucket_pairs = orig
    # a threshold SMALLER than the bound must still engage the machinery
    got = dd.sorted_bucket_pairs(
        docs.selectExpr("pmod(doc_id, 2) AS b", "doc_id AS m"),
        ["b"],
        F.col("m"),
        lambda a, c: F.struct(a.alias("x"), c.alias("y")),
        max_bucket_size=10,
        spill_threshold=20,
    )
    plain = dd.sorted_bucket_pairs(
        docs.selectExpr("pmod(doc_id, 2) AS b", "doc_id AS m"),
        ["b"],
        F.col("m"),
        lambda a, c: F.struct(a.alias("x"), c.alias("y")),
        max_bucket_size=10,
        spill_threshold=None,
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, plain.collect()))
