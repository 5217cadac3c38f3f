"""Round-5 pipeline surface: salted_join, count-min sketch, vocabulary
encoding, hash-classifier scoring, PII redaction."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.operators import (
    build_vocab,
    cms_estimate,
    cms_sketch_table,
    encode_tokens,
    encode_tokens_flat,
    hash_classifier_score,
    redact_pii,
    salted_join,
)


def pmd5(val, seed=""):
    """python mirror of dedup.portable_hash."""
    return int(hashlib.md5(f"{seed}:{val}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (0) with 500 rows, tail keys with 1 each
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, 1000 + k) for k in range(1, 20)],
        "k bigint, lv bigint",
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(0, 15)], "k bigint, rv string"
    )
    return left, right


def test_salted_join_inner_matches_plain(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, on="k", salt=8)
    want = left.join(right, on="k", how="inner")
    assert sorted(got.collect()) == sorted(want.collect())


def test_salted_join_left_matches_plain(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, on="k", how="left", salt=4)
    want = left.join(right, on="k", how="left")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_suffixes_collisions(spark):
    left = spark.createDataFrame([(1, "a")], "k bigint, v string")
    right = spark.createDataFrame([(1, "b")], "k bigint, v string")
    out = salted_join(left, right, on="k", salt=2)
    assert set(out.columns) == {"k", "v", "v_right"}
    row = out.collect()[0]
    assert (row["v"], row["v_right"]) == ("a", "b")


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner"):
        salted_join(left, right, on="k", how="right")


def test_salted_join_spreads_hot_key(spark, skewed):
    # the hot key's left rows must land on several salt values
    left, _ = skewed
    n = (
        left.where(F.col("k") == 0)
        .select(F.pmod(F.xxhash64("k", "lv"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n >= 4


# ------------------------------------------------------------------ count-min


def test_cms_estimate_upper_bound_and_exact_when_sparse(spark):
    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5
    df = spark.createDataFrame(rows, "term string")
    sk = cms_sketch_table(df, "term", width=1024, depth=4)
    q = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "term string")
    est = {
        r["term"]: r["est_count"]
        for r in cms_estimate(sk, q, "term", width=1024, depth=4).collect()
    }
    # upper bound always; exact here (3 distinct values, width 1024)
    assert est["a"] == 50 and est["b"] == 20 and est["c"] == 5
    assert est["zz"] == 0


def test_cms_batches_add(spark, tmp_path):
    p = str(tmp_path / "cms")
    d1 = spark.createDataFrame([("x",)] * 10, "term string")
    d2 = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "term string")
    cms_sketch_table(d1, "term", width=64, depth=3, path=p)
    cms_sketch_table(d2, "term", width=64, depth=3, path=p)
    merged = spark.read.parquet(p)
    q = spark.createDataFrame([("x",), ("y",)], "term string")
    est = {
        r["term"]: r["est_count"]
        for r in cms_estimate(merged, q, "term", width=64, depth=3).collect()
    }
    assert est["x"] >= 17 and est["y"] >= 3  # CM overestimates, never under


def test_cms_portable_matches_python(spark):
    # portable hasher: bucket arithmetic reproducible outside Spark
    df = spark.createDataFrame([("w",)] * 4, "term string")
    sk = cms_sketch_table(df, "term", width=32, depth=2, hasher="portable")
    rows = {(r["d"], r["bucket"]): r["cnt"] for r in sk.collect()}
    for d in range(2):
        assert rows[(d, pmd5("w", f"cms{d}") % 32)] == 4


# ----------------------------------------------------------------- vocabulary


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "b a a c b a"),
            (1, "a b d"),
            (2, "  a   "),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )


def test_build_vocab_rank_and_ties(spark, tiny_docs):
    v = {
        r["term"]: (r["cnt"], r["term_id"])
        for r in build_vocab(tiny_docs).collect()
    }
    # counts: a=5, b=3, c=1, d=1; tie c/d broken alphabetically
    assert v == {"a": (5, 0), "b": (3, 1), "c": (1, 2), "d": (1, 3)}


def test_build_vocab_max_size_and_min_count(spark, tiny_docs):
    top = build_vocab(tiny_docs, max_size=2).collect()
    assert {(r["term"], r["term_id"]) for r in top} == {("a", 0), ("b", 1)}
    kept = build_vocab(tiny_docs, min_count=2).collect()
    assert {r["term"] for r in kept} == {"a", "b"}


def test_encode_tokens_flat_and_oov(spark, tiny_docs):
    vocab = build_vocab(tiny_docs, max_size=2)  # a->0, b->1
    flat = encode_tokens_flat(tiny_docs, vocab).orderBy("doc_id", "pos")
    got = [(r["doc_id"], r["pos"], r["token_id"]) for r in flat.collect()]
    assert got == [
        (0, 0, 1), (0, 1, 0), (0, 2, 0), (0, 3, -1), (0, 4, 1), (0, 5, 0),
        (1, 0, 0), (1, 1, 1), (1, 2, -1),
        (2, 0, 0),
    ]


def test_encode_tokens_array_order(spark, tiny_docs):
    vocab = build_vocab(tiny_docs)
    enc = {
        r["doc_id"]: r["token_ids"]
        for r in encode_tokens(tiny_docs, vocab).collect()
    }
    assert enc[0] == [1, 0, 0, 2, 1, 0]
    assert enc[1] == [0, 1, 3]
    assert enc[2] == [0]
    # r9: an empty doc survives as an EMPTY array so corpora reconcile
    # row-for-row (it used to vanish from the output entirely)
    assert enc[3] == []


# ------------------------------------------------------------ hash classifier


def test_hash_classifier_pseudo_weights_match_python(spark, tiny_docs):
    out = {
        r["doc_id"]: (r["n_tokens"], r["clf_score"])
        for r in hash_classifier_score(
            tiny_docs, dim=64, hasher="portable"
        ).collect()
    }

    def w(tok):
        b = pmd5(tok, "cb") % 64
        return (pmd5(str(b), "cw") % 2001 - 1000) / 1000.0

    for doc_id, text in [(0, "b a a c b a"), (1, "a b d"), (2, "a")]:
        toks = text.split()
        score = sum(w(t) for t in toks) / len(toks)
        want = 1.0 / (1.0 + math.exp(-score))
        n, got = out[doc_id]
        assert n == len(toks)
        assert got == pytest.approx(want, rel=1e-12)
    assert 3 not in out  # empty docs dropped


def test_hash_classifier_explicit_weights(spark):
    df = spark.createDataFrame([(0, "x x y")], "doc_id bigint, text string")
    # all-zero weights except nothing: score = sigmoid(bias)
    out = hash_classifier_score(df, weights=[0.0] * 16, dim=16, bias=2.0)
    assert out.collect()[0]["clf_score"] == pytest.approx(
        1 / (1 + math.exp(-2.0)), rel=1e-12
    )
    with pytest.raises(ValueError, match="dim"):
        hash_classifier_score(df, weights=[0.0] * 8, dim=16)


# -------------------------------------------------------------- PII redaction


def test_redact_pii_defaults(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob@example.com and 10.0.0.1 call +1 555-123-4567 ok"),
            (1, "clean text only"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r0 = out[0]
    assert "<EMAIL>" in r0["text"] and "<IPV4>" in r0["text"] and "<PHONE>" in r0["text"]
    assert "bob@" not in r0["text"] and "10.0.0.1" not in r0["text"]
    assert (r0["email_n"], r0["ipv4_n"], r0["phone_n"]) == (1, 1, 1)
    r1 = out[1]
    assert r1["text"] == "clean text only"
    assert (r1["email_n"], r1["ipv4_n"], r1["phone_n"]) == (0, 0, 0)


def test_redact_pii_out_col_keeps_original(spark):
    df = spark.createDataFrame([(0, "x a@b.co y")], "doc_id bigint, text string")
    out = redact_pii(df, out="redacted", counts=False).collect()[0]
    assert out["text"] == "x a@b.co y"
    assert out["redacted"] == "x <EMAIL> y"


# ----------------------------------------------------------- property tests

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@settings(**_PROP)
@given(
    lrows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)), max_size=30),
    rrows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)), max_size=10),
    salt=st.integers(1, 7),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_always_matches_plain(spark, lrows, rrows, salt, how):
    left = spark.createDataFrame(lrows or [(None, None)], "k int, lv int")
    right = spark.createDataFrame(rrows or [(None, None)], "k int, rv int")
    got = salted_join(left, right, on="k", how=how, salt=salt)
    want = left.join(right, on="k", how=how)
    key = lambda r: tuple((x is None, x) for x in r)
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


@settings(**_PROP)
@given(
    vals=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
    width=st.sampled_from([8, 64]),
    depth=st.integers(1, 4),
)
def test_cms_never_underestimates(spark, vals, width, depth):
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    sk = cms_sketch_table(df, "term", width=width, depth=depth)
    q = spark.createDataFrame([(v,) for v in set(vals)], "term string")
    est = {
        r["term"]: r["est_count"]
        for r in cms_estimate(sk, q, "term", width=width, depth=depth).collect()
    }
    true = Counter(vals)
    for term, n in true.items():
        assert n <= est[term] <= len(vals), (term, n, est[term])


@settings(**_PROP)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), max_size=8).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    max_size=st.integers(1, 8),
)
def test_vocab_encode_roundtrip_matches_python(spark, docs, max_size):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    vocab = build_vocab(df, max_size=max_size)
    # python reference: rank by (-cnt, term), cut at max_size
    cnt = Counter(t for d in docs for t in d.split())
    ranked = sorted(cnt, key=lambda t: (-cnt[t], t))[:max_size]
    ids = {t: i for i, t in enumerate(ranked)}
    got_vocab = {r["term"]: (r["cnt"], r["term_id"]) for r in vocab.collect()}
    assert got_vocab == {t: (cnt[t], ids[t]) for t in ids}
    flat = encode_tokens_flat(df, vocab).collect()
    got = sorted((r["doc_id"], r["pos"], r["token_id"]) for r in flat)
    want = sorted(
        (i, p, ids.get(t, -1))
        for i, d in enumerate(docs)
        for p, t in enumerate(d.split())
    )
    assert got == want


def test_salted_join_hot_keys_matches_plain(spark, skewed):
    left, right = skewed
    for how in ("inner", "left"):
        got = salted_join(left, right, on="k", how=how, salt=8, hot_keys=[0])
        want = left.join(right, on="k", how=how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_salted_join_hot_keys_bounds_replication(spark, skewed):
    # non-hot right rows keep ONE copy: replicated right row count is
    # |right| + |hot∩right|·(salt-1), not |right|·salt
    left, right = skewed
    out = salted_join(left, right, on="k", salt=8, hot_keys=[0])
    # correctness of the bound is structural; assert via the exploded side
    from pyspark.sql import functions as FF

    hot = FF.col("k") == 0
    rsalted = right.withColumn(
        "__salt",
        FF.explode(
            FF.when(hot, FF.array(*[FF.lit(i) for i in range(8)])).otherwise(
                FF.array(FF.lit(0))
            )
        ),
    )
    assert rsalted.count() == right.count() + 7  # one hot key in right
    assert out.count() == left.join(right, "k").count()


def test_salted_join_hot_keys_multi_column(spark):
    left = spark.createDataFrame(
        [(0, "x", i) for i in range(50)] + [(1, "y", 99)],
        "a bigint, b string, lv bigint",
    )
    right = spark.createDataFrame(
        [(0, "x", "hot"), (1, "y", "cold")], "a bigint, b string, rv string"
    )
    got = salted_join(
        left, right, on=["a", "b"], salt=4, hot_keys=[(0, "x")]
    )
    want = left.join(right, on=["a", "b"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError, match="arity"):
        salted_join(left, right, on=["a", "b"], hot_keys=[0])


# ------------------------------------------------------------ histogram sketch


def test_hist_quantile_within_half_bin(spark):
    import numpy as np

    from dask_groupby_spark.operators.sketches import hist_quantile, hist_sketch_table

    rng = np.random.RandomState(7)
    vals = rng.uniform(0, 100, 2000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    sk = hist_sketch_table(df, "v", lo=0.0, hi=100.0, bins=200)
    row = hist_quantile(sk, [0.5, 0.9], lo=0.0, hi=100.0, bins=200).collect()[0]
    half_bin = 100.0 / 200 / 2
    assert abs(row["p0_5"] - np.quantile(vals, 0.5)) <= 100.0 / 200 + half_bin
    assert abs(row["p0_9"] - np.quantile(vals, 0.9)) <= 100.0 / 200 + half_bin


def test_hist_batches_add_and_grouped(spark, tmp_path):
    from dask_groupby_spark.operators.sketches import hist_quantile, hist_sketch_table

    p = str(tmp_path / "hist")
    b1 = spark.createDataFrame(
        [("a", float(i)) for i in range(50)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", float(i)) for i in range(50, 100)]
        + [("b", 10.0)] * 5,
        "k string, v double",
    )
    hist_sketch_table(b1, "v", lo=0.0, hi=100.0, by=["k"], bins=100, path=p)
    hist_sketch_table(b2, "v", lo=0.0, hi=100.0, by=["k"], bins=100, path=p)
    merged = spark.read.parquet(p)
    got = {
        r["k"]: r["p0_5"]
        for r in hist_quantile(
            merged, 0.5, lo=0.0, hi=100.0, by=["k"], bins=100
        ).collect()
    }
    # group a: 0..99 uniform -> median bin 49, midpoint 49.5
    assert got["a"] == pytest.approx(49.5)
    assert got["b"] == pytest.approx(10.5)  # all mass in bin 10


def test_hist_clamps_out_of_range(spark):
    from dask_groupby_spark.operators.sketches import hist_sketch_table

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (99.0,), (250.0,), (float("nan"),), (None,)],
        "v double",
    )
    sk = {
        r["bin"]: r["cnt"]
        for r in hist_sketch_table(df, "v", lo=0.0, hi=100.0, bins=10).collect()
    }
    assert sk == {0: 2, 9: 2}  # -5 clamps low, 250 clamps high; nan/null drop


# ----------------------------------------------------- repeated-segment removal


def test_remove_repeated_segments(spark):
    from dask_groupby_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame(
        [
            (0, "intro\ncookie banner\nbody one\ncookie banner\nbody two"),
            (1, "a\n\nb\n\na"),  # blank lines repeat; 'a' repeats
            (2, "unique only"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["seg_n_before"], r["seg_n_after"])
        for r in remove_repeated_segments(df, count_cols=True).collect()
    }
    assert got[0] == ("intro\ncookie banner\nbody one\nbody two", 5, 4)
    # r9: default min_len=1 KEEPS blank segments (paragraph structure is
    # not a content repeat); only the second 'a' is dropped
    assert got[1] == ("a\n\nb\n", 5, 4)
    assert got[2] == ("unique only", 1, 1)
    # min_len=0 restores blank-dedup for callers that want it
    legacy = {r["doc_id"]: r["text"]
              for r in remove_repeated_segments(df, min_len=0).collect()}
    assert legacy[1] == "a\n\nb"
    # min_len keeps short segments even when repeated
    kept = remove_repeated_segments(df, min_len=2).collect()
    by_id = {r["doc_id"]: r["text"] for r in kept}
    assert by_id[1] == "a\n\nb\n\na"  # 'a' and '' both < 2 chars -> kept


def test_remove_repeated_segments_out_col(spark):
    from dask_groupby_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame([(0, "x\nx\ny")], "doc_id bigint, text string")
    row = remove_repeated_segments(df, out="clean").collect()[0]
    assert row["text"] == "x\nx\ny" and row["clean"] == "x\ny"


# ------------------------------------------------------ embedding quantization


def test_quantize_roundtrip_error_bound(spark):
    import numpy as np

    from dask_groupby_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    vecs.append((99, [0.0] * 16))  # all-zero vector
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    q = quantize_embeddings(df)
    back = dequantize_embeddings(q, out="recon")
    for r in back.collect():
        orig, recon, scale = r["embedding"], r["recon"], r["q_scale"]
        assert all(abs(a - b) <= scale / 2 + 1e-7 for a, b in zip(orig, recon))
        assert all(-127 <= c <= 127 for c in r["q_vec"])
    zero = {r["vec_id"]: r for r in q.collect()}[99]
    assert zero["q_scale"] == 1.0 and all(c == 0 for c in zero["q_vec"])
    # storage type really is byte
    assert dict(q.dtypes)["q_vec"] == "array<tinyint>"


def test_quantize_matches_python(spark):
    import math

    from dask_groupby_spark.operators.similarity import quantize_embeddings

    vec = [0.5, -1.0, 0.25, 0.9999]
    df = spark.createDataFrame([(0, vec)], "vec_id bigint, embedding array<float>")
    row = quantize_embeddings(df).collect()[0]
    import numpy as np

    f32 = [float(np.float32(x)) for x in vec]
    scale = max(abs(x) for x in f32) / 127
    want = [max(-127, min(127, math.floor(x / scale + 0.5))) for x in f32]
    assert list(row["q_vec"]) == want
    assert row["q_scale"] == pytest.approx(scale, rel=1e-12)


def test_quantize_16bit(spark):
    from dask_groupby_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame([(0, [1.0, -1.0])], "vec_id bigint, embedding array<float>")
    q = quantize_embeddings(df, bits=16)
    assert dict(q.dtypes)["q_vec"] == "array<smallint>"
    assert list(q.collect()[0]["q_vec"]) == [32767, -32767]
    with pytest.raises(ValueError, match="bits"):
        quantize_embeddings(df, bits=32)


# -------------------------------------------------- keeper quality + skew stats


def test_near_dedup_keep_by_quality(spark):
    from dask_groupby_spark.operators.dedup import near_deduplicate

    # docs 1,2,3 are near-identical; doc 2 has the best quality score.
    # doc 9 is unrelated and must survive regardless.
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base, 0.2),
        (2, base + " extra", 0.9),
        (3, base, 0.5),
        (9, "completely unrelated text about catalyst optimizer rule ordering", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, q double")
    kept_minid = sorted(
        r["doc_id"] for r in near_deduplicate(df, num_hashes=16, bands=8).collect()
    )
    assert kept_minid == [1, 9]
    kept_best = sorted(
        r["doc_id"]
        for r in near_deduplicate(df, num_hashes=16, bands=8, keep_by="q").collect()
    )
    assert kept_best == [2, 9]


def test_key_skew_stats(spark, skewed):
    from dask_groupby_spark.operators.selection import key_skew_stats

    left, _ = skewed  # key 0 has 500 rows, keys 1..19 one each
    out = key_skew_stats(left, "k", top=3).collect()
    assert [r["k"] for r in out] == [0, 1, 2]
    assert out[0]["n"] == 500
    assert out[0]["frac"] == pytest.approx(500 / 519)
    assert out[2]["cum_frac"] == pytest.approx(502 / 519)
    with pytest.raises(ValueError, match="at least one"):
        key_skew_stats(left)


# -------------------------------------------------------------- n-gram counts


def test_ngram_counts_matches_python(spark, tiny_docs):
    from dask_groupby_spark.operators.text import ngram_counts

    got = {
        r["ngram"]: r["cnt"] for r in ngram_counts(tiny_docs, n=2).collect()
    }
    texts = ["b a a c b a", "a b d", "a", ""]
    want = Counter(
        " ".join(t.split()[i : i + 2])
        for t in texts
        for i in range(len(t.split()) - 1)
    )
    assert got == dict(want)
    # unigram mode == vocab counts; short docs contribute nothing at n=3
    uni = {r["ngram"]: r["cnt"] for r in ngram_counts(tiny_docs, n=1).collect()}
    assert uni == {"a": 5, "b": 3, "c": 1, "d": 1}
    tri = {r["ngram"]: r["cnt"] for r in ngram_counts(tiny_docs, n=3).collect()}
    assert tri == Counter(
        " ".join(t.split()[i : i + 3])
        for t in texts
        for i in range(len(t.split()) - 2)
    )
    cut = {r["ngram"] for r in ngram_counts(tiny_docs, n=1, min_count=3).collect()}
    assert cut == {"a", "b"}


# --------------------------------------------------------- review-fix guards


def test_remove_repeated_segments_metachar_sep(spark):
    # sep must be treated literally even when it is a regex metachar
    from dask_groupby_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame(
        [(0, "alpha. beta. alpha. gamma")], "doc_id bigint, text string"
    )
    row = remove_repeated_segments(df, sep=". ").collect()[0]
    assert row["text"] == "alpha. beta. gamma"
    row = remove_repeated_segments(
        spark.createDataFrame([(0, "x|y|x")], "doc_id bigint, text string"),
        sep="|",
    ).collect()[0]
    assert row["text"] == "x|y"


def test_quantize_null_elements_propagate(spark):
    from dask_groupby_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(0, [0.5, None, -0.25])], "vec_id bigint, embedding array<float>"
    )
    row = quantize_embeddings(df).collect()[0]
    assert row["q_vec"][1] is None  # NOT +127
    assert row["q_vec"][0] == 127 and row["q_vec"][2] == -63
    back = dequantize_embeddings(quantize_embeddings(df), out="r").collect()[0]
    assert back["r"][1] is None


def test_save_table_sort_by_with_partition_by(spark, tmp_path):
    # sort_by clustering must survive a partitioned write
    import glob

    import pyarrow.parquet as pq

    from dask_groupby_spark.sources import save_table

    df = (
        spark.range(0, 100_000)
        .select(
            (F.col("id") % 2).alias("p"),
            (F.col("id") * 48271 % 100_000).alias("k"),
        )
        .coalesce(1)
    )
    path = str(tmp_path / "psorted")
    save_table(
        df, path, partition_by=("p",), sort_by=("k",),
        **{"parquet.block.size": "65536"},
    )
    for part in glob.glob(f"{path}/p=*/part-*.parquet"):
        md = pq.ParquetFile(part).metadata
        spans = sorted(
            (
                md.row_group(i).column(0).statistics.min,
                md.row_group(i).column(0).statistics.max,
            )
            for i in range(md.num_row_groups)
        )
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2  # clustered within each partition file


# -------------------------------------------------------------- table profile


def test_table_profile_exact(spark):
    from dask_groupby_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a", 1.5, [1]), (2, "b", None, [2]), (2, None, 3.5, None)],
        "i bigint, s string, x double, arr array<int>",
    )
    got = {
        r["column"]: (r["n_nonnull"], r["n_distinct"], r["min"], r["max"])
        for r in table_profile(df, exact_distinct=True).collect()
    }
    assert got["i"] == (3, 2, "1", "2")
    assert got["s"] == (2, 2, "a", "b")
    assert got["x"] == (2, 2, "1.5", "3.5")
    assert got["arr"][:2] == (2, 2) and got["arr"][2] is None


def test_table_profile_single_pass(spark):
    # ONE aggregate over one scan: a single pair of HashAggregates and no
    # per-column re-scan (one 'Scan' node in the plan)
    from dask_groupby_spark.operators.profile import table_profile
    from dask_groupby_spark.plans import physical_plan
    from dask_groupby_spark.sources import load_table

    import re

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    out = table_profile(li, columns=["l_orderkey", "l_quantity"])
    plan = physical_plan(out)
    # exactly one numbered Scan node in the formatted plan details
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert out.count() == 2


def test_quantized_retrieval_recall(spark):
    """int8 codes must preserve cosine neighborhoods: top-3 neighbors from
    dequantized vectors overlap >=2/3 with full-precision top-3 for every
    query — the 'recall loss <1-few %' claim behind the 4x shrink."""
    import numpy as np

    from dask_groupby_spark.operators.similarity import (
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(32)]) for i in range(200)]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    recon = dequantize_embeddings(quantize_embeddings(emb)).select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=3)
    approx = cosine_topk(recon, queries, k=3)

    def nbrs(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = nbrs(exact), nbrs(approx)
    for qid in e:
        assert len(e[qid] & a[qid]) >= 2, (qid, e[qid], a[qid])


# -------------------------------------------------------------------- k-means


def test_kmeans_matches_numpy_lloyd(spark):
    """kmeans_fit/assign vs a numpy spherical-Lloyd reference with the
    same deterministic seeding (k lowest-id vectors) and tie rules."""
    import numpy as np

    from dask_groupby_spark.operators.similarity import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(5)
    X = rng.randn(60, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    )
    X = np.array([[float(np.float32(v)) for v in row] for row in X])
    k, iters = 4, 3

    def assign(Xn, C):
        sims = (Xn / np.linalg.norm(Xn, axis=1, keepdims=True)) @ (
            C / np.linalg.norm(C, axis=1, keepdims=True)
        ).T
        return sims.argmax(axis=1)  # argmax ties -> lowest index, same rule

    C = X[:k].copy()
    cells = list(range(k))
    for _ in range(iters):
        a = assign(X, C)
        for j in range(k):
            m = X[a == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / np.linalg.norm(c)

    cents = kmeans_fit(df, k=k, iters=iters)
    got_C = np.array([c["cv"] for c in cents])
    assert np.allclose(got_C, C, atol=1e-6)
    got_assign = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, cents).collect()
    }
    want = assign(X, C)
    assert all(got_assign[i] == cells[want[i]] for i in range(60))


def test_kmeans_assign_zero_exchange(spark):
    from dask_groupby_spark.operators.similarity import kmeans_assign, kmeans_fit
    from dask_groupby_spark.plans import count_exchanges
    from dask_groupby_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit(emb, k=4, iters=1)
    assert count_exchanges(kmeans_assign(emb, cents)) == 0


# ------------------------------------------------------------------------ BPE


def py_bpe_train(word_counts, num_merges, min_pair_count=2):
    """pure-python reference BPE (Sennrich et al.): same tie rules."""
    syms = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_reference(spark):
    from dask_groupby_spark.operators.bpe import bpe_encode, bpe_train

    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "wide wider widest low new",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    wc = Counter(t for x in texts for t in x.split())
    want_merges, want_syms = py_bpe_train(wc, num_merges=12)
    got_merges = bpe_train(df, num_merges=12)
    assert got_merges == want_merges

    enc = {
        r["doc_id"]: r["bpe_pieces"]
        for r in bpe_encode(df, got_merges).collect()
    }
    for i, t in enumerate(texts):
        want = [p for w in t.split() for p in want_syms[w]]
        assert enc[i] == want


def test_bpe_early_stop_and_encode_oov(spark):
    from dask_groupby_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(0, "ab ab cd")], "doc_id bigint, text string"
    )
    # only ('a','b') reaches min_pair_count=2; training stops early
    merges = bpe_train(df, num_merges=50)
    assert merges[0] == ("a", "b")
    assert len(merges) < 50
    # OOV word at encode time falls back to chars + learned merges
    oov = spark.createDataFrame([(1, "abx")], "doc_id bigint, text string")
    enc = bpe_encode(oov, merges).collect()[0]["bpe_pieces"]
    assert enc[0] == "ab" and enc[-1] == "</w>"


def test_bpe_local_and_distributed_paths_identical(spark):
    from dask_groupby_spark.operators.bpe import bpe_train

    texts = ["low low lower lowest", "new newer newest", "wide low new new"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    local = bpe_train(df, num_merges=10)  # word table tiny -> local path
    distributed = bpe_train(df, num_merges=10, collect_threshold=0)
    assert local == distributed and len(local) == 10


def test_bpe_incremental_matches_scratch_reference(spark):
    """The incremental pair-count trainers (inverted-index local tier,
    delta-table distributed tier) must produce the SAME merge list as the
    recompute-from-scratch reference at a scale where stale index entries
    and zero-count purges would show: 60 random words, merges run to
    exhaustion (min_pair_count floor)."""
    import random

    from dask_groupby_spark.operators.bpe import _train_local, bpe_train

    rng = random.Random(99)
    vocab = [
        "".join(rng.choice("abcde") for _ in range(rng.randrange(2, 9)))
        for _ in range(60)
    ]
    wc = Counter(rng.choice(vocab) for _ in range(800))
    want, _ = py_bpe_train(wc, num_merges=200, min_pair_count=2)
    assert 20 < len(want) < 200  # exhaustion actually hit
    assert _train_local(dict(wc), 200, 2) == want

    rows = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = bpe_train(df, num_merges=40, collect_threshold=0)
    assert got == want[:40]
    # pure DataFrame pair-table tier (driver dict disabled) — identical
    got_df_tier = bpe_train(
        df, num_merges=15, collect_threshold=0, pair_collect_threshold=0
    )
    assert got_df_tier == want[:15]


def test_bpe_pair_table_spill_mid_run(spark):
    """Driver pair dict outgrows pair_collect_threshold mid-run and spills
    to the DataFrame tier: 'aaaa'+'ba' has 3 pair types, merging (a,a)
    grows it to 4 — the merge list must be unaffected."""
    from dask_groupby_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa ba ba")], "doc_id bigint, text string"
    )
    wc = Counter("aaaa aaaa aaaa ba ba".split())
    want, _ = py_bpe_train(wc, num_merges=10, min_pair_count=1)
    got = bpe_train(
        df, num_merges=10, min_pair_count=1, collect_threshold=0,
        pair_collect_threshold=3,
    )
    assert got == want


# ----------------------------------------------- r7 deep-review regressions


def test_blas_topk_zero_norm_and_string_ids(spark):
    """Zero-norm vectors are excluded (NaN used to rank FIRST under desc);
    non-integer ids work (used to crash on the int64 hardcode)."""
    from dask_groupby_spark.operators.similarity import cosine_topk_blas

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("z", [0.0, 0.0]), ("b", [0.9, 0.1])],
        "vec_id string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0]), ("q0", [0.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    rows = cosine_topk_blas(corpus, queries, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # zero-norm corpus vector never appears; zero-norm query emits nothing
    assert all(r["neighbor_id"] != "z" for r in rows)
    assert "q0" not in by_q
    got = [(r["rank"], r["neighbor_id"]) for r in sorted(by_q["q1"], key=lambda r: r["rank"])]
    assert got == [(1, "a"), (2, "b")]
    assert all(r["cosine"] == r["cosine"] for r in rows)  # no NaN leaked


def test_lsh_and_ivf_exclude_self_flag(spark):
    """exclude_self=False keeps same-id pairs — required when query ids
    are unrelated to corpus ids (an id collision used to silently drop a
    legitimate neighbor with no way to disable)."""
    from dask_groupby_spark.operators.similarity import ivf_topk, lsh_bucketed_topk

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0, 0.0]), (8, [0.0, 1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    # query id 7 is UNRELATED to corpus id 7 but collides
    queries = spark.createDataFrame(
        [(7, [1.0, 0.05, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    for fn, kw in ((lsh_bucketed_topk, {"dim": 4, "n_planes": 1}),
                   (ivf_topk, {"n_cells": 1, "nprobe": 1})):
        dropped = fn(corpus, queries, k=1, **kw).collect()
        kept = fn(corpus, queries, k=1, exclude_self=False, **kw).collect()
        assert all(r["neighbor_id"] != 7 for r in dropped), fn.__name__
        assert [r["neighbor_id"] for r in kept] == [7], fn.__name__


def test_pca_project_null_and_ragged_rows(spark):
    from dask_groupby_spark.operators.similarity import embedding_pca, pca_project

    good = [(i, [float(i), float(i % 3), 1.0]) for i in range(20)]
    df = spark.createDataFrame(good, "vec_id bigint, embedding array<double>")
    model = embedding_pca(df, k=2)
    dirty = spark.createDataFrame(
        good + [(100, None), (101, [1.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = {r["vec_id"]: r["pca"] for r in pca_project(dirty, model).collect()}
    assert out[100] is None and out[101] is None
    assert out[0] is not None and len(out[0]) == 2


def test_group_centroids_normalize_unit_norm(spark):
    import math

    from dask_groupby_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [("g", [3.0, 0.0]), ("g", [0.0, 4.0])], "k string, embedding array<double>"
    )
    row = group_centroids(df, "k", normalize=True).collect()[0]
    n = math.sqrt(sum(v * v for v in row["centroid"]))
    assert abs(n - 1.0) < 1e-12


def test_out_column_collision_guards(spark):
    """r7 review: an `out` name colliding with an existing column must
    raise instead of silently emitting duplicate column names."""
    from dask_groupby_spark.core import groupby_rank
    from dask_groupby_spark.operators.curate import redact_pii
    from dask_groupby_spark.operators.text import remove_repeated_segments

    df = spark.createDataFrame(
        [(1, "a@b.co x", "clash")], "id bigint, text string, scrubbed string"
    )
    with pytest.raises(ValueError, match="collides"):
        redact_pii(df, out="scrubbed")
    with pytest.raises(ValueError, match="collides"):
        remove_repeated_segments(df, out="scrubbed")
    rdf = spark.createDataFrame([(1, 2.0, 0.5)], "k bigint, v double, __dr double")
    with pytest.raises(ValueError, match="__dr"):
        groupby_rank(rdf, "k", value="v", method="dense", pct=True)


def test_tokens_col_reuse_identical(spark):
    """tokens_col= reuses a pre-tokenized column — identical results to
    each operator tokenizing on its own (r7: composed pipelines paid one
    regex split per operator; gopher paid one per RULE)."""
    from dask_groupby_spark.operators.text import (
        add_text_features,
        gopher_quality_flags,
        language_id,
        tokens,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "der hund und die katze"), (3, "")],
        "doc_id bigint, text string",
    )
    pre = df.withColumn("tk", tokens(F.col("text")))
    for fn in (add_text_features, language_id, gopher_quality_flags):
        a = fn(df).drop("tk").orderBy("doc_id").collect()
        b = fn(pre, tokens_col="tk").drop("tk").orderBy("doc_id").collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b], fn.__name__


def test_dsir_log_weights_matches_python_reference(spark):
    """DSIR (Xie et al. 2023) importance weights: exact python mirror of
    the hashed-bigram profile arithmetic with the portable hasher, plus
    the semantic sanity check — target-like documents score higher."""
    import hashlib
    import math

    from dask_groupby_spark.operators import dsir_log_weights

    def phash(s, seed="dsir"):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    def grams(text, n=2):
        t = [x for x in text.split(" ") if x]
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]

    dim, alpha = 64, 1.0
    target_rows = ["spark sql spark sql engine", "sql engine plans"]
    corpus_rows = [
        (0, "spark sql engine"),          # target-like
        (1, "cats purr and dogs bark"),   # off-target
        (2, "sql engine plans spark"),    # target-like
        (3, ""),                          # no bigrams -> 0.0
        (4, None),                        # NULL text -> NULL
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    target = spark.createDataFrame([(t,) for t in target_rows], "text string")
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(
            corpus, target, n=2, dim=dim, alpha=alpha, hasher="portable"
        ).collect()
    }
    # python mirror
    tprof, rprof = {}, {}
    for t in target_rows:
        for g in grams(t):
            b = phash(g) % dim
            tprof[b] = tprof.get(b, 0) + 1
    for _, t in corpus_rows:
        if t is None:
            continue
        for g in grams(t):
            b = phash(g) % dim
            rprof[b] = rprof.get(b, 0) + 1
    t_tot = sum(tprof.values()) + alpha * dim
    r_tot = sum(rprof.values()) + alpha * dim

    def logw(text):
        return sum(
            math.log((tprof.get(phash(g) % dim, 0) + alpha) / t_tot)
            - math.log((rprof.get(phash(g) % dim, 0) + alpha) / r_tot)
            for g in grams(text)
        )

    for i, t in corpus_rows:
        if t is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(logw(t), abs=1e-9), (i, t)
    assert got[3] == 0.0
    # semantics: target-like docs outweigh the off-target one
    assert min(got[0], got[2]) > got[1]


def test_dsir_validation(spark):
    from dask_groupby_spark.operators import dsir_log_weights

    df = spark.createDataFrame([("x y",)], "text string")
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, dim=1)
    with pytest.raises(ValueError):
        dsir_log_weights(df, df, alpha=0.0)
