"""r7 hypothesis parity sweep: randomized inputs against the PANDAS
reference semantics each operator's docstring claims — merge_asof for the
as-of join, GroupBy.rolling for rolling aggregates, and the inverted-CDF
definition for weighted quantiles.  Same one-collect-per-example
discipline as test_hypothesis.py.
"""

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_groupby_spark.operators.joins import asof_join
from dask_groupby_spark.operators.weighted import weighted_quantile
from dask_groupby_spark.rolling import groupby_rolling

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_tables(draw):
    # DISTINCT timestamps within each side of a key: equal-ts tie order
    # between engines is a convention, not a semantic, so we generate
    # tie-free inputs and let direction/tolerance carry the test
    nl = draw(st.integers(1, 15))
    nr = draw(st.integers(0, 15))
    keys_l = draw(st.lists(st.integers(0, 2), min_size=nl, max_size=nl))
    keys_r = draw(st.lists(st.integers(0, 2), min_size=nr, max_size=nr))
    ts_pool = draw(st.permutations(list(range(200))))
    left = [(k, float(ts_pool[i]), float(i)) for i, k in enumerate(keys_l)]
    right = [
        (k, float(ts_pool[nl + j]), float(100 + j)) for j, k in enumerate(keys_r)
    ]
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tolerance = draw(st.one_of(st.none(), st.floats(1.0, 50.0, allow_nan=False)))
    return left, right, direction, tolerance


@settings(**_SETTINGS)
@given(data=asof_tables())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    left, right, direction, tolerance = data
    ldf = spark.createDataFrame(left, "k bigint, ts double, lv double")
    rdf = spark.createDataFrame(right, "k bigint, ts double, rv double")
    got = asof_join(
        ldf, rdf, on="ts", by=["k"], direction=direction, tolerance=tolerance,
        right_cols=["rv"],
    ).collect()
    lp = pd.DataFrame(left, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values("ts")
    if len(rp):
        exp = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=tolerance,
        )
        exp_map = {row.lv: row.rv for row in exp.itertuples()}
    else:
        exp_map = {row.lv: float("nan") for row in lp.itertuples()}
    assert len(got) == len(left)
    for r in got:
        e = exp_map[r["lv"]]
        g = r["rv_right"]
        if g is None:
            assert isinstance(e, float) and math.isnan(e), (r, e)
        else:
            assert not math.isnan(e) and g == e, (r, e)


@st.composite
def rolling_data(draw):
    n = draw(st.integers(1, 30))
    labels = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e5, 1e5, allow_nan=False), st.just(float("nan"))
            ),
            min_size=n,
            max_size=n,
        )
    )
    window = draw(st.integers(1, 6))
    min_periods = draw(st.integers(1, min(3, window)))  # pandas needs mp <= window
    return labels, vals, window, min_periods


@settings(**_SETTINGS)
@given(data=rolling_data())
def test_rolling_matches_pandas(spark, data):
    labels, vals, window, min_periods = data
    rows = [
        (int(i), int(l), float(v)) for i, (l, v) in enumerate(zip(labels, vals))
    ]
    df = spark.createDataFrame(rows, "idx bigint, label bigint, val double")
    funcs = ["sum", "mean", "min", "max", "var"]
    got = {
        r["idx"]: r
        for r in groupby_rolling(
            df, "label", funcs=funcs, value="val", idx_col="idx",
            window=window, min_periods=min_periods,
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["idx", "label", "val"]).set_index("idx")
    roll = pdf.groupby("label")["val"].rolling(window, min_periods=min_periods)
    exp = {
        "sum": roll.sum(), "mean": roll.mean(), "min": roll.min(),
        "max": roll.max(),
    }
    for f in ["sum", "mean", "min", "max"]:
        for (_, idx), e in exp[f].items():
            g = got[idx][f"rolling_{f}"]
            if isinstance(e, float) and math.isnan(e):
                assert math.isnan(g), (f, idx, g)
            else:
                assert abs(g - e) <= 1e-6 * max(1.0, abs(e)), (f, idx, g, e)
    # var: numpy TWO-PASS truth with a conditioning-aware tolerance —
    # pandas' own online rolling var drifts by the same one-pass class
    # (soak caught pandas at 0.5000019 vs our shifted-moment 0.5), so a
    # strict pandas compare tests nothing.  Both engines' one-pass error
    # scales with eps * n * (max |x - group_mean| in window)^2.
    for lab, g in pdf.groupby("label"):
        vs = g["val"].to_numpy()
        gmean = float(np.nanmean(vs)) if not np.all(np.isnan(vs)) else 0.0
        idxs = g.index.to_list()
        for i, idx in enumerate(idxs):
            w = vs[max(0, i - window + 1) : i + 1]
            valid = w[~np.isnan(w)]
            gv = got[idx]["rolling_var"]
            if len(valid) < max(min_periods, 2):
                assert math.isnan(gv), (idx, gv)
                continue
            truth = float(np.var(valid, ddof=1))
            c2 = float(np.max((valid - gmean) ** 2))
            tol = 1e-13 * len(valid) * max(1.0, c2) + 1e-9
            assert abs(gv - truth) <= tol, (idx, gv, truth, tol)


@st.composite
def wq_data(draw):
    n = draw(st.integers(1, 30))
    labels = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    vals = draw(
        st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=n, max_size=n)
    )
    ws = draw(st.lists(st.floats(0.0, 10.0, allow_nan=False), min_size=n, max_size=n))
    qs = draw(
        st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=3)
    )
    return labels, vals, ws, qs


@settings(**_SETTINGS)
@given(data=wq_data())
def test_weighted_quantile_matches_python_inverted_cdf(spark, data):
    labels, vals, ws, qs = data
    rows = [
        (int(l), float(v), float(w)) for l, v, w in zip(labels, vals, ws)
    ]
    df = spark.createDataFrame(rows, "label bigint, val double, w double")
    out = weighted_quantile(df, "label", value="val", weight="w", q=qs)
    got = {r["label"]: r for r in out.collect()}

    ref: dict = {}
    for l, v, w in rows:
        if w > 0:
            ref.setdefault(l, []).append((v, w))
    for lab, pairs in ref.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        for q in qs:
            target = q * tot
            cum, ans = 0.0, None
            for v, w in pairs:
                cum += w
                if cum >= target:
                    ans = v
                    break
            name = f"wq_{float(q)}".replace(".", "_")
            g = got[lab][name]
            assert g == ans, (lab, q, g, ans)


@st.composite
def rank_data(draw):
    n = draw(st.integers(1, 25))
    labels = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    # small integer value pool forces plenty of ties
    vals = draw(
        st.lists(
            st.one_of(st.integers(0, 5).map(float), st.just(float("nan"))),
            min_size=n,
            max_size=n,
        )
    )
    method = draw(st.sampled_from(["average", "min", "max", "dense", "first"]))
    ascending = draw(st.booleans())
    pct = draw(st.booleans())
    return labels, vals, method, ascending, pct


@settings(**_SETTINGS)
@given(data=rank_data())
def test_groupby_rank_matches_pandas(spark, data):
    from dask_groupby_spark.core import groupby_rank

    labels, vals, method, ascending, pct = data
    rows = [
        (int(i), int(l), float(v)) for i, (l, v) in enumerate(zip(labels, vals))
    ]
    df = spark.createDataFrame(rows, "idx bigint, label bigint, val double")
    got = {
        r["idx"]: r["rank"]
        for r in groupby_rank(
            df, "label", value="val", method=method, ascending=ascending,
            pct=pct, idx_col="idx",
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["idx", "label", "val"]).set_index("idx")
    exp = pdf.groupby("label")["val"].rank(
        method=method, ascending=ascending, pct=pct, na_option="keep"
    )
    for idx, e in exp.items():
        g = got[idx]
        if isinstance(e, float) and math.isnan(e):
            assert g is None, (idx, g)
        else:
            assert g is not None and abs(float(g) - e) <= 1e-9, (idx, g, e)


@st.composite
def interp_data(draw):
    n = draw(st.integers(1, 25))
    labels = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    xs = draw(st.permutations(list(range(100)))).__getitem__(slice(n))
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e4, 1e4, allow_nan=False), st.just(float("nan"))
            ),
            min_size=n,
            max_size=n,
        )
    )
    return labels, xs, vals


@settings(**_SETTINGS)
@given(data=interp_data())
def test_groupby_interpolate_matches_pandas(spark, data):
    from dask_groupby_spark.core import groupby_interpolate

    labels, xs, vals = data
    rows = [
        (int(l), float(x), float(v)) for l, x, v in zip(labels, xs, vals)
    ]
    df = spark.createDataFrame(rows, "label bigint, x double, val double")
    got = {
        (r["label"], r["x"]): r["interp"]
        for r in groupby_interpolate(
            df, "label", value="val", order_by="x", out="interp"
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["label", "x", "val"])
    for lab, g in pdf.groupby("label"):
        g = g.sort_values("x").set_index("x")
        # pandas interpolate fills trailing gaps too (ffill tail); the
        # engine leaves one-sided gaps missing — mirror by masking where
        # no later valid value exists
        e = g["val"].interpolate(method="index", limit_area="inside")
        for x, ev in e.items():
            gv = got[(lab, x)]
            if isinstance(ev, float) and math.isnan(ev):
                assert gv is None or math.isnan(gv), (lab, x, gv)
            else:
                assert gv is not None and abs(gv - ev) <= 1e-9 * max(1.0, abs(ev)), (
                    lab, x, gv, ev,
                )


@st.composite
def interval_tables(draw):
    nl = draw(st.integers(1, 12))
    nr = draw(st.integers(1, 12))

    def intervals(n, tag):
        out = []
        for i in range(n):
            s = draw(st.floats(0.0, 100.0, allow_nan=False))
            length = draw(st.floats(0.0, 30.0, allow_nan=False))
            k = draw(st.integers(0, 1))
            out.append((k, float(s), float(s + length), float(tag + i)))
        return out

    left = intervals(nl, 0)
    right = intervals(nr, 100)
    width = draw(st.sampled_from([1.0, 7.0, 24.0, 150.0]))
    return left, right, width


@settings(**_SETTINGS)
@given(data=interval_tables())
def test_interval_overlap_join_matches_naive_predicate(spark, data):
    """The grid decomposition must produce every overlapping pair EXACTLY
    once at ANY bucket width — intervals spanning many buckets co-occur in
    each shared bucket and must dedup to one output row."""
    from dask_groupby_spark.operators.joins import interval_overlap_join

    left, right, width = data
    ldf = spark.createDataFrame(left, "k bigint, s double, e double, lid double")
    rdf = spark.createDataFrame(right, "k bigint, s double, e double, rid double")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "s", "e", "s", "e", by=["k"], bucket_width=width
        ).collect()
    )
    exp = sorted(
        (l[3], r[3])
        for l in left
        for r in right
        if l[0] == r[0] and l[1] <= r[2] and r[1] <= l[2]
    )
    assert got == exp


@st.composite
def jaccard_corpus(draw):
    n_docs = draw(st.integers(2, 10))
    vocab = ["a", "b", "c", "d"]
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 10))
        toks = [draw(st.sampled_from(vocab)) for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    k = draw(st.integers(1, 3))
    threshold = draw(st.sampled_from([0.0, 0.3, 0.7]))
    max_df = draw(st.one_of(st.none(), st.integers(1, 6)))
    return docs, k, threshold, max_df


@settings(**_SETTINGS)
@given(data=jaccard_corpus())
def test_ngram_jaccard_matches_python_reference(spark, data):
    """Exact Jaccard (and the max_shingle_df stop-shingle variant: both
    intersections AND set sizes over the surviving shingle space) against
    a direct python computation."""
    from dask_groupby_spark.operators.dedup import ngram_jaccard_pairs

    docs, k, threshold, max_df = data
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = ngram_jaccard_pairs(
        df, k=k, threshold=threshold, max_shingle_df=max_df
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()
    }
    if hasattr(out, "ngram_shingle_buckets"):
        out.ngram_shingle_buckets.unpersist()

    def shingles(text):
        toks = [t for t in text.split(" ") if t]
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }

    sets = {i: shingles(t) for i, t in docs}
    sets = {i: s for i, s in sets.items() if s}
    if max_df is not None:
        from collections import Counter

        dfreq = Counter(sh for s in sets.values() for sh in s)
        sets = {
            i: {sh for sh in s if dfreq[sh] <= max_df} for i, s in sets.items()
        }
    exp = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue  # candidates require >= 1 shared shingle
            j = inter / len(sets[a] | sets[b])
            if j >= threshold:
                exp[(a, b)] = j
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for pair, j in exp.items():
        assert abs(got[pair] - j) <= 1e-9, (pair, got[pair], j)


@st.composite
def paragraph_corpus(draw):
    n_docs = draw(st.integers(1, 8))
    paras = ["alpha", "beta beta", "GAMMA", " alpha ", "", "x"]
    docs = []
    for i in range(n_docs):
        n_seg = draw(st.integers(0, 5))
        segs = [draw(st.sampled_from(paras)) for _ in range(n_seg)]
        docs.append((i, "\n".join(segs)))
    normalize = draw(st.booleans())
    min_len = draw(st.sampled_from([0, 2]))
    return docs, normalize, min_len


@settings(**_SETTINGS)
@given(data=paragraph_corpus())
def test_dedup_paragraphs_matches_python_reference(spark, data):
    """Cross-document paragraph dedup vs a direct python walk: global
    (doc_id, pos) first-occurrence order, min_len/empty exemptions, and
    the normalize=True whitespace-collapsed-lowercase fingerprint."""
    import re as _re

    from dask_groupby_spark.operators.dedup import dedup_paragraphs

    docs, normalize, min_len = data
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(
            df, normalize=normalize, min_len=min_len
        ).collect()
    }

    def fp(seg):
        return _re.sub(r"\s+", " ", seg.strip()).lower() if normalize else seg

    seen = set()
    exp = {}
    for i, text in docs:  # doc_id order == generation order
        kept = []
        for seg in text.split("\n"):
            if len(seg) < max(min_len, 1):
                kept.append(seg)
                continue
            f = fp(seg)
            if f not in seen:
                seen.add(f)
                kept.append(seg)
        exp[i] = "\n".join(kept)
    assert got == exp


@settings(**_SETTINGS)
@given(data=wq_data())
def test_weighted_quantile_sketch_error_bound(spark, data):
    """The histogram sketch's answer must sit within half a bucket width
    of the exact inverted-CDF answer (the documented value-space bound),
    for every group and every q."""
    from dask_groupby_spark.operators.weighted import (
        weighted_quantile,
        weighted_quantile_sketch,
    )

    labels, vals, ws, qs = data
    rows = [(int(l), float(v), float(w)) for l, v, w in zip(labels, vals, ws)]
    df = spark.createDataFrame(rows, "label bigint, val double, w double")
    bins = 64
    exact = {r["label"]: r for r in weighted_quantile(
        df, "label", value="val", weight="w", q=qs).collect()}
    sk = {r["label"]: r for r in weighted_quantile_sketch(
        df, "label", value="val", weight="w", q=qs, bins=bins).collect()}
    spans = {}
    for l, v, w in rows:
        if w > 0:
            lo, hi = spans.get(l, (v, v))
            spans[l] = (min(lo, v), max(hi, v))
    for lab, er in exact.items():
        half = (spans[lab][1] - spans[lab][0]) / bins / 2 if lab in spans else 0.0
        for q in qs:
            name = f"wq_{float(q)}".replace(".", "_")
            e, s = er[name], sk[lab][name]
            if e is None:
                assert s is None, (lab, q, s)
            else:
                assert s is not None and abs(s - e) <= half + 1e-9, (
                    lab, q, s, e, half,
                )
