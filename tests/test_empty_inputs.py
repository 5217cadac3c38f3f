"""Zero-row inputs across the r8/r9 operator family: every operator must
return a ZERO-ROW frame with its normal schema (the driver smoke check's
stable-schema contract), not raise from a scalar collect / empty
aggregate.  The r8 discipline was NULL-group consistency; the r9 sibling
audit is the empty-relation edge — the first thing a user hits when a
filter upstream matches nothing.
"""

from pyspark.sql import functions as F


def _empty_like(spark, schema: str):
    return spark.createDataFrame([], schema)


def test_funnel_retention_empty(spark):
    from dask_groupby_spark.operators.funnel import funnel_conversion, retention

    ev = _empty_like(spark, "user_id bigint, event_type string, ts timestamp")
    out = funnel_conversion(
        ev, ["view", "click", "purchase"],
        entity_col="user_id", type_col="event_type", ts_col="ts",
    )
    rows = out.collect()
    # funnel may emit its step spine over nothing: then 0 entities per step
    assert rows == [] or [r["n_entities"] for r in rows] == [0, 0, 0]
    assert retention(ev, entity_col="user_id", ts_col="ts", period="week",
                     horizon=4).collect() == []


def test_kmv_empty(spark):
    from dask_groupby_spark.operators import kmv_distinct, kmv_overlap, kmv_sketch_table

    ev = _empty_like(spark, "g string, v bigint")
    assert kmv_distinct(ev, "g", value="v", k=64).collect() == []
    sk = kmv_sketch_table(ev, "g", value="v", k=64)
    assert sk.collect() == []
    assert kmv_overlap(sk, group_col="g", k=64).collect() == []
    assert kmv_sketch_table(ev, "g", value="v", k=64, method="partial").collect() == []


def test_linear_family_empty(spark):
    from dask_groupby_spark.operators import grouped_linreg, target_encode

    li = _empty_like(spark, "g string, x double, y double")
    assert grouped_linreg(li, "g", features=["x"], label="y").collect() == []
    te = target_encode(li, "g", label="y")
    assert te.collect() == []
    assert te.schema["te"].dataType.typeName() == "double"
    # all-NULL labels: prior undefined -> NULL encodings, stable schema
    li2 = spark.createDataFrame([("a", 1.0, None)], "g string, x double, y double")
    assert target_encode(li2, "g", label="y").collect()[0]["te"] is None


def test_qcut_empty(spark):
    from dask_groupby_spark import quantile_bins

    df = _empty_like(spark, "g string, x double")
    assert quantile_bins(df, "x", q=4).collect() == []
    assert quantile_bins(df, "x", q=4, by="g").collect() == []
    assert quantile_bins(df, "x", q=4, by="g", method="two_pass").collect() == []


def test_dedup_text_empty(spark):
    from dask_groupby_spark.operators import edit_distance_pairs
    from dask_groupby_spark.operators.dedup import ngram_jaccard_pairs
    from dask_groupby_spark.operators.text import dsir_log_weights

    docs = _empty_like(spark, "doc_id bigint, text string")
    assert edit_distance_pairs(docs).collect() == []
    assert edit_distance_pairs(docs, prefix_blocking=True).collect() == []
    assert ngram_jaccard_pairs(
        docs, "doc_id", "text", k=2, threshold=0.5, metric="containment"
    ).collect() == []
    # DSIR: profiles built over an empty corpus and target -> empty weights
    assert dsir_log_weights(docs, docs).collect() == []


def test_k_anonymity_json_empty(spark):
    from dask_groupby_spark.operators import k_anonymity
    from dask_groupby_spark.sources import extract_json_fields

    df = _empty_like(spark, "a string, b string, payload string")
    # k_anonymity is a one-row SUMMARY: over nothing it must render
    # zeros and vacuous truth, not a row of NULLs
    row = k_anonymity(df, ["a", "b"], k=2).collect()[0]
    assert (row["n_rows"], row["n_groups"], row["n_violating_groups"],
            row["n_violating_rows"], row["k_anon"]) == (0, 0, 0, 0, True)
    assert row["min_group_size"] is None  # no smallest group exists
    # the sample view over nothing is empty
    assert k_anonymity(df, ["a", "b"], k=2, sample_groups=5).collect() == []
    assert extract_json_fields(df, "payload", {"x": ("$.x", "bigint")}).collect() == []


def test_ann_recall_empty(spark):
    from dask_groupby_spark.operators import ann_recall
    from dask_groupby_spark.operators.similarity import cosine_topk

    emb = _empty_like(spark, "vec_id bigint, embedding array<double>")
    exact = cosine_topk(emb, emb, k=3)
    assert ann_recall(exact, exact).collect() == []
