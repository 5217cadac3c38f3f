"""Full-pipeline composition test: raw documents -> validation gate ->
paragraph dedup -> near-dedup -> quality scoring -> quantile
normalization -> mixture resampling -> sequence packing, with drift and
diff audits on the result — every stage a real operator from this
package, asserting the stages COMPOSE (schemas line up, invariants
hold), not just that each works in isolation."""

import pytest

from pyspark.sql import functions as F

from dask_groupby_spark.operators import (
    add_text_features,
    check_rules,
    check_unique,
    dedup_paragraphs,
    near_deduplicate,
    quantile_normalize,
    table_diff,
)
from dask_groupby_spark.operators.curate import mixture_sample, pack_sequences
from dask_groupby_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw(spark):
    docs = load_table(spark, SF, "documents")
    # salt in realistic dirt: shared boilerplate paragraph + two exact dups
    dirty = docs.select(
        "doc_id", "lang", "source",
        F.concat(F.lit("SHARED COOKIE BANNER\n"), F.col("text")).alias("text"),
    )
    clones = dirty.where(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "lang", "source", "text"
    )
    return dirty.unionByName(clones)


def test_full_pipeline_composes(spark, raw):
    n0 = raw.count()

    # 1. quality gate: counts only, no crash mid-write
    gate = {r["rule"]: r for r in check_rules(raw, {
        "nonempty": F.length("text") > 0,
        "has_id": F.col("doc_id").isNotNull(),
    }).collect()}
    assert gate["nonempty"]["n_violations"] == 0
    assert check_unique(raw, "doc_id").collect()[0]["n_dup_keys"] == 0

    # 2. corpus-wide paragraph dedup: the banner survives in ONE doc
    para = dedup_paragraphs(raw, min_len=3)
    keep_banner = para.where(F.col("text").contains("COOKIE BANNER")).count()
    assert keep_banner == 1
    assert para.count() == n0          # docs retained as rows

    # 3. near-dedup: the two clones collapse onto their originals
    deduped = near_deduplicate(
        para.select("doc_id", "text", "lang", "source"),
        id_col="doc_id", text_col="text", num_hashes=32, bands=8,
    )
    assert deduped.count() <= n0 - 2

    # 4. quality features + per-source score harmonization
    scored = add_text_features(deduped, text_col="text")
    assert "n_tokens" in scored.columns or len(scored.columns) > 4
    qcol = [c for c in scored.columns if "token" in c or "quality" in c][0]
    harmonized = quantile_normalize(scored, "source", qcol)
    assert harmonized.count() == deduped.count()

    # 5. mixture + packing produce trainer-ready examples
    mixed = mixture_sample(harmonized, {"web": 1.0}, strata_col="source",
                           default_rate=1.0, id_col="doc_id")
    packed = pack_sequences(
        mixed.select("doc_id", "source", F.col(qcol).cast("bigint").alias("n_tok")),
        "source", size_col="n_tok", order_col="doc_id", capacity=4096,
    )
    assert packed.count() == mixed.count()           # every doc assigned a bin
    over = packed.groupBy("source", "bin_id").agg(F.sum("n_tok").alias("s"))
    max_tok = mixed.agg(F.max(F.col(qcol).cast("bigint"))).collect()[0][0]
    assert over.where(F.col("s") > max(4096, max_tok)).count() == 0

    # 6. audit: diff the kept corpus vs the raw corpus
    d = table_diff(
        raw.select("doc_id", "text"),
        para.join(deduped.select("doc_id"), on="doc_id").select("doc_id", "text"),
        "doc_id",
    ).collect()[0]
    assert d["n_added"] == 0
    assert d["n_removed"] >= 2                       # clones removed
    assert d["n_changed"] >= n0 * 0.9                # banner stripped ~everywhere
