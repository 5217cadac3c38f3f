"""Capture .explain("formatted") for bench/contract queries into text files.

The judge cannot run Spark: plan claims in OPTIMIZATION_r12.md are checked
against these committed files.

Usage:
    SPARK_GRAFT_TREE=/path/to/tree python scripts/dump_plans.py OUTDIR SUFFIX [query ...]

SPARK_GRAFT_TREE (default: this repo) is prepended to sys.path, so the same
script can dump plans from an older checkout (the "_before" files) and from
HEAD (the "_after" files).  Queries default to the full known set.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

TREE = os.environ.get(
    "SPARK_GRAFT_TREE",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, TREE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def build_queries(spark):
    """(name -> thunk returning the result DataFrame).  Mirrors bench.py's
    construction for the queries under optimization; contract-key shapes
    mirror __spark_entry__."""
    from pyspark.sql import functions as F

    from dask_groupby_spark.sources import load_table

    par = spark.sparkContext.defaultParallelism
    li = load_table(spark, SF_DIR, "lineitem")
    docs = load_table(spark, SF_DIR, "documents").repartition(par)
    emb = load_table(spark, SF_DIR, "embeddings").repartition(par)

    def dedup_minhash():
        from dask_groupby_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        sig = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_k=3)
        return lsh_candidate_pairs(sig, num_hashes=8, bands=4)

    def near_dedup():
        from dask_groupby_spark.operators.dedup import near_deduplicate

        return near_deduplicate(docs, num_hashes=8, bands=4)

    def text_pipeline():
        from dask_groupby_spark.operators.text import (
            add_text_features,
            language_id,
            tokens,
        )

        toked = docs.withColumn("__tk", tokens(F.col("text")))
        feats = language_id(
            add_text_features(toked, tokens_col="__tk"), tokens_col="__tk"
        )
        return feats.groupBy("lang_pred").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("stopword_ratio").alias("avg_sw"),
        )

    def ann_ivf():
        from dask_groupby_spark.operators.similarity import ivf_topk

        return ivf_topk(
            emb, emb.where(F.col("vec_id") < 50), k=10, n_cells=16, nprobe=3
        )

    def ann_topk():
        from dask_groupby_spark.operators.similarity import cosine_topk_blas

        return cosine_topk_blas(emb, emb.where(F.col("vec_id") < 50), k=10)

    def ngram_counts():
        from dask_groupby_spark.operators.text import ngram_counts as ngc

        return ngc(docs, n=2, min_count=2)

    def clf_score():
        from dask_groupby_spark.operators.text import hash_classifier_score

        return hash_classifier_score(docs, dim=64, hasher="portable")

    def dsir():
        from dask_groupby_spark.operators.text import dsir_log_weights

        target = docs.filter(F.col("lang") == "en")
        return dsir_log_weights(
            docs, target, n=2, dim=1024, alpha=1.0, hasher="portable"
        )

    def ann_lsh():
        from dask_groupby_spark.operators.similarity import lsh_bucketed_topk

        return lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 50), k=10)

    def near_dedup_edges():
        """The candidate-edge frame near_deduplicate feeds to
        duplicate_clusters.  r12 and earlier: the full lsh_candidate_pairs
        clique + per-pair dedup groupBy (the dedup_minhash plan); r13: the
        per-bucket spanning star (anchor cap 1), no pair groupBy."""
        from dask_groupby_spark.operators import dedup as dd

        sig = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_k=3)
        if "spanning STAR" in (dd.near_deduplicate.__doc__ or ""):
            exploded = dd._band_rows(sig, 8, 4, "fast")
            return dd.sorted_bucket_pairs(
                exploded, ["band", "bh"], F.col("id"),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                max_bucket_size=1,
            ).select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        return dd.lsh_candidate_pairs(sig, num_hashes=8, bands=4).select(
            "id_a", "id_b"
        )

    def quantile():
        from dask_groupby_spark import groupby_reduce

        return groupby_reduce(
            li,
            "l_returnflag",
            "l_linestatus",
            func="nanquantile",
            value="l_extendedprice",
            finalize_kwargs={"q": 0.9},
        )

    def tfidf():
        from dask_groupby_spark.operators.text import tfidf_top_terms

        return tfidf_top_terms(docs, k=3)

    return {
        "dedup_minhash": dedup_minhash,
        "near_dedup": near_dedup,
        "near_dedup_edges": near_dedup_edges,
        "text_pipeline": text_pipeline,
        "ann_ivf": ann_ivf,
        "ann_lsh": ann_lsh,
        "ann_topk": ann_topk,
        "ngram_counts": ngram_counts,
        "clf_score": clf_score,
        "dsir": dsir,
        "quantile": quantile,
        "tfidf": tfidf,
    }


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from dask_groupby_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = build_queries(spark)
    for name, thunk in qs.items():
        if only and name not in only:
            continue
        try:
            txt = _explain_str(thunk())
        except Exception as exc:  # older trees may lack a query
            txt = f"UNAVAILABLE in this tree: {type(exc).__name__}: {exc}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} ({suffix}) tree={TREE} sf={SF_DIR}\n")
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
