"""Byte-pair encoding trained and applied IN Spark — the real tokenizer
step (Sennrich et al. 2016), not the budgeting estimate
(``text.bpe_token_estimate``).

The scale trick is classic BPE's own: training runs on the WORD-FREQUENCY
table, not the corpus.  One corpus pass reduces 100 TB of text to a
(word, count) table bounded by the distinct-word count; every merge
iteration after that is a tiny aggregate + map over that table.  Encoding
is then a map-only Arrow pass with a per-batch word→pieces cache (words
repeat — the cache turns per-token work into per-distinct-word work).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: end-of-word marker appended as a trailing symbol before merging —
#: standard BPE, so "low" as a whole word and "low" as a prefix of
#: "lower" learn different merges.
EOW = "</w>"


def _chars(word):
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )


def _adjacent_pairs(syms):
    """``(a, b)`` struct array of the adjacent symbol pairs of ``syms``.
    Callers must guard ``size(syms) >= 2``: ``sequence(1, 0)`` DESCENDS,
    and index 0 is illegal for ``element_at``."""
    return F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b"),
        ),
    )


def _merge_adjacent(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b — one
    aggregate fold, same greedy semantics as reference BPE."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    collect_threshold: int = 1_000_000,
) -> "list[tuple[str, str]]":
    """Learn ``num_merges`` BPE merges from the corpus.

    ONE corpus pass builds the (word, count) table.  When that table has
    ≤ ``collect_threshold`` distinct words it is COLLECTED and the merge
    loop runs driver-local — the corpus-scale pass is the distributed
    part; the table it produces is distinct-WORD-sized (millions, not the
    corpus's trillions of tokens), and a 32k-merge production vocabulary
    needs 32k rounds, which as Spark jobs cost ~0.1 s of scheduling
    each.  This is how reference tokenizer trainers structure the work
    too (aggregate once, iterate in memory).

    Above the threshold (or with ``collect_threshold=0``) the loop runs
    fully distributed with INCREMENTAL pair-count maintenance: the pair
    table is built by ONE corpus-vocabulary explode+aggregate, then each
    merge applies a before/after DELTA computed from only the words that
    contain the merged pair — the per-merge shuffle is O(pairs of
    affected words) + O(|pair table|), never a vocabulary-wide
    re-explode (this is how reference tokenizer trainers maintain pair
    counts too).  Per merge: one best-pair collect over the KB-class
    pair table, one delta aggregate, one map-only guarded rewrite of the
    word table — 3 small jobs, with eager ``localCheckpoint`` cutting
    the iterative lineage (the ``duplicate_clusters`` discipline).
    Both paths pick the best pair by (count DESC, pair ASC) and stop
    early when no pair reaches ``min_pair_count`` — identical merges,
    asserted in tests.

    Returns the merge list in order — the model artifact for
    :func:`bpe_encode` (persist it yourself; it is a plain python list).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1 (got {num_merges})")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if collect_threshold:
        counts = counts.localCheckpoint(eager=True)
        if counts.count() <= collect_threshold:
            wc = {r["w"]: r["cnt"] for r in counts.collect()}
            return _train_local(wc, num_merges, min_pair_count)
    words = counts.select(_chars(F.col("w")).alias("syms"), "cnt")
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("a"),
                        F.element_at(F.col("syms"), i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
            "cnt",
        ).where(F.size("syms") >= 2)
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        words = words.select(
            _merge_adjacent(F.col("syms"), a, b).alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    syms = list(word) + [EOW]
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "bpe_pieces",
) -> DataFrame:
    """Apply trained merges: ``(id_col, out)`` with the document's BPE
    pieces in order.  Arrow ``mapInPandas`` (the documented escape-hatch
    tier — 50+ sequential merge rewrites are a poor fit for nested
    Column folds) with a per-batch word→pieces cache, so cost scales
    with DISTINCT words per batch, not tokens.  Map-only: encoding
    100 TB is one scan, zero shuffle.
    """
    merges = [tuple(m) for m in merges]
    src = df.select(id_col, text_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            pieces = []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in (text or "").split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, merges)
                    doc.extend(got)
                pieces.append(doc)
            yield pd.DataFrame({id_col: pdf[id_col], out: pieces})

    return src.mapInPandas(run, schema=f"{id_col} bigint, {out} array<string>")


def _train_local(
    word_counts: "dict[str, int]", num_merges: int, min_pair_count: int
) -> "list[tuple[str, str]]":
    """Driver-local merge loop over the collected (word, count) table —
    bit-identical semantics to the distributed loop (same greedy rewrite,
    same (count DESC, pair ASC) ties, same early stop)."""
    syms = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges
