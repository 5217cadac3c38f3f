"""Corpus vocabulary build and token-id encoding — the last text step of
a training-data pipeline (tokenize -> id arrays the trainer consumes).

No flox counterpart (SURVEY.md §2.4): Spark-native surface extension in
the same family as ``text.chunk_documents`` / ``curate.pack_sequences``.

Scale shape: the vocabulary is built with a distributed top-k
(``orderBy().limit()`` compiles to TakeOrderedAndProject — per-partition
heaps, one driver merge of ``max_size`` rows), NOT a global sort; the
single-task ranking window that assigns ids then runs on at most
``max_size`` rows, which is the whole point of requiring a bound.
Encoding is a broadcast join against that bounded vocab — map-only in
the flat form, one doc-keyed shuffle in the array form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int = 65536,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary of the corpus: ``(term, cnt, term_id)``
    with ``term_id`` the 0-based rank by ``(cnt DESC, term ASC)`` — the
    deterministic tie-break makes ids stable across runs and engines.

    One map-combined shuffle counts terms; the top-``max_size`` cut is a
    distributed TakeOrdered (never a full sort of the term space — a
    100 TB corpus has an unbounded tail of junk terms and the tail is
    exactly what ``max_size``/``min_count`` exist to drop).  The
    ``row_number`` id-assignment window is single-task BY DESIGN: it runs
    after the cut, on ≤ ``max_size`` rows.
    """
    if max_size < 1:
        raise ValueError(f"max_size must be >= 1 (got {max_size})")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(min_count))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(max_size)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return top.withColumn(
        "term_id", (F.row_number().over(w) - F.lit(1)).cast("long")
    )


def encode_tokens_flat(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    keep_empty: bool = False,
) -> DataFrame:
    """Token-id encoding in flat ``(id_col, pos, token_id)`` form —
    the zero-extra-shuffle path: posexplode is map-side and the vocab
    (bounded by ``build_vocab``'s ``max_size``) broadcasts, so the plan
    is scan -> explode -> BroadcastHashJoin with no Exchange on the
    corpus.  Out-of-vocabulary terms encode as ``oov_id``.

    ``keep_empty=True`` emits one ``(pos=NULL, token_id=NULL)`` marker
    row per empty/NULL-text document (posexplode_outer) so corpora
    reconcile row-for-row; the default flat form has no positions for a
    tokenless document and drops it.
    """
    explode = F.posexplode_outer if keep_empty else F.posexplode
    tk = df.select(
        F.col(id_col),
        explode(tokens(F.col(text_col))).alias("pos", "term"),
    )
    joined = tk.join(
        F.broadcast(vocab.select("term", "term_id")), on="term", how="left"
    )
    return joined.select(
        id_col,
        "pos",
        # the empty-doc marker row must stay NULL, not encode as OOV
        F.when(
            F.col("pos").isNotNull(),
            F.coalesce(F.col("term_id"), F.lit(oov_id).cast("long")),
        ).alias("token_id"),
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    out: str = "token_ids",
) -> DataFrame:
    """Token-id encoding in array form: ``(id_col, token_ids)`` with ids
    in document order — what a sequence trainer consumes.  Built on the
    flat form plus ONE doc-keyed shuffle to reassemble order
    (``array_sort`` over collected ``(pos, id)`` structs; collect_list
    alone has no ordering guarantee after a shuffle).
    """
    flat = encode_tokens_flat(
        df, vocab, id_col, text_col, oov_id, keep_empty=True
    )
    # keep_empty + the NULL-skipping collect_list: an empty/NULL-text doc
    # survives as (id, []) instead of vanishing from the output and
    # breaking doc-count reconciliation downstream (r9 review)
    return flat.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("pos").isNotNull(),
                        F.struct(F.col("pos"), F.col("token_id")),
                    )
                )
            ),
            lambda s: s["token_id"],
        ).alias(out)
    )
