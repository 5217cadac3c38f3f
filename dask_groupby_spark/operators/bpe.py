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


def _merge_pair_py(syms: "list[str]", a: str, b: str) -> "list[str] | None":
    """Python twin of :func:`_merge_adjacent` — the same greedy
    left-to-right fold (append; merge when the last emitted symbol is
    ``a`` and the next is ``b``), so the batched Arrow passes and the
    per-merge Column rewrites produce bit-identical words.  Returns
    ``None`` when the word does not contain the pair (caller skips the
    delta bookkeeping)."""
    out: "list[str]" = []
    changed = False
    ab = a + b
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = ab
            changed = True
        else:
            out.append(s)
    return out if changed else None


def _batch_step_deltas(words: DataFrame, batch, pending=None) -> "list[dict]":
    """ONE Arrow job for a whole candidate batch: apply the merges
    SEQUENTIALLY to every word (exact sequential semantics — no
    disjointness assumption needed for correctness) and emit the exact
    per-step pair-count deltas, partial-aggregated per partition (a
    Counter per PARTITION, not per Arrow batch) and reduced by a
    KB-class groupBy.  The driver then replays the deltas step by step
    to verify each candidate is still the sequential argmax — this is
    what lets a 32k-merge training run schedule ~1 job per BATCH
    instead of ~3 per merge.

    ``pending``: previously ACCEPTED merges not yet materialized into the
    ``words`` table — applied first (no delta tracking; their deltas are
    already in the driver dict), so the word-table rewrite job is deferred
    until ``pending`` grows past the materialization cap instead of paid
    every round."""
    bl = [tuple(p) for p in batch]
    pl = [tuple(p) for p in (pending or [])]

    def run(it):
        from collections import Counter

        import pandas as pd

        acc: Counter = Counter()
        for pdf in it:
            for syms, cnt in zip(pdf["syms"], pdf["cnt"]):
                cur = list(syms)
                c = int(cnt)
                for a, b in pl:
                    m = _merge_pair_py(cur, a, b)
                    if m is not None:
                        cur = m
                for i, (a, b) in enumerate(bl):
                    merged = _merge_pair_py(cur, a, b)
                    if merged is None:
                        continue
                    before = Counter(zip(cur, cur[1:]))
                    after = Counter(zip(merged, merged[1:]))
                    for p, n in after.items():
                        d = n - before.pop(p, 0)
                        if d:
                            acc[(i, p)] += d * c
                    for p, n in before.items():
                        acc[(i, p)] -= n * c
                    cur = merged
        rows = [
            (i, p[0], p[1], int(n)) for (i, p), n in acc.items() if n
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["step", "a", "b", "n"])

    agg = (
        words.mapInPandas(run, schema="step int, a string, b string, n long")
        .groupBy("step", "a", "b")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    out: "list[dict]" = [dict() for _ in bl]
    for r in agg:
        if r["n"]:
            out[r["step"]][(r["a"], r["b"])] = r["n"]
    return out


def _apply_merges_batch(words: DataFrame, batch) -> DataFrame:
    """Map-only Arrow rewrite applying the ACCEPTED merges in order —
    one job for the whole batch (the per-merge Column-fold rewrite stays
    in use on the spilled-DataFrame path)."""
    bl = [tuple(p) for p in batch]

    def run(it):
        for pdf in it:
            out = []
            for syms in pdf["syms"]:
                cur = list(syms)
                for a, b in bl:
                    m = _merge_pair_py(cur, a, b)
                    if m is not None:
                        cur = m
                out.append(cur)
            pdf = pdf[["syms", "cnt"]].copy()
            pdf["syms"] = out
            yield pdf

    return words.mapInPandas(run, schema="syms array<string>, cnt bigint")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    collect_threshold: int = 1_000_000,
    pair_collect_threshold: int = 2_000_000,
    merge_batch: int = 16,
) -> "list[tuple[str, str]]":
    """Learn ``num_merges`` BPE merges from the corpus.

    ONE corpus pass builds the (word, count) table.  When that table has
    ≤ ``collect_threshold`` distinct words it is COLLECTED and the merge
    loop runs driver-local — the corpus-scale pass is the distributed
    part; the table it produces is distinct-WORD-sized (millions, not the
    corpus's trillions of tokens).  This is how reference tokenizer
    trainers structure the work too (aggregate once, iterate in memory).

    Above the threshold (or with ``collect_threshold=0``) the word table
    stays distributed and pair counts are maintained INCREMENTALLY: each
    merge computes a before/after count DELTA from only the words that
    CONTAIN the merged pair (a map-side filter on the checkpointed word
    table + an affected-pairs-sized aggregate), never a vocabulary-wide
    re-explode — the structure reference tokenizer trainers use.  The
    pair-count table itself is symbol-BIGRAM-sized (≈alphabet² initially
    + O(merges) new types — orders of magnitude smaller than the
    vocabulary), so it lives in a driver dict with a lazy max-heap:
    best-pair selection costs ZERO jobs.

    Merges are scheduled in SPECULATIVE BATCHES of up to ``merge_batch``
    (r10; VERDICT r9 #3 — the per-merge driver round-trip made a 32k-merge
    tokenizer ≈ 10⁵ Spark jobs of pure scheduling): the driver peeks the
    top candidates off the lazy heap in plain (count DESC, pair ASC)
    order — the sequential algorithm's own ordering (see
    ``_select_batch``; a symbol-disjointness filter was tried and
    rejected: it guaranteed rejection whenever the true next argmax
    shared a symbol), ONE Arrow job applies them sequentially to every
    word and returns the exact PER-STEP pair-count deltas, and the
    driver replays the deltas verifying each candidate is still the
    (count DESC, pair ASC) argmax at its step.  The accepted merges join a PENDING list that the next
    rounds' jobs replay on the fly; the word table is rewritten and
    ``localCheckpoint``-ed only every ~64 accepted merges (or before a
    spill), so a round is ONE job.  Interference (a merge creating/
    boosting a pair above a later candidate) just shortens the accepted
    prefix; the merge list is BIT-IDENTICAL to the sequential algorithm,
    asserted in tests.  Amortized cost ≈ ``1/accepted-prefix`` jobs per
    merge (measured 0.44 at 256 merges on a 300k-word adversarial
    16-symbol vocabulary — see ``scripts/bench_bpe.py``).
    Should the pair table outgrow ``pair_collect_threshold`` entries, it
    spills to a DataFrame and the loop continues with per-merge
    distributed delta maintenance (best-pair then costs one KB-class
    collect per merge).  All paths pick the best pair by (count DESC,
    pair ASC) and stop early when no pair reaches ``min_pair_count`` —
    identical merges, asserted in tests.

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

    def _pair_counts(frame: DataFrame, sign: int = 1) -> DataFrame:
        return (
            frame.where(F.size("syms") >= 2)
            .select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg((F.sum("cnt") * F.lit(sign)).alias("n"))
        )

    # pair-count table: built ONCE by a vocabulary-wide explode, then
    # maintained by per-merge deltas over only the affected words.  It is
    # symbol-bigram-sized, so it starts in a driver dict + lazy max-heap
    # (zero-job best-pair picks) and spills to a DataFrame only if it
    # outgrows pair_collect_threshold.
    import heapq

    # Materialize the vocabulary-wide aggregate ONCE; the tier probe below
    # reads the checkpointed result, so the overflow path never re-runs the
    # explode+groupBy it already paid for.
    pc: "DataFrame | None" = _pair_counts(words).localCheckpoint(eager=True)
    pairs: "dict[tuple[str, str], int] | None" = None
    heap: list = []
    if pair_collect_threshold:
        rows = pc.limit(pair_collect_threshold + 1).collect()
        if len(rows) <= pair_collect_threshold:
            pairs = {(r["a"], r["b"]): r["n"] for r in rows}
            heap = [(-n, a, b) for (a, b), n in pairs.items()]
            heapq.heapify(heap)
            # dropping the only reference lets the ContextCleaner reclaim
            # the checkpointed blocks on GC — the small (driver-dict) path
            # does not hold the table for the run (r9 meta-review note);
            # the alternative (probe-then-checkpoint) re-ran the whole
            # vocabulary aggregate on the spill path, which is worse
            pc = None

    def _spill_to_df():
        nonlocal pc, pairs, heap
        pc = df.sparkSession.createDataFrame(
            [(a, b, n) for (a, b), n in pairs.items()],
            "a string, b string, n bigint",
        ).localCheckpoint(eager=True)
        pairs, heap = None, []

    def _select_batch(k: int) -> "list[tuple[str, str]]":
        """Peek the top-k candidates off the lazy heap in plain
        (count DESC, pair ASC) order — the sequential algorithm's own
        ordering, which maximizes the expected accepted prefix (an
        earlier symbol-disjoint filter GUARANTEED rejection whenever the
        true next argmax shared a symbol, which on small alphabets is
        most of the time).  Stale entries are dropped permanently; valid
        ones are pushed back — the verify loop re-pops them as the true
        sequential argmaxes."""
        popped: list = []
        chosen: "list[tuple[str, str]]" = []
        seen: set = set()
        while heap and len(chosen) < k:
            e = heapq.heappop(heap)
            if pairs.get((e[1], e[2]), 0) != -e[0]:
                continue  # stale — discard
            popped.append(e)
            if -e[0] < min_pair_count:
                break
            p = (e[1], e[2])
            if p in seen:
                continue  # duplicate live entry (count revisited a value)
            chosen.append(p)
            seen.add(p)
        for e in popped:
            heapq.heappush(heap, e)
        return chosen

    merges: list[tuple[str, str]] = []
    #: accepted merges not yet materialized into `words` — applied inside
    #: the next rounds' Arrow jobs; rewritten+checkpointed only when the
    #: replay cost would start to dominate (or before spilling)
    pending: "list[tuple[str, str]]" = []
    pending_cap = 64

    def _materialize_pending():
        nonlocal words, pending
        if pending:
            words = _apply_merges_batch(words, pending).localCheckpoint(
                eager=True
            )
            pending = []

    stop = False
    while not stop and len(merges) < num_merges:
        if pairs is not None:
            # ---- driver-dict path: speculative batched round ----------
            batch = _select_batch(min(merge_batch, num_merges - len(merges)))
            if not batch:
                break
            # ONE Arrow job: replay pending, then per-step deltas
            deltas = _batch_step_deltas(words, batch, pending)
            accepted = 0
            spill = False
            for i, (a, b) in enumerate(batch):
                # sequential argmax at this step (lazy heap)
                while heap and pairs.get((heap[0][1], heap[0][2]), 0) != -heap[0][0]:
                    heapq.heappop(heap)
                if not heap or -heap[0][0] < min_pair_count:
                    stop = True
                    break
                if (heap[0][1], heap[0][2]) != (a, b):
                    break  # interference: next round re-picks from here
                merges.append((a, b))
                pending.append((a, b))
                accepted += 1
                for p, dv in deltas[i].items():
                    v = pairs.get(p, 0) + dv
                    if v > 0:
                        pairs[p] = v
                        heapq.heappush(heap, (-v, p[0], p[1]))
                    else:
                        pairs.pop(p, None)
                if len(pairs) > pair_collect_threshold:
                    spill = True
                    break
            if len(pending) >= pending_cap or spill:
                _materialize_pending()
            if spill:
                _spill_to_df()
            elif accepted == 0 and not stop:
                break  # defensive: batch[0] is the argmax by construction
            continue
        # ---- spilled-DataFrame path: one merge per iteration ----------
        best = pc.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # guarded adjacency test (when() keeps sequence() off 1-symbol rows)
        has = F.when(
            F.size("syms") >= 2,
            F.exists(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: (F.element_at(F.col("syms"), i) == F.lit(a))
                & (F.element_at(F.col("syms"), i + 1) == F.lit(b)),
            ),
        ).otherwise(F.lit(False))
        affected = words.where(has)
        rewritten = affected.select(
            _merge_adjacent(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        delta = (
            _pair_counts(affected, sign=-1)
            .unionByName(_pair_counts(rewritten))
            .groupBy("a", "b")
            .agg(F.sum("n").alias("n"))
        )
        pc = (
            pc.unionByName(delta)
            .groupBy("a", "b")
            .agg(F.sum("n").alias("n"))
            .where(F.col("n") > 0)
            .localCheckpoint(eager=True)
        )
        # map-only guarded rewrite: unaffected rows pass through untouched
        words = words.withColumn(
            "syms",
            F.when(has, _merge_adjacent(F.col("syms"), a, b)).otherwise(
                F.col("syms")
            ),
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
    same (count DESC, pair ASC) ties, same early stop).

    Pair counts are maintained INCREMENTALLY with a pair→words inverted
    index: a merge rewrites only the words containing the merged pair and
    applies their before/after pair-count delta, so a round costs
    O(symbols in affected words), not O(vocabulary) — the structure
    reference tokenizer trainers use for 32k-merge runs.  Best-pair
    selection is a lazy max-heap (stale entries skipped on pop), so it
    costs O(log) amortized, not an O(\\|pairs\\|) scan per merge."""
    import heapq

    syms = {w: list(w) + [EOW] for w in word_counts}
    pairs: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set] = {}
    for w, cnt in word_counts.items():
        s = syms[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pairs[p] = pairs.get(p, 0) + cnt
            where.setdefault(p, set()).add(w)
    heap = [(-n, a, b) for (a, b), n in pairs.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        while heap and pairs.get((heap[0][1], heap[0][2]), 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap or -heap[0][0] < min_pair_count:
            break
        a, b = heap[0][1], heap[0][2]
        merges.append((a, b))
        touched: set = set()
        for w in list(where.get((a, b), ())):
            cnt = word_counts[w]
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pairs[p] -= cnt
                touched.add(p)
                ws = where.get(p)
                if ws is not None:
                    ws.discard(w)
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
                where.setdefault(p, set()).add(w)
                touched.add(p)
        for p in touched:
            if pairs.get(p, 0) <= 0:
                pairs.pop(p, None)
                where.pop(p, None)
            else:
                heapq.heappush(heap, (-pairs[p], p[0], p[1]))
    return merges
