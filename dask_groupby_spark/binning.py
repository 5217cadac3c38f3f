"""Interval binning of group labels (the reference's ``isbin=True`` /
``pd.IntervalIndex`` expected_groups; ref: flox/core.py:803-823 ``np.digitize``
path and flox/core.py:2098-2099).

Semantics mirrored exactly:

- ``closed="right"`` (pd.cut / pd.IntervalIndex default): value ∈ (e[i], e[i+1]]
  → bin i.  ``closed="left"``: [e[i], e[i+1]).
- out-of-bounds and missing label values → no bin (code −1 in the reference,
  flox/core.py:819) → the row is EXCLUDED from results.
- every bin is part of the output domain (empty bins appear with fill_value —
  ref test: flox/tests/test_core.py:1191 ``test_empty_bins``).

Implementation: a flat CASE expression (whole-stage-codegen friendly; the bin
count is planner-side small).  At 100 TB the CASE is evaluated map-side before
the shuffle, so binning adds no extra stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Bins:
    """Bin edges for one grouper, like a ``pd.IntervalIndex`` from edges."""

    edges: tuple
    closed: str = "right"  # "right" → (a, b]; "left" → [a, b)

    def __init__(self, edges: Sequence, closed: str = "right"):
        if closed not in ("right", "left"):
            raise ValueError("closed must be 'right' or 'left'")
        if len(edges) < 2:
            raise ValueError("need at least 2 bin edges")
        if any(a >= b for a, b in zip(edges, edges[1:])):
            # pd.IntervalIndex.from_breaks parity: misordered edges would
            # silently misbin (r9 review)
            raise ValueError(f"bin edges must be strictly increasing: {edges}")
        object.__setattr__(self, "edges", tuple(edges))
        object.__setattr__(self, "closed", closed)

    @property
    def nbins(self) -> int:
        return len(self.edges) - 1

    def bucket(self, col: Column) -> Column:
        """Map a label column to its 0-based bin index (NULL = out of bounds)."""
        e = self.edges
        expr = F.lit(None).cast("int")
        # build CASE from last bin to first so earlier bins take precedence
        for i in range(self.nbins - 1, -1, -1):
            lo, hi = F.lit(e[i]), F.lit(e[i + 1])
            if self.closed == "right":
                cond = (col > lo) & (col <= hi)
            else:
                cond = (col >= lo) & (col < hi)
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr

    def labels(self) -> list[str]:
        """Human-readable interval labels, pandas-style."""
        out = []
        for i in range(self.nbins):
            lo, hi = self.edges[i], self.edges[i + 1]
            out.append(f"({lo}, {hi}]" if self.closed == "right" else f"[{lo}, {hi})")
        return out

    def expected_codes(self) -> list[int]:
        return list(range(self.nbins))

    def label_expr(self, code: Column) -> Column:
        """Map a 0-based bin-code column to its pandas-style interval label
        (``"(10.0, 20.0]"``) — the output-coordinate form the reference's
        xarray front-end attaches to binned groupers (pd.IntervalIndex
        coords, flox/xarray.py:370-378).  A flat CASE like :meth:`bucket`:
        planner-side small, codegen-friendly, map-side."""
        labels = self.labels()
        expr = F.lit(None).cast("string")
        for i in range(self.nbins - 1, -1, -1):
            expr = F.when(code == F.lit(i), F.lit(labels[i])).otherwise(expr)
        return expr


def quantile_bins(
    df,
    col: str,
    q: int = 10,
    by: str | Sequence[str] | None = None,
    out: str | None = None,
    resolution_guard: int = 10_000,
    method: str = "auto",
    rows_per_chunk: int = 2_000_000,
):
    """Equal-frequency discretization — ``pd.qcut(x, q, labels=False)``
    parity: bin edges at the exact linear-interpolation quantiles
    ``i/q`` and each value assigned ``Σᵢ 1[x > eᵢ]`` (right-closed
    intervals, so a value equal to an interior edge falls in the lower
    bin, exactly pandas' convention).  With ``by``, edges are computed
    PER GROUP (per-domain score deciles).  NULL/NaN values get a NULL
    bin.  Tied data can collapse adjacent edges; bins keep their nominal
    index (pandas' ``duplicates="drop"`` renumbers instead — on
    edge-tie-free data the two agree exactly, asserted in tests).
    Pandas-parity caveat (soak-caught): a value EXACTLY equal to an
    interior edge can bin one lower than pandas when numpy's
    ``(i/q)·(n−1)`` position rounding differs in the last ulp from the
    exact position — this engine computes positions integer-first (see
    the ``spec`` comment below) and shares every bit of edge arithmetic
    with its SQL oracle instead of with numpy's float path.

    Plan shape: the GLOBAL form computes its ``q−1`` interior edges with
    the distributed exact-rank grid of ``quantile_normalize``
    (:func:`~dask_groupby_spark.operators.stats._pooled_exact_grid` —
    range-partitioned ranks, anchor-only collect, DuckDB-lerp) and bins
    map-side against literals — fully parallel at any scale.  The
    GROUPED form ranks within each group (one window — the documented
    per-group-quantile serialization, same class as the ``quantile``
    reduction), joins the ≤ 2(q−1) anchor rows per group, and
    interpolates with the SAME ``lo·(1−d) + hi·d`` lerp IN-ENGINE, so
    the DuckDB oracle mirrors it bit-for-bit; binning is a broadcast
    join of |groups|·(q−1) edges + a map-side fold.
    ``method="two_pass"`` replaces the grouped tier's window with the
    chunked two-pass rank (``groupby_rank(execution="two_pass")``), so
    a huge group's rank pass spans many tasks — identical bins (the edge
    math reads values at ranks, which any tie order preserves); the
    global tier is already scalable and ignores ``method``.
    ``method="auto"`` (DEFAULT): the tier choice reads ``max`` off the
    per-group count table the edge math needs anyway (lazily
    checkpointed, one tiny job — no separate probe aggregate) and picks
    two_pass when some group exceeds ``rows_per_chunk`` rows.

    The grouped form lazily PERSISTS the |groups|-row edge table and
    exposes it as ``res.qcut_edges`` — repeated identical calls reuse
    the computed edges (CacheManager dedupes by plan); call
    ``res.qcut_edges.unpersist()`` to release, reading the attribute
    BEFORE transforming the result (it does not propagate).  r13 adds
    ``res.qcut_counts`` — the persisted |groups|-row count table (it
    feeds three consumers in the edge pipeline; unpinned, each one
    re-aggregated the base table) — release it the same way.
    """
    from pyspark.sql import Window

    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    if q > resolution_guard:
        raise ValueError(f"q={q} exceeds resolution_guard={resolution_guard}")
    if method not in ("window", "two_pass", "auto"):
        raise ValueError(
            f"method must be 'window', 'two_pass', or 'auto', got {method!r}"
        )
    if "__edges" in df.columns:
        raise ValueError(
            "quantile_bins: input column '__edges' collides with the "
            "internal namespace — rename it first"
        )
    out = out or f"{col}_qbin"
    v = F.col(col).cast("double")
    v = F.when(~F.isnan(v), v)  # NaN -> NULL

    if by is None:
        from .operators.stats import _pooled_exact_grid

        grid = _pooled_exact_grid(df, F.col(col), q)
        if grid is None:
            return df.withColumn(out, F.lit(None).cast("int"))
        edges = grid[1:-1]  # interior edges only
        b = F.lit(0)
        for e in edges:
            b = b + F.when(v > F.lit(float(e)), 1).otherwise(0)
        return df.withColumn(out, F.when(v.isNotNull(), b).cast("int"))

    by_list = [by] if isinstance(by, str) else list(by)
    vals = df.select(*by_list, v.alias("__v")).filter(F.col("__v").isNotNull())
    # group sizes from a plain map-combined count — NOT max(__r) over the
    # ranked frame: ranked has several consumers below and Spark/AQE never
    # reuses an Exchange across consumers, so every reader re-runs the
    # per-group sort (r9 plan audit)
    #
    # ...and the count table itself is PERSISTED (r13): it feeds THREE
    # consumers (`needed`, `spec_m`, and the auto probe), and each one
    # re-aggregated the base table — the r12 grid-rescan disease; the edge
    # pipeline's plan carried 3 extra base scans (4 total, plan-audited;
    # sf1 edges-only slice 15.3 s vs 5.9 s for the rank pass it contains).
    # persist, NOT localCheckpoint, deliberately: a checkpoint injects a
    # fresh LogicalRDD per call, defeating CacheManager's canonicalized-
    # plan dedup and with it the documented `qcut_edges` warm-call reuse
    # (the r11 finding on the auto probe, same paragraph below).  The
    # |groups|-row entry dedupes across calls the same way `qcut_edges`
    # does and is exposed as ``res.qcut_counts`` (same handle convention).
    n_tbl = vals.groupBy(*by_list).agg(F.count(F.lit(1)).alias("__n")).persist()
    execution = method
    if method == "auto":
        # r11 (the dispatch_auto ladder, VERDICT r10 #1): a driver-only
        # metadata row bound on the VALUES frame (parquet footers /
        # cached-relation stats) proving total rows <= rows_per_chunk
        # proves no group can exceed it — window tier, ZERO probe jobs.
        from .two_pass import _metadata_row_bound

        bound = _metadata_row_bound(vals)
        if bound is not None and bound <= rows_per_chunk:
            execution = "window"
    if execution == "auto":
        # auto probe: one plain max-count job over the aggregate the edge
        # math needs anyway.  Deliberately NOT checkpointed into the
        # downstream plan: a localCheckpoint injects a fresh LogicalRDD
        # per call, which defeats CacheManager's canonicalized-plan dedup
        # and with it the ``qcut_edges`` warm-call reuse below (measured:
        # warm auto ran the full rank pass every call instead of hitting
        # the edge cache).  The probe job is the auto tier's whole cost
        # (~0.3 s on the cached sf0.1 bench input) — now paid only when
        # the metadata bound above cannot rule the scale tier out.
        mx = n_tbl.agg(F.max("__n")).collect()[0][0]
        execution = "two_pass" if (mx or 0) > rows_per_chunk else "window"
    if execution == "two_pass":
        # scale escape for the per-group window sort (one group = one
        # task): chunked ranks via the two-pass rank tier — method
        # "first" gives row_number semantics, and peers order by the
        # value itself (idx_col=__v: tie order within equal values is
        # arbitrary, but the VALUE at any rank — all the edge math
        # needs — is order-invariant; the window tier below orders
        # identically, so either choice is bit-identical)
        from .core import groupby_rank

        ranked = groupby_rank(
            vals,
            *by_list,
            value="__v",
            method="first",
            idx_col="__v",
            alias="__r",
            execution="two_pass",
            rows_per_chunk=rows_per_chunk,
        ).withColumn("__r", F.col("__r").cast("bigint"))
    else:
        w = Window.partitionBy(*by_list).orderBy("__v")
        ranked = vals.withColumn("__r", F.row_number().over(w))
    # one row per (group, i): anchor ranks + interpolation fraction,
    # exactly numpy/DuckDB linear interpolation arithmetic
    i_col = F.explode(
        F.array(*[F.lit(i) for i in range(1, q)])
    ).alias("__i")
    # position arithmetic is INTEGER-FIRST: pos = (i·(n−1))/q with the
    # int64 product exact, so anchors that are mathematically integral
    # (i·(n−1) divisible by q) get d = 0 EXACTLY and the edge IS the data
    # value — numpy/pandas compute (i/q)·(n−1) instead, whose float
    # rounding can turn an exact anchor into d ≈ 1 and shift the edge one
    # ulp BELOW the data value (the soak-caught counterexample: n=31,
    # q=3, a value equal to the tercile edge binned up by pandas, down
    # here).  Engine and oracle share this arithmetic bit-for-bit; pandas
    # parity holds everywhere except values exactly on such an edge.
    spec = n_tbl.select(*by_list, "__n", i_col).select(
        *by_list,
        "__i",
        F.floor(
            (F.col("__i") * (F.col("__n") - 1)).cast("double") / F.lit(float(q))
        ).cast("bigint").alias("__k"),
        (
            (F.col("__i") * (F.col("__n") - 1)).cast("double") / F.lit(float(q))
        ).alias("__pk"),
        F.col("__n"),
    )
    spec = spec.select(
        *by_list,
        "__i",
        (F.col("__k") + 1).alias("__rlo"),
        F.least(F.col("__k") + 2, F.col("__n")).alias("__rhi"),
        (F.col("__pk") - F.col("__k").cast("double")).alias("__d"),
    )
    # anchor/edge joins are NULL-SAFE on the group columns: a NULL group
    # is a group (GROUP BY semantics), and plain equi-joins would strand
    # its rows at NULL bins while its ranks and spec rows exist
    def _nullsafe(left, right, extra: tuple[str, str] | None = None):
        rj = right.select(
            *[F.col(c).alias(f"__qb_by_{i}") for i, c in enumerate(by_list)],
            *[c for c in right.columns if c not in by_list],
        )
        cond = None
        for i, c in enumerate(by_list):
            e = F.col(c).eqNullSafe(F.col(f"__qb_by_{i}"))
            cond = e if cond is None else cond & e
        if extra is not None:
            cond = cond & (F.col(extra[0]) == F.col(extra[1]))
        return left.join(rj, on=cond).drop(
            *[f"__qb_by_{i}" for i in range(len(by_list))]
        )

    # ONE pass over the ranked frame: semi-join it down to the ≤ 2(q−1)
    # anchor ranks per group (broadcast — the spec table is |groups|·(q−1)
    # rows).  The spec is MELTED to one (role, rank) row per needed edge
    # endpoint, so the anchor table has exactly ONE consumer (a single
    # equi-join, lo/hi pivoted back per (group, i)) — no persist, no
    # cache to leak, and the expensive per-group rank pass appears once
    # in the lineage (r9 advice follow-up: the earlier shape joined the
    # anchors twice and parked a persist behind a dynamic
    # ``.qcut_anchors`` handle that chained transformations dropped).
    needed = (
        spec.select(*by_list, F.col("__rlo").alias("__ar"))
        .unionByName(spec.select(*by_list, F.col("__rhi").alias("__ar")))
        .distinct()
    )
    anchors = _nullsafe(
        ranked.select(*by_list, "__r", "__v"),
        F.broadcast(needed),
        ("__r", "__ar"),
    ).select(*by_list, "__r", "__v")
    spec_m = spec.select(
        *by_list,
        "__i",
        "__d",
        F.explode(
            F.array(
                F.struct(
                    F.lit("lo").alias("role"), F.col("__rlo").alias("ar")
                ),
                F.struct(
                    F.lit("hi").alias("role"), F.col("__rhi").alias("ar")
                ),
            )
        ).alias("__rr"),
    ).select(
        *by_list,
        "__i",
        "__d",
        F.col("__rr.role").alias("__role"),
        F.col("__rr.ar").alias("__ar"),
    )
    edges = (
        _nullsafe(spec_m, anchors, ("__ar", "__r"))
        .groupBy(*by_list, "__i")
        .agg(
            F.max(F.when(F.col("__role") == "lo", F.col("__v"))).alias("__lo"),
            F.max(F.when(F.col("__role") == "hi", F.col("__v"))).alias("__hi"),
            # __d is constant within (group, i) — first() is order-safe
            F.first("__d").alias("__dd"),
        )
        .select(
            *by_list,
            "__i",
            # DuckDB quantile_cont lerp: lo*(1-d) + hi*d (bitwise-shared)
            (
                F.col("__lo") * (F.lit(1.0) - F.col("__dd"))
                + F.col("__hi") * F.col("__dd")
            ).alias("__edge"),
        )
    )
    edge_arr = edges.groupBy(*by_list).agg(
        F.array_sort(F.collect_list(F.struct("__i", "__edge"))).alias("__es")
    ).select(*by_list, F.transform("__es", lambda s: s["__edge"]).alias("__edges"))
    # persist the |groups|-row edge table (KB-class): it is the apex of
    # the whole rank/anchor pipeline, and Spark's CacheManager dedupes by
    # canonicalized plan — repeated identical quantile_bins calls (the
    # dashboard/bench pattern) then reuse the computed edges instead of
    # re-running the per-group rank pass.  Handle: ``res.qcut_edges``
    # (documented; read it BEFORE transforming the result — the attribute
    # does not propagate through transformations).
    edge_arr = edge_arr.persist()
    earr = edge_arr.select(
        *[F.col(c).alias(f"__qb_by_{i}") for i, c in enumerate(by_list)],
        "__edges",
    )
    jcond = None
    for i, c in enumerate(by_list):
        e = F.col(c).eqNullSafe(F.col(f"__qb_by_{i}"))
        jcond = e if jcond is None else jcond & e
    j = df.join(F.broadcast(earr), on=jcond, how="left").drop(
        *[f"__qb_by_{i}" for i in range(len(by_list))]
    )
    b = F.aggregate(
        F.coalesce(F.col("__edges"), F.array().cast("array<double>")),
        F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0),
    )
    res = j.withColumn(
        out,
        F.when(v.isNotNull() & F.col("__edges").isNotNull(), b).cast("int"),
    ).drop("__edges")
    res.qcut_edges = edge_arr  # documented persist handle (resample precedent)
    res.qcut_counts = n_tbl  # r13: the persisted |groups|-row count table
    return res
