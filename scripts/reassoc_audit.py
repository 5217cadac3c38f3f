"""Reassociation audit of every contract key (r12, VERDICT r11 #3).

THE QUESTION (per key): can a scale-dependent execution change — an
auto-tier flip to the chunked two-pass scan, or simply the magnitude
growth of a reassociating float fold — move the Spark result off the
oracle's rounding grid, flipping a today-green driver row red at some
larger gate scale?  (The failure mode found at sf10: scan_nancumsum's
chunked tier drifts ~1e-13 RELATIVE — double-ULP, inherent to any
chunked execution including the reference's blockwise dask scan — which
is 9.2e-6 ABSOLUTE on 1e8-scale sums, off the key's 1e-6 round-6 grid.)

THE CLASSES (exhaustive; every key gets exactly one):

- no-float      no float/double output column.  Tier/order changes are
                bit-exact or a semantic bug; no grid exists to flip.
- exact-arith   float values produced by order-INDEPENDENT arithmetic:
                selections/copies of input values (min/max/first/last/
                mode/median/exact & pinned-exact quantiles, top-k, join
                carries, clips), ratios or divisions of exact integers,
                fixed-length folds engineered to run in the SAME order
                as the oracle's explicit left-to-right SQL (the ANN
                cosine family), exact-regime sketches (KMV k>distinct,
                GK accuracy>n), local per-row arithmetic (diff, interp),
                or integer-quantized values (sql_entry's cents).  Exact
                at ANY scale.
- seq-window    per-row prefix/order-carry floats computed by the
                SEQUENTIAL window tier in the same fold order as the
                oracle's window SQL — bit-identical at any scale.
                scan_nancumsum PINS method='window' for this (r12);
                ewma's oracle replays the identical recurrence order.
- chunked-int   the chunked two-pass tier over INTEGER-QUANTIZED values
                (scan_two_pass, r12): integer addition below 2^53 is
                exact under any association — chunked == sequential ==
                oracle bit-for-bit at any scale (~2e12 rows headroom).
- poison-capped scan_cumsum: NaN-PROPAGATION caps each group's numeric
                run length (geometric, scale-free NaN rate), so prefix
                magnitudes grow ~log(n) only; chunked tier exact at
                sf10 (battery digest).
- bounded       order-sensitive float folds whose MAGNITUDE is
                scale-invariant: means/variances/correlations/test
                stats/probabilities/normalized scores, fixed-frame
                rolling windows, per-entity aggregates where entity
                cardinality scales with the corpus (user_id), windowed
                streaming aggregates.  Drift stays O(1e-13) ABSOLUTE at
                any corpus size — grids hold forever.
- grows         order-sensitive float folds whose magnitude grows
                linearly with the corpus (group totals over the 6-value
                lineitem key, cube/pivot cell sums).  NO tier exists
                (single Catalyst plan; partial-agg order is the only
                variation, present at every scale and absorbed by the
                grid so far); output rows are FEW and bounded.  Exact
                through sf10 (battery).  Projected exposure: drift
                ~1e-13·|total| crosses a half-grid of 5e-5 around
                |total|~5e8–1e9, i.e. roughly sf30–sf100 on this data —
                re-pin to integer cents (the sql_entry/scan_two_pass
                recipe) before ever running the gate there.
(Pinned-fixture keys — pca_embed, media_*, audio_neardup — emit
integer-exact payloads since r10 and land in no-float.)

Usage:
  python scripts/reassoc_audit.py            # verify coverage, print table
  python scripts/reassoc_audit.py --schemas /tmp/key_schemas.json
        # additionally cross-check the no-float class against real
        # output schemas (JSON: {key: {col: sparktype}})

The generated table is committed in FIXTURES.md ("Reassociation audit");
re-run this script whenever keys are added — it FAILS if any key lacks
a classification, so new keys cannot dodge the audit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (class, rationale) for every key with a float/double output column.
# Keys absent here MUST be no-float (verified against --schemas).
FLOAT_CLASS: dict[str, tuple[str, str]] = {
    # --- selections / copies / integer ratios / engineered-order folds
    "min": ("exact-arith", "selection"),
    "max": ("exact-arith", "selection"),
    "nanmin": ("exact-arith", "selection"),
    "nanmax": ("exact-arith", "selection"),
    "first": ("exact-arith", "selection by idx"),
    "last": ("exact-arith", "selection by idx"),
    "nanfirst": ("exact-arith", "selection by idx"),
    "nanlast": ("exact-arith", "selection by idx"),
    "min_count": ("exact-arith", "selection gated by int count"),
    "median": ("exact-arith", "order statistic"),
    "nanmedian": ("exact-arith", "order statistic"),
    "mode": ("exact-arith", "selection (tie=smallest)"),
    "nanmode": ("exact-arith", "selection (tie=smallest)"),
    "quantile": ("exact-arith", "interp of two order statistics"),
    "nanquantile_vec": ("exact-arith", "interp of two order statistics"),
    "approx_quantile": ("exact-arith", "GK pinned to exact regime (accuracy>n) -> true element"),
    "hist_quantile": ("exact-arith", "bin edges + int-count interpolation"),
    "wquantile": ("exact-arith", "weighted rank selection"),
    "wquantile_sketch": ("exact-arith", "weighted rank selection (exact regime)"),
    "rank": ("exact-arith", "avg rank: halves are exact"),
    "rank_two_pass": ("exact-arith", "avg rank: halves are exact; tier-exact"),
    "group_topk": ("exact-arith", "top-k selection, value copies"),
    "asof_join": ("exact-arith", "join carries input values"),
    "salted_join": ("exact-arith", "join carries input values"),
    "winsorize": ("exact-arith", "clip at exact-quantile band"),
    "mad": ("exact-arith", "median of |x - median|: selections"),
    "interp_time": ("exact-arith", "local 2-point interpolation"),
    "quantize": ("exact-arith", "elementwise codec"),
    "validate": ("exact-arith", "violation ratios of exact counts"),
    "multimodal_meta": ("exact-arith", "per-row metadata arithmetic"),
    "ngram_jaccard": ("exact-arith", "ratio of int set sizes"),
    "ngram_containment": ("exact-arith", "ratio of int set sizes"),
    "kmv_distinct": ("exact-arith", "exact regime (k=2^16 > distinct); REGIME bound: estimating beyond 65k distinct (sf10 crosses it — excluded there, test_kmv covers the error bound)"),
    "kmv_overlap": ("exact-arith", "exact regime (k=2^16 > distinct); same regime bound as kmv_distinct"),
    "fuzzy_coverage": ("exact-arith", "ratio of int counts"),
    "lsh_coverage": ("exact-arith", "int counts/pairs + int-exact bit-length"),
    "ann_topk": ("exact-arith", "fixed-order 64-dim fold == oracle's left-to-right sum"),
    "ann_lsh": ("exact-arith", "fixed-order 64-dim fold == oracle's left-to-right sum"),
    "ann_ivf": ("exact-arith", "fixed-order 64-dim fold == oracle's left-to-right sum"),
    "ann_recall": ("exact-arith", "recall = ratio of int counts"),
    "emb_neardup": ("exact-arith", "fixed-order cosine == oracle's left-to-right sum"),
    "sql_entry": ("exact-arith", "integer cents by design"),
    "complex_nanmedian": ("exact-arith", "component order statistics"),
    "scan_cummax": ("exact-arith", "selection scan; tier-exact (differential)"),
    "scan_cummin": ("exact-arith", "selection scan; tier-exact (differential)"),
    "scan_nancummax": ("exact-arith", "selection scan; tier-exact (differential)"),
    "scan_nancummin": ("exact-arith", "selection scan; tier-exact (differential)"),
    "scan_ffill": ("exact-arith", "order-carry selection; tier-exact (differential)"),
    "scan_bfill": ("exact-arith", "order-carry selection; tier-exact (differential)"),
    "scan_shift": ("exact-arith", "row offset, value copies"),
    "scan_diff": ("exact-arith", "local 2-row arithmetic"),
    "scan_two_pass_ffill": ("exact-arith", "order-carry selection under chunked tier; tier-exact"),
    # --- sequential-order prefix floats
    "scan_nancumsum": ("seq-window", "method='window' PINNED r12; fold order == oracle window SQL"),
    "ewma_scan": ("seq-window", "sequential recurrence == oracle's list-order replay; magnitude bounded by decay"),
    # --- chunked tier on integer grid
    "scan_two_pass": ("chunked-int", "round(v*100) cents r12; exact under any association < 2^53"),
    # --- NaN-poison bounded prefix
    "scan_cumsum": ("poison-capped", "numeric run ~geometric(5%): magnitude ~log(n); sf10 digest exact"),
    # --- magnitude-bounded reassociating folds
    "mean": ("bounded", "mean: scale-invariant magnitude"),
    "nanmean": ("bounded", "mean"),
    "var": ("bounded", "normalized moments"),
    "nanvar": ("bounded", "normalized moments"),
    "std": ("bounded", "normalized moments"),
    "nanstd": ("bounded", "normalized moments"),
    "complex_nanmean": ("bounded", "component means"),
    "complex_nanvar": ("bounded", "normalized component moments"),
    "wmean": ("bounded", "normalized weighted mean"),
    "twa": ("bounded", "time-weighted mean (normalized)"),
    "fill_stat": ("bounded", "imputes group mean"),
    "prod": ("bounded", "l_orderkey groups <=7 rows: bounded product"),
    "nanprod": ("bounded", "l_orderkey groups <=7 rows: bounded product"),
    "scan_cumprod": ("bounded", "user_id groups: cardinality scales with corpus, group size ~const"),
    "scan_nancumprod": ("bounded", "user_id groups: group size ~const"),
    "xdim_reduce": ("bounded", "nanmean"),
    "xdim_bins": ("bounded", "nanmean"),
    "xdim_dataset": ("bounded", "nanmean"),
    "accessor_climatology": ("bounded", "means per calendar key"),
    "month_hour": ("bounded", "means per calendar key"),
    "dayofyear": ("bounded", "means per calendar key"),
    "resample_5d": ("bounded", "bucket means"),
    "resample_time": ("bounded", "bucket means"),
    "resample_dense_keys": ("bounded", "bucket means"),
    "bivar": ("bounded", "normalized moments"),
    "corr": ("bounded", "correlation in [-1,1]"),
    "spearman": ("bounded", "rank correlation in [-1,1]"),
    "ks": ("bounded", "statistic in [0,1]"),
    "chisq": ("bounded", "normalized statistic"),
    "ttest": ("bounded", "normalized statistic"),
    "auc": ("bounded", "probability in [0,1]"),
    "calibration": ("bounded", "bucket rates in [0,1]"),
    "psi": ("bounded", "normalized divergence"),
    "psi_hist": ("bounded", "normalized divergence"),
    "describe": ("bounded", "means/stds (+ selections)"),
    "skew_stats": ("bounded", "normalized moments"),
    "entropy": ("bounded", "normalized char distribution"),
    "repetition": ("bounded", "ratios over per-doc counts"),
    "gopher": ("bounded", "per-doc ratios"),
    "lm_score": ("bounded", "per-token normalized log-probs"),
    "dsir": ("bounded", "per-doc importance ratios"),
    "clf_score": ("bounded", "per-doc normalized scores"),
    "bm25": ("bounded", "per-doc normalized scores"),
    "tfidf": ("bounded", "per-doc tf (doc-length-bounded) x idf (log)"),
    "text_stats": ("bounded", "per-doc ratios"),
    "funnel": ("bounded", "step rates in [0,1]"),
    "funnel_timing": ("bounded", "mean durations (span-bounded)"),
    "funnel_window": ("bounded", "step rates in [0,1]"),
    "retention": ("bounded", "cohort rates in [0,1]"),
    "linreg": ("bounded", "normalized regression coefficients"),
    "grouped_linreg": ("bounded", "normalized regression coefficients"),
    "logreg_quality": ("bounded", "probabilities / rates"),
    "grouped_logreg": ("bounded", "probabilities / rates"),
    "target_encode": ("bounded", "smoothed per-key means"),
    "pagerank": ("bounded", "probability mass <= 1 per node"),
    "centroids": ("bounded", "per-group dimension means"),
    "rolling": ("bounded", "fixed-frame window: magnitude scale-invariant"),
    "rolling_frac": ("bounded", "fixed-frame window"),
    "stream_agg": ("bounded", "1-day-window sums: window-bounded"),
    "stream_window": ("bounded", "windowed sums: window-bounded"),
    "stream_sliding": ("bounded", "windowed sums: window-bounded"),
    "stream_session": ("bounded", "session-bounded sums"),
    "stream_late": ("bounded", "windowed sums: window-bounded"),
    "stream_cumsum": ("bounded", "per-user totals: user cardinality scales, group size ~const"),
    # --- magnitude-growing few-row totals (see class note)
    "sum": ("grows", "6-group totals over lineitem: |total| ~ sf-linear; exact through sf10"),
    "nansum": ("grows", "6-group totals: sf-linear; exact through sf10"),
    "rollup": ("grows", "cube-level cell sums: sf-linear; exact at sf1"),
    "pivot": ("grows", "pivot cell sums: sf-linear; exact at sf1"),
    "bins_left": ("grows", "5-bin quantity totals: sf-linear; exact at sf1"),
}

CLASS_ORDER = [
    "no-float", "exact-arith", "seq-window", "chunked-int", "poison-capped",
    "bounded", "grows",
]


def main():
    import __spark_entry__ as entry

    keys = list(entry.queries())
    schemas = None
    if "--schemas" in sys.argv:
        schemas = json.load(open(sys.argv[sys.argv.index("--schemas") + 1]))

    rows = []
    problems = []
    for k in sorted(keys):
        if k in FLOAT_CLASS:
            cls, note = FLOAT_CLASS[k]
        else:
            cls, note = "no-float", "integer/string/bool/timestamp output"
        if schemas is not None and k in schemas:
            has_float = any(
                t in ("double", "float") for t in schemas[k].values()
            )
            if has_float and cls == "no-float":
                problems.append(f"{k}: float output but classified no-float")
            if not has_float and cls not in ("no-float",):
                # classified as a float class without float columns
                problems.append(f"{k}: no float output but classified {cls}")
        rows.append((k, cls, note))
    extra = sorted(set(FLOAT_CLASS) - set(keys))
    if extra:
        problems.append(f"classified but unregistered keys: {extra}")

    counts = {}
    for _, cls, _ in rows:
        counts[cls] = counts.get(cls, 0) + 1

    print(f"keys: {len(rows)}")
    for cls in CLASS_ORDER:
        print(f"  {cls:14s} {counts.get(cls, 0)}")
    if problems:
        print("\nPROBLEMS:")
        for p in problems:
            print(" ", p)
        sys.exit(1)

    if "--markdown" in sys.argv:
        print()
        print("| key | class | why the grid can't flip (or when it could) |")
        print("|---|---|---|")
        for k, cls, note in rows:
            print(f"| `{k}` | {cls} | {note} |")


if __name__ == "__main__":
    main()
