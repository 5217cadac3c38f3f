#!/bin/bash
# sf10 exact-value oracle battery — 100x DRIVER SCALE (r11; grown from
# ~45 to ~131 keys in r12, VERDICT r11 #4: the old selection was by
# assumed DuckDB-oracle cost, which had silently excluded exactly the
# skew-prone families the 100 TB story rests on — probing showed almost
# all of them are exact AND affordable at sf10).
#
# Usage:  SPARK_GRAFT_SF_SRC=/tmp/sf1 scripts/make_sf1.py /tmp/sf10 10
#         scripts/sf10_battery.sh [sf_dir]
#
# EXCLUDED, each with its structural reason (do NOT re-add without
# solving the underlying bound):
#   dup_clusters keep_by_dedup leak_split semdedup
#       recursive-CTE closure oracles (DuckDB bound); all four hold
#       tier-vs-tier certificates instead (soak_cluster_tiers /
#       soak_pipeline_tiers — keep_by_dedup's runs at sf10).
#   emb_neardup lsh_pairs
#       pin UNCAPPED pair configs: on the ~99.95%-near-duplicate
#       synthetic corpus candidate pairs grow ~quadratically (≳10^9 at
#       sf10) on BOTH engines — a declared property of the uncapped
#       primitives; the capped/spilled production path is covered by
#       keep_by_dedup's sf10 certificate + minhash/mh_index_probe/
#       lsh_coverage sf10 rows.
#   kmv_distinct kmv_overlap
#       pinned k=2^16 EXACT-regime premise (k > group distinct) breaks
#       at sf10 (150k distinct users) — the documented regime boundary,
#       not a bug; the estimating regime's error bound is test-covered
#       (test_kmv).
#   fuzzy_match fuzzy_scaled
#       candidate set grows ~quadratically with corpus density on the
#       template-name corpus (3.2M pairs at sf1, max_dist=1): the
#       full-blocking DuckDB oracle is a DuckDB bound.  Cheap tier
#       instead: scripts/soak_fuzzy_tiers.py — plain vs PPJoin-prefix
#       blocking, exact pair-multiset digests (PASS at sf0.01 + sf1).
#   pagerank
#       iterative-rank DuckDB oracle spills >70 GB temp at 10M events.
#   qcut qcut_grouped qcut_two_pass auc qnorm encode_ids
#       PROBED EXACT at sf10 in r12 (one-time rows: 950/909/876/326/
#       306/275s) — kept out of the ROUTINE battery for runtime only.
#   pca_embed media_phash media_video audio_neardup
#       pinned-fixture oracles; payloads scale-independent.
set -u
SF="${1:-/tmp/sf10}"
cd "$(dirname "$0")/.."

BATCHES=(
  "sum nansum mean nanmean var nanvar std nanstd min max nanmin nanmax argmax argmin nanargmin nanargmax first last nanfirst nanlast any all count prod nanprod min_count nunique mode median quantile"
  "scan_cumsum scan_ffill scan_bfill scan_two_pass scan_nancumsum rank"
  "month_hour dayofyear resample_5d calendar_mean"
  "asof_join salted_join group_topk dedup_exact sessionize twa"
  # --- r12 growth (every key below probed exact at sf10 this round)
  "accessor_climatology ann_ivf ann_lsh ann_recall ann_topk approx_quantile bins_left bins_right bivar bm25 calibration centroids chisq complex_argmax complex_nanmean complex_nanmedian"
  "complex_nanvar corr describe entropy fill_stat fingerprint funnel funnel_timing funnel_window gopher grid_fill grouped_linreg grouped_logreg hist_quantile interp_time json_extract"
  "ks langid linreg logreg_quality lsh_coverage mad mean_ts mh_index_probe minhash nanquantile_vec ngram_counts outliers pivot profile rank_two_pass reindex_fill"
  "repetition resample_time retention rolling rolling_frac rollup sample_per_group scan_cumcount scan_cummax scan_cummin scan_cumprod scan_diff scan_nancummax scan_nancummin scan_nancumprod scan_shift"
  "scan_two_pass_ffill skew_stats spearman sql_entry table_diff text_stats tfidf top_terms ttest validate winsorize wmean wquantile wquantile_sketch wsample zorder"
  "bloom_decontam bpe_tokens curate decontaminate dsir dup_spans fuzzy_coverage k_anonymity mixture multimodal_meta para_dedup quantize seg_dedup simhash span_dedup split"
  # --- r12 final tranche (probed exact at sf10 after the mid-tranche
  # stall was identified: it was `pack`, whose DuckDB oracle is a
  # row-at-a-time RECURSIVE CTE — >25 min of all cores at 500k docs, a
  # DuckDB bound now covered by the local-walk tier below; probe rows:
  # lm_score 30s clf_score 25s vocab 4s chunk_docs 130s pii_redact 20s
  # cms_heavy 13s overlap_join 8s)
  "lm_score clf_score vocab chunk_docs pii_redact cms_heavy overlap_join"
)
# STILL EXCLUDED beyond the header list: target_encode PROBED EXACT in
# r12 (60M-row streamed digest, 868s one-time row — the qcut runtime
# class, out of the ROUTINE battery); pack excluded (DuckDB
# recursive-CTE oracle bound — exact local-walk tier runs below);
# stream_* family (rows-only keys, no DuckDB oracle at any scale —
# sf10 standing is the streaming suite + watermark-drop proofs);
# range/bloom joins sf1-exact, unprobed; pagerank (DuckDB temp-spill).

pass=0; fail=0; failed=""
# pack: exact local-walk tier (see scripts/sf10_pack_check.py header —
# greedy packing is O(n)-replayable on the collected 4-column table, so
# every row is value-checked without SQL recursion; 14.6s at sf10)
out=$(timeout 1800 python scripts/sf10_pack_check.py "$SF" 2>/dev/null | grep -aE "^(PASS|FAIL) pack")
echo "$out"
p=$(grep -ac '^PASS' <<<"$out"); f=$(grep -ac '^FAIL' <<<"$out")
if [ "$p" -eq 0 ]; then f=$((f>0 ? f : 1)); fi
pass=$((pass+p)); fail=$((fail+f))
[ "$f" -gt 0 ] && failed="$failed pack"
# Tier-reassociation differential (r12, generalizing the r11 one-off
# scan_nancumsum check): every two-pass-capable func window-vs-chunked
# at 10M rows — order-insensitive funcs bit-exact, order-sensitive
# folds placement-exact within relative 1e-9, drift/grid headroom
# recorded.  The r11 finding stands in its output: chunked float
# summation drifts ~1e-13 relative (double ULP, same property as the
# reference's blockwise dask scan), which is why the scan_nancumsum
# contract key now PINS the window tier (exact batch above) and
# scan_two_pass runs on an integer-quantized grid.
out=$(timeout 1800 python scripts/tier_reassoc_check.py "$SF" 2>/dev/null | grep -aoE "(PASS|FAIL) tier_reassoc.*")
echo "$out"
p=$(grep -ac 'PASS' <<<"$out"); f=$(grep -ac 'FAIL' <<<"$out")
if [ "$p" -eq 0 ]; then f=$((f>0 ? f : 1)); fi
pass=$((pass+p)); fail=$((fail+f))
[ "$f" -gt 0 ] && failed="$failed tier_reassoc"
for b in "${BATCHES[@]}"; do
  out=$(timeout 3600 python scripts/check_driver_contract.py "$SF" $b 2>/dev/null | grep -aE "^(PASS|FAIL|ok\?)")
  echo "$out"
  p=$(grep -ac '^PASS' <<<"$out"); f=$(grep -ac '^FAIL' <<<"$out")
  # a batch with zero PASS lines (crash / timeout) must not tally as clean
  if [ "$p" -eq 0 ] && [ "$f" -eq 0 ]; then f=1; failed="$failed batch:[${b%% *}...]"; fi
  pass=$((pass+p)); fail=$((fail+f))
  [ "$f" -gt 0 ] && failed="$failed $(grep -a '^FAIL' <<<"$out" | awk '{print $2}' | tr -d ':')"
done
echo "== sf10 battery: $pass PASS, $fail FAIL${failed:+ (failed:$failed)}"
