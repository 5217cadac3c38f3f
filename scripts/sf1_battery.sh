#!/bin/bash
# sf1 battery — every verifiable contract key at 10x driver scale, ONE
# artifact (r11, +lsh_coverage r12): 187 DuckDB exact-value keys + the
# ewma_scan pandas differential + the 4 closure-class tier-vs-tier
# certificates = 192/196 keys.  The 4 keys outside (pca_embed media_phash
# media_video audio_neardup) are pinned-fixture oracles whose payloads
# are scale-independent by construction (see the exclusion note
# below).  See BASELINE for per-round tallies.
#
# Usage:  scripts/make_sf1.py /tmp/sf1   # once per container
#         scripts/sf1_battery.sh [sf_dir] [batch...]
#
# Runs the gate per BATCH (a stuck oracle then costs one batch, not the
# battery) and prints a PASS/FAIL tally.  ewma_scan is checked by
# scripts/sf1_ewma_check.py — a full-table pandas differential at the
# key's own rounding grid — because its DuckDB list-form oracle is
# O(n^2) memory/time at 1M rows.  (r10 audit: this header used to claim
# a gate-internal ewma differential that did not exist, and the batch
# listed a stale key name `ewma` that silently no-opped — ewma_scan had
# never actually run at sf1 before the dedicated check below.)
#
# EXCLUDED from the DuckDB battery (8), each for a stated structural
# reason — do NOT re-add without solving the underlying bound:
#   dup_clusters keep_by_dedup leak_split semdedup
#       oracle embeds the recursive-CTE closure over ~866k sf1 pairs
#       (DuckDB-impractical).  ALL FOUR hold sf1 tier-vs-tier
#       certificates instead: the clustering primitive via
#       scripts/soak_cluster_tiers.py (driver union-find ≡ distributed
#       min-label, exact label map), and the three composed pipelines
#       END-TO-END via scripts/soak_pipeline_tiers.py (r11: final
#       keeper/survivor/split decisions exact-multiset-equal across
#       forced tiers, + the no-cluster-straddles-split invariant).
#       Both certificate scripts run at the END of this battery and
#       count into its tally.
#   pca_embed media_phash media_video audio_neardup
#       pinned-fixture oracles; payloads are scale-independent
set -u
SF="${1:-/tmp/sf1}"
cd "$(dirname "$0")/.."

BATCHES=(
  "sum mean var std min max argmin nanargmin first last nanfirst any all median nanquantile_vec"
  "count nansum nanmean nanvar quantile min_count bins_left bins_right grid_fill mode nanmedian argmax first_ts nunique nanstd nanmin nanmax nanargmax nanlast approx_quantile nanmode prod nanprod mean_ts reindex_fill"
  "scan_cumsum scan_ffill scan_bfill scan_cummax scan_cumcount scan_shift scan_diff scan_nancumsum scan_cummin scan_nancummin scan_nancummax scan_cumprod scan_nancumprod scan_two_pass scan_two_pass_ffill"
  "complex_nanmean complex_nanvar complex_argmax complex_nanmedian month_hour dayofyear resample_5d resample_time resample_dense_keys accessor_climatology calendar_mean xdim_reduce xdim_bins xdim_dataset rollup pivot"
  "rank rank_two_pass rolling rolling_frac interp_time qcut qcut_grouped qcut_two_pass winsorize fill_stat sessionize twa corr wquantile wquantile_sketch"
  "minhash simhash fingerprint entropy repetition lm_score clf_score dsir ngram_counts top_terms para_dedup seg_dedup dup_spans span_dedup dedup_exact lsh_pairs ngram_jaccard ngram_containment fuzzy_match fuzzy_scaled fuzzy_coverage"
  "ann_topk ann_lsh ann_ivf ann_recall emb_neardup lsh_coverage centroids mh_index_probe bpe_tokens vocab encode_ids"
  "ttest mad qnorm outliers calibration bivar psi psi_hist auc ks chisq spearman skew_stats describe"
  "cms_heavy kmv_distinct kmv_overlap hist_quantile quantize profile"
  "stream_window stream_sliding stream_late stream_session stream_agg stream_join stream_enrich stream_dedup stream_cumsum stream_cms"
  "asof_join salted_join range_join overlap_join bloom_join group_topk sample_per_group wmean wsample table_diff validate zorder"
  "split chunk_docs pack decontaminate bloom_decontam pii_redact k_anonymity mixture curate multimodal_meta sql_entry"
  "linreg grouped_linreg logreg_quality grouped_logreg target_encode funnel funnel_window funnel_timing retention pagerank text_stats langid tfidf gopher bm25 json_extract"
)

pass=0; fail=0; failed=""
# ewma_scan: pandas differential (see header)
out=$(timeout 1800 python scripts/sf1_ewma_check.py "$SF" 2>/dev/null | grep -aE "^(PASS|FAIL)")
echo "$out"
p=$(grep -ac '^PASS' <<<"$out"); f=$(grep -ac '^FAIL' <<<"$out")
# no PASS line at all (crash / timeout / empty output) counts as a FAIL —
# a silently absent check must not tally as neither (r11 ADVICE)
if [ "$p" -eq 0 ]; then f=$((f>0 ? f : 1)); fi
pass=$((pass+p)); fail=$((fail+f))
[ "$f" -gt 0 ] && failed="$failed ewma_scan"
for b in "${BATCHES[@]}"; do
  # strip keys that don't exist (placeholder guard)
  out=$(timeout 1800 python scripts/check_driver_contract.py "$SF" $b 2>/dev/null | grep -aE "^(PASS|FAIL|ok\?)")
  echo "$out"
  p=$(grep -ac '^PASS' <<<"$out"); f=$(grep -ac '^FAIL' <<<"$out")
  pass=$((pass+p)); fail=$((fail+f))
  [ "$f" -gt 0 ] && failed="$failed $(grep -a '^FAIL' <<<"$out" | awk '{print $2}' | tr -d ':')"
done
# closure-class keys (dup_clusters keep_by_dedup semdedup leak_split):
# DuckDB-impractical oracles, verified instead by tier-vs-tier
# certificates at the same SF — counted into the tally so the battery
# is one complete artifact (r11).  Absence of output counts as FAIL.
out=$(timeout 3600 python scripts/soak_cluster_tiers.py "$SF" 2>/dev/null | grep -ao '"mismatches": [0-9]*')
echo "cluster certificate: ${out:-NO OUTPUT}"
if [ "$out" = '"mismatches": 0' ]; then pass=$((pass+1)); else fail=$((fail+1)); failed="$failed dup_clusters(cert)"; fi
out=$(timeout 3600 python scripts/soak_pipeline_tiers.py "$SF" 2>/dev/null | grep -aoE '"pipeline": "[a-z_]*", .*"mismatches": [0-9]*')
echo "pipeline certificates:"; echo "$out"
p=$(grep -ac '"mismatches": 0' <<<"$out"); f=$((3-p))
pass=$((pass+p)); fail=$((fail+f))
[ "$f" -gt 0 ] && failed="$failed pipeline-certs($f)"
# tier-reassociation differential (r12): every two-pass-capable func,
# window vs chunked — 11 extra certificate lines on top of the per-key
# tally (order-insensitive funcs bit-exact; order-sensitive folds
# placement-exact within rel 1e-9, drift/grid headroom recorded).
out=$(timeout 3600 python scripts/tier_reassoc_check.py "$SF" 2>/dev/null | grep -aoE "(PASS|FAIL) tier_reassoc[^,]*")
echo "$out"
p=$(grep -ac '^PASS' <<<"$out"); f=$(grep -ac '^FAIL' <<<"$out")
if [ "$p" -eq 0 ]; then f=$((f>0 ? f : 1)); fi
pass=$((pass+p)); fail=$((fail+f))
[ "$f" -gt 0 ] && failed="$failed tier_reassoc"
echo "== sf1 battery: $pass PASS, $fail FAIL${failed:+ (failed:$failed)}"
