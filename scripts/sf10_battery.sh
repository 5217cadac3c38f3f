#!/bin/bash
# sf10 exact-value oracle battery — 100x DRIVER SCALE (r11).
#
# Usage:  SPARK_GRAFT_SF_SRC=/tmp/sf1 scripts/make_sf1.py /tmp/sf10 10
#         scripts/sf10_battery.sh [sf_dir]
#
# A CURATED subset (~36 keys) of the sf1 battery: every key here has a
# DuckDB oracle that stays cheap at 60M lineitem / 10M events / 500k
# documents rows.  The selection criterion is ORACLE cost, not engine
# capability — the engine side of every excluded key already carries
# sf1 exact evidence (scripts/sf1_battery.sh, 187/195) and the
# closure-class pipelines carry tier-vs-tier certificates; re-running a
# recursive-CTE or all-pairs SQL oracle at 100x is a DuckDB bound, not
# an engine bound.  keep_by_dedup additionally gets an sf10 tier
# certificate via scripts/soak_pipeline_tiers.py (its contract config
# is bucket-capped + spill-guarded, so the engine side scales;
# leak_split/dup_clusters pin UNCAPPED pair configs whose pair count
# grows ~quadratically with bucket occupancy — a stated property of the
# uncapped configuration, which is exactly why the capped/spilled
# defaults exist).
set -u
SF="${1:-/tmp/sf10}"
cd "$(dirname "$0")/.."

BATCHES=(
  "sum nansum mean nanmean var nanvar std nanstd min max nanmin nanmax argmax argmin nanargmin nanargmax first last nanfirst nanlast any all count prod nanprod min_count nunique mode median quantile"
  "scan_cumsum scan_ffill scan_bfill scan_two_pass scan_nancumsum rank"
  "month_hour dayofyear resample_5d calendar_mean"
  "asof_join salted_join group_topk dedup_exact sessionize twa"
)

pass=0; fail=0; failed=""
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
