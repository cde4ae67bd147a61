#!/bin/bash
# r13: Spark-side scale receipts for the query families that had no
# sf1/sf10 receipt yet (itemsets, ANN, BFR/k-means, streaming windows,
# as-of, sketches). Matched to the probe_sf10.sh methodology: fresh
# driver_sim process per query, 16g heap (the r10 64g-heap cliff),
# SKIP_ORACLE (receipts are Spark-side walls; these oracles are
# mostly linear but the DuckDB replay wall would dominate the log).
set -u
cd "$(dirname "$0")/.."

QUERIES=(
  son_itemsets
  fpgrowth_itemsets
  ann_topk_exact
  ann_topk_lsh
  ann_topk_ivf
  ann_topk_ivfpq
  ann_recall_check
  bfr_round_stats
  kmeans_cluster_sizes
  window_tumbling_hourly
  session_windows_per_user
  asof_last_purchase
  cm_heavy_hitter_partkeys
  fm_distinct_users
)

export SPARK_GRAFT_SKIP_ORACLE=1
export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128

run_pass() {
  local sfdir="$1" log="$2"
  : > "$log"
  for q in "${QUERIES[@]}"; do
    echo "=== $q @ $sfdir $(date -u +%H:%M:%S) ===" >> "$log"
    SPARK_GRAFT_SF_DIR="$sfdir" timeout 3600 \
      python scripts/driver_sim.py "$q" >> "$log" 2>&1
    echo "=== exit=$? ===" >> "$log"
  done
  echo "PASS DONE $(date -u +%H:%M:%S)" >> "$log"
}

run_pass "${1:-$PWD/scaledata/sf1}" "${2:-scale_artifacts/probe_r13_families_sf1.log}"
