#!/bin/bash
# sf10 scale probe (round 10): run the scale-sensitive shortlist
# Spark-side at matched settings, first at sf1 (the ratio baseline —
# the r9 sf1 artifacts used 16 cpus / 32 partitions, not comparable)
# and then at sf10.  One fresh driver_sim process PER QUERY so a
# crash mid-probe loses only the in-flight query (the first r10
# attempt ran all 8 in one process and lost everything when the
# session hosting the background job died), and so each query's wall
# is measured in a fresh JVM (the bench.py methodology).
#
# Usage: setsid nohup bash scripts/probe_sf10.sh &   (fully detached)
set -u
cd "$(dirname "$0")/.."

QUERIES=(
  simhash_doc_pairs
  graph_lpa_community_sizes
  minhash_lsh_pairs
  graph_components
  corpus_curation_funnel
  doc_repetition_scores
  cf_item_similarities
  dedup_canonical_docs
)

# 16g heap, NOT 64g: the isolation matrix in SCALE.md (r10) measured
# minhash_lsh_pairs at sf1 8x SLOWER under a 64g heap than 16g at
# identical cpus/partitions (437-492s vs 48-57s; 32g lands between at
# 105s; GC pause logs rule out stop-the-world time — the cost is the
# oversized in-memory hash-aggregation state of the candidate-pair
# distinct, which stays resident instead of taking the
# better-locality sort/spill path). Same effect on graph_lpa
# (208s@64g -> 44s@16g). A generic Tungsten groupBy-count is
# heap-insensitive (measured), so moderate heaps + scale-out is the
# right cluster prescription, not big heaps.
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

run_pass "$PWD/scaledata/sf1"  scale_artifacts/probe_sf1_matched.log
run_pass "$PWD/scaledata/sf10" scale_artifacts/probe_sf10.log
echo "ALL DONE" >> scale_artifacts/probe_sf10.log
