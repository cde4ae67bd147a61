#!/bin/bash
# r17 scale receipts (r16 verdict tasks 1, 4, 5, 6):
#   sf10 — dedup_keep_best_docs + corpus_curation_funnel_semantic
#          (the two r16 rows that lacked an sf10 receipt), plus the
#          completed BPE chain (task 1 wants sf1 AND sf10).
#   sf1  — the r17 debuts: BPE chain, corpus_curation_funnel_modelq,
#          media_dedup_canonical.
# Same settings as probe_sf10_twins.sh: Spark-side walls only
# (SPARK_GRAFT_SKIP_ORACLE=1 — the oracles for these rows are either
# deliberately quadratic in DuckDB or rows-only by nature), fresh
# process per query, 16g driver.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SKIP_ORACLE=1
export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
LOG=scale_artifacts/probe_r17_receipts.log
: > "$LOG"

run() {
  local sfdir="$1"; shift
  for q in "$@"; do
    echo "=== $q @ $sfdir $(date -u +%H:%M:%S) ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$sfdir" timeout 3600 \
      python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
    echo "=== exit=$? ===" >> "$LOG"
  done
}

run "$PWD/scaledata/sf1" \
  bpe_learned_merges bpe_token_counts packed_sequence_stats_bpe \
  corpus_curation_funnel_modelq media_dedup_canonical
run "$PWD/scaledata/sf10" \
  bpe_learned_merges bpe_token_counts packed_sequence_stats_bpe \
  dedup_keep_best_docs corpus_curation_funnel_semantic
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
