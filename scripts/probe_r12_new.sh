#!/bin/bash
# sf10 receipts for the r12 queries (verdict asks 2-3):
# - pii_redact_stats runs WITH its DuckDB oracle (linear replay, same
#   shape as the detection query's 19.1 s sf10 receipt).
# - duplicate_ngram_spans_winnowed vs the uncut duplicate_ngram_spans
#   run Spark-side at sf1 AND sf10 (matched settings) so SCALE.md can
#   state the candidate-cut trade with walls, not prose. The winnowed
#   DuckDB oracle replays the whole winnow chain — quadratic-free but
#   heavy in a single DuckDB process — so scale receipts are
#   Spark-side; cross-engine parity is pinned at sf0.01 by the driver
#   row.
#
# Usage: setsid nohup bash scripts/probe_r12_new.sh &
set -u
cd "$(dirname "$0")/.."

export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
LOG=scale_artifacts/probe_r12_new.log
: > "$LOG"

echo "=== pii_redact_stats @ sf10 ORACLE $(date -u +%H:%M:%S) ===" >> "$LOG"
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10" timeout 3600 \
  python scripts/driver_sim.py pii_redact_stats >> "$LOG" 2>&1
echo "=== exit=$? ===" >> "$LOG"

for sfdir in "$PWD/scaledata/sf1" "$PWD/scaledata/sf10"; do
  for q in duplicate_ngram_spans duplicate_ngram_spans_winnowed; do
    echo "=== $q @ $sfdir SPARK-ONLY $(date -u +%H:%M:%S) ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_SKIP_ORACLE=1 timeout 5400 \
      python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
    echo "=== exit=$? ===" >> "$LOG"
  done
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
