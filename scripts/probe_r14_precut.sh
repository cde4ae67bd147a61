#!/bin/bash
# r14 receipts (r13 verdict tasks 1 + 6):
#  (a) the LSH-pre-cut co-occurrence edge build vs the exact build at
#      sf1 and sf10 — the exact Sigma-d^2 expansion is the graph
#      family's scale-killer (502-685 s at sf10, SCALE.md r13); the
#      receipt shows the pre-cut build's curve next to the exact
#      build's on the SAME session methodology (one fresh driver_sim
#      process per query, Spark-only: full-oracle parity for the
#      pre-cut pipeline is established by the r14 CORRECTNESS row at
#      sf0.01 and the minhash CTE family's sf1 receipts).
#  (b) son_itemsets at sf10 under the FRACTIONAL support mode — no
#      manually-sized absolute: support = ceil(n_baskets/750), the
#      same integer arithmetic both engines run. On this
#      catalog-growing corpus that is deliberately selective (empty
#      mined set, documented in SCALE.md) — the receipt is "runs
#      clean, no phase-1 breaker, no manual override".
# 16g heap per the measured 64g-heap cliff (SCALE.md).
#
# Usage: setsid nohup bash scripts/probe_r14_precut.sh &
set -u
cd "$(dirname "$0")/.."

export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
export SPARK_GRAFT_SKIP_ORACLE=1
LOG=scale_artifacts/probe_r14_precut.log
: > "$LOG"

for sf in sf1 sf10; do
  for q in cooccurrence_pairs_lsh cooccurrence_pairs; do
    echo "=== $q @ $sf SPARK-ONLY $(date -u +%H:%M:%S) ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$PWD/scaledata/$sf" timeout 3600 \
      python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
    echo "=== exit=$? ===" >> "$LOG"
  done
done

echo "=== son_itemsets @ sf10 FRAC 1/750 $(date -u +%H:%M:%S) ===" >> "$LOG"
SPARK_GRAFT_SF_DIR="$PWD/scaledata/sf10" SPARK_GRAFT_ITEMSET_SUPPORT_FRAC=1/750 \
  timeout 3600 python scripts/driver_sim.py son_itemsets >> "$LOG" 2>&1
echo "=== exit=$? ===" >> "$LOG"
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
