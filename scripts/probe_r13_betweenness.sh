#!/bin/bash
# r13 receipt: fixed-root sampled betweenness (n_roots=192) at sf1 and
# sf10, replacing the r12 fractional knob whose per-decade growth was
# 9.2x (roots grew with V). Matched settings with the r12 probe
# (probe_sf10_graph.sh): 16g heap, 32 cpus, 128 shuffle partitions,
# Spark-side only, one fresh driver_sim process per query.
#
# Usage: setsid nohup bash scripts/probe_r13_betweenness.sh &
set -u
cd "$(dirname "$0")/.."

export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
export SPARK_GRAFT_SKIP_ORACLE=1
LOG=scale_artifacts/probe_r13_betweenness.log
: > "$LOG"

for sf in sf1 sf10; do
  for q in graph_betweenness_sampled betweenness_mass_check; do
    echo "=== $q @ $sf SPARK-ONLY $(date -u +%H:%M:%S) ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$PWD/scaledata/$sf" timeout 3600 \
      python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
    echo "=== exit=$? ===" >> "$LOG"
  done
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
