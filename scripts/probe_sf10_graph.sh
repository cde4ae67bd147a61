#!/bin/bash
# sf10 graph-family receipts (round 12, verdict ask 5): G2/G3/G4 walls
# + row shapes at sf10 on the forced-distributed code paths (the sf10
# co-occurrence graphs are far above the 200k/500 local caps, so the
# registered queries' distributed loops run by construction).
# Spark-side only (SPARK_GRAFT_SKIP_ORACLE=1), matching the r10 sf10
# methodology: the FULL-oracle parity receipts for this family live
# at sf1 (CORRECTNESS-window rows + scale_artifacts/graph_proof.json,
# bit-identical distributed-vs-local). A full DuckDB replay at sf10
# was attempted this round and abandoned: the CC oracle alone burned
# >40 min inside DuckDB (edge-build self-join + pointer-jump rounds
# over the ~10x graph) with the round's wall budget unable to carry
# four of those — the oracle's job is cross-engine truth, which sf1
# already established; sf10 is about WALL growth on the Spark plans.
#
# One fresh driver_sim process per query (bench.py methodology: a
# crash loses only the in-flight query; each wall is a fresh JVM).
# 16g heap per the measured 64g-heap cliff (SCALE.md).
#
# Usage: setsid nohup bash scripts/probe_sf10_graph.sh &
set -u
cd "$(dirname "$0")/.."

export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
export SPARK_GRAFT_SKIP_ORACLE=1
SFDIR="$PWD/scaledata/sf10"
LOG=scale_artifacts/probe_sf10_graph.log
: > "$LOG"

for q in graph_components graph_lpa_community_sizes \
         graph_betweenness_sampled betweenness_mass_check; do
  echo "=== $q @ sf10 SPARK-ONLY $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$SFDIR" timeout 3600 \
    python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
