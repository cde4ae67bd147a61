#!/bin/bash
# sf10 graph-family receipts (round 12, verdict ask 5): G2/G4 get
# wall + FULL DuckDB-oracle parity at sf10 on the forced-distributed
# code paths (the sf10 co-occurrence graphs are far above the 200k
# local caps, so the registered queries' distributed loops run by
# construction — same argument as the sf1 receipts, one decade up).
# G3's sampled betweenness is rows-only by design (no SQL oracle), so
# it records wall + row shape Spark-side.
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
SFDIR="$PWD/scaledata/sf10"
LOG=scale_artifacts/probe_sf10_graph.log
: > "$LOG"

# full-oracle rows (pointer-jumping CC oracle + LPA replay — both
# bounded, sf-capable per the r11 oracle rewrite)
for q in graph_components graph_lpa_community_sizes; do
  echo "=== $q @ sf10 ORACLE $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$SFDIR" timeout 5400 \
    python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
done

# rows-only (Spark side, wall + shape)
for q in graph_betweenness_sampled betweenness_mass_check; do
  echo "=== $q @ sf10 SPARK-ONLY $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_SKIP_ORACLE=1 timeout 5400 \
    python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
