#!/bin/bash
# Follow-up to probe_sf10.sh: measure the SCALE-PATH twins of the
# three shortlist members that exceeded their pre-registered bounds
# at sf10 (exact funnel + exact dedup died on local disk; uncapped
# minhash grew 22x) — same settings as the main probe.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SKIP_ORACLE=1
export SPARK_GRAFT_DRIVER_MEM=16g
export SPARK_GRAFT_SIM_CPUS=32
export SPARK_GRAFT_SIM_PARTS=128
LOG=scale_artifacts/probe_sf10_twins.log
: > "$LOG"
for sfdir in "$PWD/scaledata/sf1" "$PWD/scaledata/sf10"; do
  for q in corpus_curation_funnel_lsh dedup_canonical_docs_lsh; do
    echo "=== $q @ $sfdir $(date -u +%H:%M:%S) ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$sfdir" timeout 3600 \
      python scripts/driver_sim.py "$q" >> "$LOG" 2>&1
    echo "=== exit=$? ===" >> "$LOG"
  done
  echo "=== minhash_capped @ $sfdir $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 python scripts/minhash_capped_probe.py "$sfdir" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
done
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
