#!/bin/bash
# Round-open checklist, mechanized (the ENGINE_STATUS regen was
# hand-skipped three rounds running before r13 automated it; this
# script is the one command the next round runs FIRST):
#   1. regenerate ENGINE_STATUS.md from the newest CORRECTNESS_r*.json
#   2. print the computed must-rotate set / suggested driver window
#      (exits non-zero if the committed _DRIVER_ORDER is already stale)
#   3. run the registry invariants (window staleness + capacity)
set -e
cd "$(dirname "$0")/.."
python scripts/make_engine_status.py > /dev/null && echo "ENGINE_STATUS.md regenerated"
python scripts/make_driver_order.py
python -m pytest tests/test_registry.py -q
