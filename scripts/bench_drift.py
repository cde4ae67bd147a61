#!/usr/bin/env python
"""Adjudicate round-over-round bench drift with the cpu_sec signal
(r13 verdict task 7, automating what BENCH_NOTES did in prose).

The r13 sidecar added per-sample process-tree CPU seconds precisely
because wall-clock alone cannot separate a co-tenant burst from a
real plan regression: a burst inflates wall 2-5x while CPU barely
moves; a regression moves both. This script compares two
BENCH_SPREAD.json sidecars per query and classifies every mover:

  REGRESSION  wall up >= 30% AND cpu up >= 30%   -> code/plan suspect
  BOX         wall up >= 30% but cpu up  < 15%   -> co-tenant noise
  MIXED       wall up >= 30%, cpu between        -> re-run to decide
  IMPROVED    wall down >= 30%                   (cpu shown for cause)

Medians over each query's samples; cpu medians skip the None
placeholders the collector writes for unusable readings (a dead
worker mid-query takes its utime out of the live tree). Queries with
no usable cpu sample on either side degrade to wall-only and say so.

Usage:
    python scripts/bench_drift.py                # HEAD sidecar vs working tree
    python scripts/bench_drift.py OLD.json NEW.json

Exit code 1 when any REGRESSION row exists — wire into the round
close so a real regression cannot ship silently.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

WALL_UP = 1.30
CPU_UP = 1.30
CPU_BOX = 1.15
# r14 calibration: two same-code official runs back to back flagged a
# 1.2 -> 1.6 s row (fm_distinct_users) as REGRESSION at the 30%
# threshold — rows this small breathe 30% on nothing. 2 s is the
# smallest median where the threshold separated signal from noise.
MIN_SEC = 2.0


def _median(xs: list) -> float | None:
    xs = [x for x in xs if x is not None]
    return round(statistics.median(xs), 3) if xs else None


def classify(old: dict, new: dict) -> list[dict]:
    """Rows for every query present in both sidecars whose wall
    median moved >= 30% in either direction (and >= MIN_SEC on the
    larger side). Pure function — pytest targets this."""
    rows = []
    for q in sorted(set(old.get("samples", {})) & set(new.get("samples", {}))):
        w0 = _median(old["samples"][q])
        w1 = _median(new["samples"][q])
        if not w0 or not w1 or max(w0, w1) < MIN_SEC:
            continue
        ratio = w1 / w0
        if 1 / WALL_UP < ratio < WALL_UP:
            continue
        c0 = _median(old.get("cpu_sec", {}).get(q, []))
        c1 = _median(new.get("cpu_sec", {}).get(q, []))
        cpu_ratio = (c1 / c0) if (c0 and c1) else None
        if ratio < 1:
            verdict = "IMPROVED"
        elif cpu_ratio is None:
            verdict = "WALL-ONLY (no usable cpu sample)"
        elif cpu_ratio >= CPU_UP:
            verdict = "REGRESSION"
        elif cpu_ratio < CPU_BOX:
            verdict = "BOX"
        else:
            verdict = "MIXED"
        rows.append(
            {
                "query": q,
                "wall": [w0, w1],
                "wall_ratio": round(ratio, 2),
                "cpu": [c0, c1],
                "cpu_ratio": round(cpu_ratio, 2) if cpu_ratio else None,
                "verdict": verdict,
            }
        )
    sev = {"REGRESSION": 0, "MIXED": 1, "WALL-ONLY (no usable cpu sample)": 2,
           "BOX": 3, "IMPROVED": 4}
    rows.sort(key=lambda r: (sev[r["verdict"]], -r["wall_ratio"]))
    return rows


def main(argv: list[str]) -> int:
    repo = Path(__file__).resolve().parent.parent
    if len(argv) == 2:
        old = json.loads(Path(argv[0]).read_text())
        new = json.loads(Path(argv[1]).read_text())
    else:
        old = json.loads(
            subprocess.run(
                ["git", "show", "HEAD:BENCH_SPREAD.json"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout
        )
        new = json.loads((repo / "BENCH_SPREAD.json").read_text())
    rows = classify(old, new)
    if not rows:
        print("no wall movers >= 30% at >= 1 s — nothing to adjudicate")
        return 0
    for r in rows:
        print(
            f"{r['verdict']:<12} {r['query']:<34} "
            f"wall {r['wall'][0]} -> {r['wall'][1]} ({r['wall_ratio']}x)  "
            f"cpu {r['cpu'][0]} -> {r['cpu'][1]}"
            + (f" ({r['cpu_ratio']}x)" if r["cpu_ratio"] else "")
        )
    return 1 if any(r["verdict"] == "REGRESSION" for r in rows) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
