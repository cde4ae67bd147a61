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

r17 (r16 verdict task 2): all ratios are ANCHOR-NORMALIZED when both
sidecars carry the code-frozen calibration anchor (bench.py
_anchor_query, run at session open/middle/close of every official):
each wall/cpu ratio is divided by the anchor's before thresholding,
so uniform box drift — six same-code r16 officials spanned 310-359 s
— produces zero flags while a single-query regression still fires.
Pre-registered bands should likewise be stated anchor-normalized.

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
# A sample executed this early in its recycled JVM session measures
# codegen/JIT on top of the plan (r14: betweenness 9.0 -> 4.9 -> 3.7 s
# consecutive within ONE session; r14's manual adjudications traced
# every confirmed-noise mover to this). Position 1 is the first
# measured query after the warmup; 2 still measured ~1.3x.
EARLY_POS = 2


def _median(xs: list) -> float | None:
    xs = [x for x in xs if x is not None]
    return round(statistics.median(xs), 3) if xs else None


def _anchor_ratios(old: dict, new: dict) -> tuple[float | None, float | None]:
    """(wall_ratio, cpu_ratio) of the code-frozen calibration anchor
    (bench.py _anchor_query, r16 verdict task 2): the box-drift
    denominator. The anchor's code cannot move between rounds, so its
    ratio IS the environmental drift; classify() divides every
    query's ratios by it before thresholding, which turns a uniform
    1.3x box slowdown into zero flags while a single-query plan
    regression still stands out. (None, None) when either sidecar
    predates the anchor — classification then degrades to raw ratios
    exactly as before."""
    ao, an = old.get("anchor") or {}, new.get("anchor") or {}
    w0, w1 = _median(ao.get("samples", [])), _median(an.get("samples", []))
    c0, c1 = _median(ao.get("cpu_sec", [])), _median(an.get("cpu_sec", []))
    wall = (w1 / w0) if (w0 and w1) else None
    cpu = (c1 / c0) if (c0 and c1) else None
    return wall, cpu


def _session_note(
    old: dict, new: dict, q: str, w0: float, a_wall: float | None = None
) -> str | None:
    """r14 verdict task 4: auto-adjudicate a flag against the
    sidecar's per-sample [session, position] records. If the query's
    NON-early samples (position > EARLY_POS in their session) have a
    median back within the wall threshold of the baseline, the
    inflation lives entirely in first-in-session JIT samples — the
    flag is cleared with the evidence; if every sample ran early, say
    so (the manual 3x-in-one-idle-session re-run is still the
    decider). Returns None when positions are absent (pre-r15
    sidecar) or tell us nothing."""
    pos = new.get("positions", {}).get(q)
    walls = new.get("samples", {}).get(q)
    if not pos or not walls or len(pos) != len(walls):
        return None
    late = [w for w, sp in zip(walls, pos) if sp[1] > EARLY_POS]
    early = [(w, sp[1]) for w, sp in zip(walls, pos) if sp[1] <= EARLY_POS]
    if not early:
        return None  # no early sample — position explains nothing
    if late:
        lm = _median(late)
        # anchor-normalize the late-sample test too, else a box-
        # inflated round could never clear its own JIT flags
        if lm is not None and lm / w0 / (a_wall or 1.0) < WALL_UP:
            return (
                f"CLEARED: non-early samples median {lm} within "
                f"{int((WALL_UP - 1) * 100)}% of baseline; inflated "
                f"sample(s) ran at session position(s) "
                f"{sorted(p for _, p in early)} (first-in-session JIT)"
            )
        return None  # late samples are ALSO up — position isn't the cause
    return (
        f"INCONCLUSIVE: all {len(early)} samples ran at session "
        f"position(s) <= {EARLY_POS} — re-run 3x in one idle session "
        f"to adjudicate"
    )


def classify(old: dict, new: dict) -> list[dict]:
    """Rows for every query present in both sidecars whose
    ANCHOR-NORMALIZED wall median moved >= 30% in either direction
    (and >= MIN_SEC raw on the larger side). When either sidecar
    lacks the anchor, ratios stay raw (pre-r17 behavior). Pure
    function — pytest targets this."""
    a_wall, a_cpu = _anchor_ratios(old, new)
    rows = []
    for q in sorted(set(old.get("samples", {})) & set(new.get("samples", {}))):
        w0 = _median(old["samples"][q])
        w1 = _median(new["samples"][q])
        if not w0 or not w1 or max(w0, w1) < MIN_SEC:
            continue
        ratio = w1 / w0
        if a_wall:
            ratio = ratio / a_wall
        if 1 / WALL_UP < ratio < WALL_UP:
            continue
        c0 = _median(old.get("cpu_sec", {}).get(q, []))
        c1 = _median(new.get("cpu_sec", {}).get(q, []))
        # None-test explicitly (ADVICE r14): a legitimate 0.0 CPU
        # median must not degrade the row to WALL-ONLY (0/x and x/0
        # are real readings — guard only the divide-by-zero)
        cpu_ratio = (
            (c1 / c0) if (c0 is not None and c1 is not None and c0 > 0) else None
        )
        if cpu_ratio is not None and a_cpu:
            cpu_ratio = cpu_ratio / a_cpu
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
        note = None
        if verdict in ("REGRESSION", "MIXED", "WALL-ONLY (no usable cpu sample)"):
            note = _session_note(old, new, q, w0, a_wall)
            if note and note.startswith("CLEARED"):
                verdict = f"SESSION-POS ({verdict})"
        rows.append(
            {
                "query": q,
                "wall": [w0, w1],
                "wall_ratio": round(ratio, 2),
                "cpu": [c0, c1],
                "cpu_ratio": round(cpu_ratio, 2) if cpu_ratio is not None else None,
                "verdict": verdict,
                **({"session_note": note} if note else {}),
            }
        )
    sev = {"REGRESSION": 0, "MIXED": 1, "WALL-ONLY (no usable cpu sample)": 2,
           "BOX": 3, "IMPROVED": 4}
    rows.sort(key=lambda r: (sev.get(r["verdict"], 3), -r["wall_ratio"]))
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
    a_wall, a_cpu = _anchor_ratios(old, new)
    if a_wall:
        print(
            f"anchor (box drift): wall x{a_wall:.3f}"
            + (f", cpu x{a_cpu:.3f}" if a_cpu else "")
            + " — all ratios below are anchor-normalized"
        )
    else:
        print("anchor absent in one sidecar — raw (unnormalized) ratios")
    rows = classify(old, new)
    if not rows:
        # threshold text derived from the constant (ADVICE r14: the
        # message said ">= 1 s" while MIN_SEC was 2.0)
        print(
            f"no wall movers >= {int((WALL_UP - 1) * 100)}% at "
            f">= {MIN_SEC:g} s — nothing to adjudicate"
        )
        return 0
    for r in rows:
        print(
            f"{r['verdict']:<12} {r['query']:<34} "
            f"wall {r['wall'][0]} -> {r['wall'][1]} ({r['wall_ratio']}x)  "
            f"cpu {r['cpu'][0]} -> {r['cpu'][1]}"
            + (f" ({r['cpu_ratio']}x)" if r["cpu_ratio"] is not None else "")
        )
        if r.get("session_note"):
            print(f"{'':<12}   {r['session_note']}")
    return 1 if any(r["verdict"] == "REGRESSION" for r in rows) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
