"""Single source of truth for the driver-window rotation policy.

Both consumers — scripts/make_driver_order.py (the round-open tool
that computes the suggested window) and tests/test_registry.py (the
CI guard that fails a window violating the contract) — import these
constants and the artifact parse from here, so a future change to the
cap or the staleness limit cannot leave the tool and the test
enforcing different contracts (the failure mode: the tool suggests a
window the test rejects, or the test passes a window the driver lets
go stale).

The policy itself:
- the driver records at most WINDOW_CAP correctness rows per round,
  taken from the head of ``_DRIVER_ORDER``;
- every registered query's newest row must stay <= STALENESS_LIMIT
  rounds old at each round's close (a never-rowed query must debut
  in-window its first round);
- consequently a row needs renewal every STALENESS_LIMIT + 1 rounds
  (rowed in r, ages 1 and 2 at r+1/r+2 close, violates at r+3 — so
  it must re-row in the r+3 window at the latest), and the
  sustainable roster is WINDOW_CAP * (STALENESS_LIMIT + 1) queries;
  beyond that, steady-state obligations alone exceed the cap and the
  invariant becomes unsatisfiable no matter how windows are chosen.
  (The practiced cadence re-rows every 2 rounds — a deliberate
  round of slack under the 3-round ceiling.)
"""

from __future__ import annotations

import json
import re
from pathlib import Path

WINDOW_CAP = 50  # driver records at most this many rows per round
STALENESS_LIMIT = 2  # newest row may be at most this many rounds old

# Amortization bound (r14 verdict task 3): rows sharing a newest-row
# round form a COHORT that all comes due in the same future round
# (newest + STALENESS_LIMIT + 1). r14 deferred the entire 48-row r13
# cohort at once, which made r15 owe 6 and r16 owe 54 — over the cap,
# with the staleness test unable to warn until the window was already
# unsatisfiable. The structural fix: no cohort may have more than
# AMORTIZE_OUTSIDE_MAX rows left OUTSIDE the committed window, so the
# round a cohort comes due owes at most AMORTIZE_OUTSIDE_MAX
# rotations and keeps WINDOW_CAP - AMORTIZE_OUTSIDE_MAX slots free
# for that round's debuts and changed-code re-rows. Because every
# window re-rows at least the overflow of the newest cohort, the
# bound propagates: each round's 50 fresh rows get split across later
# windows instead of coming due as one block.
AMORTIZE_OUTSIDE_MAX = WINDOW_CAP - 6


def newest_driver_rows(repo: Path) -> tuple[dict[str, int], int]:
    """(query -> newest round with a CORRECTNESS row, newest round on
    disk), parsed from every committed CORRECTNESS_r*.json."""
    newest: dict[str, int] = {}
    max_round = 0
    for path in repo.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for name in json.loads(path.read_text()):
            newest[name] = max(newest.get(name, 0), rnd)
    return newest, max_round


def must_rotate(
    newest: dict[str, int], upcoming: int, queries: set[str] | list[str]
) -> list[str]:
    """Queries whose newest row would exceed STALENESS_LIMIT at the
    close of ``upcoming`` unless re-rowed — plus never-rowed debuts,
    which must be in-window their first round REGARDLESS of the round
    number (newest.get(q, 0) alone would hide a debut whenever
    upcoming <= STALENESS_LIMIT) — oldest rows first (the order they
    should lead the window)."""
    return sorted(
        (
            q
            for q in queries
            if q not in newest
            or upcoming - newest[q] > STALENESS_LIMIT
        ),
        key=lambda q: (newest.get(q, 0), q),
    )


def cohort_outside_counts(
    newest: dict[str, int],
    window: set[str],
    queries: set[str] | list[str],
) -> dict[int, int]:
    """How many registered queries of each newest-row cohort the
    committed window leaves outside — the quantity AMORTIZE_OUTSIDE_MAX
    bounds (each cohort's outside rows all come due together at
    cohort_round + STALENESS_LIMIT + 1). Never-rowed queries (cohort
    0) are excluded: the staleness invariant already forces them
    in-window, so they can never be 'outside' legally."""
    counts: dict[int, int] = {}
    for q in queries:
        if q in window:
            continue
        r = newest.get(q, 0)
        if r == 0:
            continue
        counts[r] = counts.get(r, 0) + 1
    return counts
