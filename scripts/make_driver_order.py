#!/usr/bin/env python
"""Compute the driver-window rotation mechanically (r12 verdict task
2: "the rotation needs to be computed, not hand-curated").

Reads every CORRECTNESS_r*.json, derives each registered query's
newest driver-row round, and prints:
  1. the MUST-ROTATE set for the upcoming round (rows that would
     exceed the 2-round staleness limit at its close, plus queries
     that have never had a row), and
  2. a suggested 50-name window: must-rotate first (oldest rows
     lead), then the freshest-last rows to fill remaining slots —
     leaving the maximum slack for new/changed queries, which the
     operator adds by hand (code-change detection is judgment).

The shipped `_DRIVER_ORDER` in queries.py stays an explicit list (the
driver contract needs a deterministic committed ordering); this
script feeds the round-open edit, and tests/test_registry.py::
test_driver_window_staleness_invariant fails the suite if the edited
list would let any query go stale.

Run at ROUND OPEN, together with the ENGINE_STATUS regen (which
scripts/driver_sim.py now performs automatically on every verify):

    python scripts/make_driver_order.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_mining_map_reduce_spark.queries import (  # noqa: E402
    _DRIVER_ORDER,
    _WINDOW_ROUND,
    SPARK_QUERIES,
)
from registry_window import (  # noqa: E402 — shared with tests/test_registry
    AMORTIZE_OUTSIDE_MAX,
    WINDOW_CAP,
    cohort_outside_counts,
    must_rotate,
    newest_driver_rows,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    newest, max_round = newest_driver_rows(Path(REPO))
    if max_round == 0:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    upcoming = max_round + 1
    print(f"newest artifact: r{max_round}; computing window for r{upcoming}")
    # Phase-awareness guard (r15 verdict task 1): the committed window
    # carries the round it was built FOR. Once the driver's artifact
    # for that round lands, the NEXT round must rebalance and bump the
    # pin before anything else — hard-fail here (round_open.sh runs
    # this script first) so the pin cannot silently go stale while
    # tests/test_registry.py keeps grading an old round green.
    pin_stale = _WINDOW_ROUND < upcoming

    must = must_rotate(newest, upcoming, SPARK_QUERIES)
    never = [q for q in SPARK_QUERIES if q not in newest]
    print(f"\nMUST-ROTATE ({len(must)} rows, oldest first):")
    for q in must:
        print(f"  {q}  (newest r{newest.get(q, 0) or '—'})")
    if never:
        print(f"\nNEVER ROWED ({len(never)}): {never}")

    slack = WINDOW_CAP - len(must)
    if slack < 0:
        print(
            f"\nERROR: {len(must)} obligations exceed the {WINDOW_CAP}-row "
            f"cap — the invariant is unsatisfiable; something skipped a round"
        )
        return 1
    # Amortized fill (r14 verdict task 3): before the oldest-first
    # fill, pull in each cohort's OVERFLOW — the rows beyond
    # AMORTIZE_OUTSIDE_MAX that would otherwise come due as one block
    # (r14 deferred the whole 48-row r13 cohort and left r16 owing
    # 54 > 50). Then spend remaining slack oldest-first as before.
    rest = sorted(
        (q for q in SPARK_QUERIES if q not in must),
        key=lambda q: (newest.get(q, 0), q),
    )
    by_cohort: dict[int, list[str]] = {}
    for q in rest:
        by_cohort.setdefault(newest.get(q, 0), []).append(q)
    amortize = []
    for r in sorted(by_cohort):
        overflow = len(by_cohort[r]) - AMORTIZE_OUTSIDE_MAX
        if overflow > 0:
            amortize.extend(by_cohort[r][:overflow])
    if len(must) + len(amortize) > WINDOW_CAP:
        print(
            f"\nERROR: {len(must)} obligations + {len(amortize)} "
            f"amortization picks exceed the {WINDOW_CAP}-row cap"
        )
        return 1
    fillers = amortize + [
        q for q in rest if q not in set(amortize)
    ][: slack - len(amortize)]
    print(
        f"\nSUGGESTED WINDOW ({WINDOW_CAP} = {len(must)} obligated + "
        f"{len(amortize)} cohort-amortization picks + "
        f"{slack - len(amortize)} slack, oldest-first fill; swap slack "
        f"slots for this round's new/changed queries — but keep every "
        f"cohort's outside count <= {AMORTIZE_OUTSIDE_MAX}):"
    )
    for q in must + fillers:
        print(f"  {q}")

    current = set(_DRIVER_ORDER[:WINDOW_CAP])
    missing = [q for q in must if q not in current]
    if missing:
        print(f"\nCURRENT _DRIVER_ORDER IS STALE — missing obligations: {missing}")
        return 1
    if pin_stale:
        print(
            f"\nWINDOW PIN IS STALE — _WINDOW_ROUND={_WINDOW_ROUND} but the "
            f"upcoming round is r{upcoming}; rebalance _DRIVER_ORDER for "
            f"r{upcoming} (suggestion above) and bump _WINDOW_ROUND"
        )
        return 1
    over = {
        r: n
        for r, n in cohort_outside_counts(newest, current, SPARK_QUERIES).items()
        if n > AMORTIZE_OUTSIDE_MAX
    }
    if over:
        print(
            f"\nCURRENT _DRIVER_ORDER VIOLATES AMORTIZATION "
            f"(> {AMORTIZE_OUTSIDE_MAX} of one cohort outside): {over}"
        )
        return 1
    print("\ncurrent _DRIVER_ORDER satisfies the invariants")
    return 0


if __name__ == "__main__":
    sys.exit(main())
