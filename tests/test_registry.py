"""Registry invariants that keep shipped docs honest (r9 verdict ask 3):
the query/oracle counts printed in README.md must equal the live
registry, so adding a query without bumping the doc fails CI instead
of drifting silently. r13 adds the mechanized driver-window staleness
invariant (r12 verdict task 2): the window rotation used to be a
hand-curated manifest with zero slack — one editing slip would have
silently broken the "newest driver row <= 2 rounds old" contract."""

from __future__ import annotations

import json
import re
from pathlib import Path

from data_mining_map_reduce_spark.queries import (
    _DRIVER_ORDER,
    ORACLES,
    SPARK_QUERIES,
)

README = Path(__file__).resolve().parent.parent / "README.md"
REPO = Path(__file__).resolve().parent.parent
WINDOW_CAP = 50  # the driver records at most this many rows per round


def test_readme_counts_match_registry():
    text = README.read_text()
    m = re.search(
        r"registry: (\d+) named queries, (\d+) paired with DuckDB oracle SQL",
        text,
    )
    assert m, "README.md registry count line missing or reworded"
    assert int(m.group(1)) == len(SPARK_QUERIES), (
        f"README says {m.group(1)} queries, registry has "
        f"{len(SPARK_QUERIES)} — update README.md"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracles, registry has "
        f"{len(ORACLES)} — update README.md"
    )


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(SPARK_QUERIES)


def _newest_driver_rows() -> tuple[dict[str, int], int]:
    """(query -> newest round with a CORRECTNESS row, newest round on
    disk), parsed from every committed CORRECTNESS_r*.json."""
    newest: dict[str, int] = {}
    max_round = 0
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for name in json.loads(path.read_text()):
            newest[name] = max(newest.get(name, 0), rnd)
    assert max_round > 0, "no CORRECTNESS_r*.json artifacts found"
    return newest, max_round


def test_driver_order_covers_registry_exactly():
    """Every registered query appears in _DRIVER_ORDER exactly once
    (an unlisted name would silently sort past the cap forever)."""
    assert len(_DRIVER_ORDER) == len(set(_DRIVER_ORDER)), "duplicate names"
    assert set(_DRIVER_ORDER) == set(SPARK_QUERIES), (
        set(_DRIVER_ORDER) ^ set(SPARK_QUERIES)
    )


def test_driver_window_staleness_invariant():
    """MECHANIZED rotation guard (r12 verdict task 2). The upcoming
    round is newest-artifact + 1; at its close, every query NOT in
    the current 50-row window keeps its existing newest row. Fail if
    that would leave any query's newest row > 2 rounds old — i.e.
    every must-rotate row has to sit inside the window BEFORE the
    round runs, and a brand-new query (no row yet) must be in-window
    its first round."""
    newest, max_round = _newest_driver_rows()
    upcoming = max_round + 1
    window = set(_DRIVER_ORDER[:WINDOW_CAP])
    stale = []
    for name in SPARK_QUERIES:
        if name in window:
            continue  # gets a fresh row when the upcoming round runs
        rowed = newest.get(name)
        if rowed is None:
            stale.append(f"{name} (never rowed — must debut in-window)")
        elif upcoming - rowed > 2:
            stale.append(
                f"{name} (newest row r{rowed}, would be "
                f"{upcoming - rowed} rounds old at r{upcoming} close)"
            )
    assert not stale, (
        f"_DRIVER_ORDER window violates the staleness invariant for "
        f"r{upcoming}; rotate these into the top-{WINDOW_CAP} (run "
        f"scripts/make_driver_order.py for the computed set): {stale}"
    )


def test_driver_window_next_round_has_capacity():
    """Early warning: the rows this window leaves un-rotated must fit
    the NEXT window with room for the r12-measured churn (new +
    code-changed queries took 2-6 slots/round historically). If the
    obligation count alone exceeds the cap, the invariant is already
    unsatisfiable next round — fail NOW, while this round can still
    rotate extra rows to amortize the debt."""
    newest, max_round = _newest_driver_rows()
    upcoming = max_round + 1
    window = set(_DRIVER_ORDER[:WINDOW_CAP])
    # After the upcoming round closes: in-window rows are fresh
    # (age 0); everything else keeps `newest`. Next round must rotate
    # any query whose row would otherwise exceed age 2 at ITS close.
    must_rotate_next = [
        q
        for q in SPARK_QUERIES
        if q not in window and (upcoming + 1) - newest.get(q, 0) > 2
    ]
    assert len(must_rotate_next) <= WINDOW_CAP, (
        f"r{upcoming + 1} would owe {len(must_rotate_next)} rotations "
        f"with only {WINDOW_CAP} slots — rebalance this window"
    )
