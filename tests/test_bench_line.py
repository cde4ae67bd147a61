"""bench.py line rendering (r12): the official JSON line must carry
[min, max] spread for the heaviest multi-sampled queries, stay inside
the driver's stdout capture budget, and degrade by folding the
smallest timings first — never by silently dropping heavy rows."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _fleet(n_small: int):
    timings = {f"q{i:03d}": 0.3 for i in range(n_small)}
    timings.update({"heavy_a": 12.3456, "heavy_b": 8.1, "heavy_c": 5.0})
    samples = {
        "heavy_a": [14.0, 12.3456, 11.9],
        "heavy_b": [8.1, 8.4, 7.9],
        "heavy_c": [5.0],  # single sample -> no spread entry
    }
    return timings, samples


def _spread(d: dict) -> dict:
    """Decode the positional spread keys (r14): each key is the index
    of the query in the rendered "queries" key order (full name kept
    only for rows folded out of qdict on tiny-budget paths)."""
    names = list(d["queries"])
    return {
        (names[int(k)] if k.isdigit() else k): v
        for k, v in d.get("spread", {}).items()
    }


def test_spread_and_total_in_line():
    timings, samples = _fleet(10)
    line = bench.render_line(timings, {}, 0.1, samples, spread_top=8)
    d = json.loads(line)
    assert _spread(d) == {"heavy_a": [11.9, 14.0], "heavy_b": [7.9, 8.4]}
    assert d["queries"]["heavy_a"] == 12.3
    assert d["value"] == round(sum(timings.values()), 2)
    assert "errors" not in d


def test_over_budget_folds_small_rows_keeps_spread():
    timings, samples = _fleet(200)
    line = bench.render_line(timings, {}, 0.1, samples, spread_top=8)
    assert len(line) <= 1900
    d = json.loads(line)
    # spread survives the fold; heavy rows stay visible; the fold
    # bucket accounts for the folded mass so the total still checks
    assert _spread(d)["heavy_a"] == [11.9, 14.0]
    assert "heavy_a" in d["queries"] and "heavy_b" in d["queries"]
    assert d["queries"]["other"] > 0
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.1 * len(timings)


def test_tiny_budget_sheds_spread_last_cheapest_first():
    timings, samples = _fleet(200)
    # scan down to the budget where folding alone can't fit -> the
    # CHEAPER spread entry (heavy_b) sheds, the heaviest survives
    seen_single = seen_none = False
    for budget in range(175, 100, -1):
        line = bench.render_line(
            timings, {}, 0.1, samples, spread_top=8, budget=budget
        )
        assert len(line) <= budget
        d = json.loads(line)
        sp = _spread(d)
        if set(sp) == {"heavy_a"}:
            assert sp == {"heavy_a": [11.9, 14.0]}
            assert "heavy_a" in d["queries"]
            seen_single = True
        if seen_single and "spread" not in d:
            # smaller still: all spread shed, heavy rows visible
            assert "heavy_a" in d["queries"]
            seen_none = True
            break
    assert seen_single and seen_none


def test_no_samples_no_spread_key():
    line = bench.render_line({"q": 1.0}, {}, 0.01, None)
    assert "spread" not in json.loads(line)


def test_spread_covers_every_multisecond_row():
    """r12 verdict ask 6: every multi-sampled row with median >= 3 s
    carries spread — not just the 8 heaviest — while sub-threshold
    rows stay spread-free (their point estimate is noise-dominated)."""
    timings = {f"h{i:02d}": 3.0 + i for i in range(12)}
    timings["light"] = 1.5
    samples = {k: [v - 0.2, v, v + 0.3] for k, v in timings.items()}
    d = json.loads(bench.render_line(timings, {}, 0.1, samples))
    assert set(_spread(d)) == {f"h{i:02d}" for i in range(12)}
    assert "light" not in _spread(d)


def test_spread_sheds_narrowest_first():
    """When spread must shed, the near-zero-width bands go first —
    the wide bands are the drift-attribution signal the field exists
    to carry (r13)."""
    timings = {f"q{i:03d}": 0.3 for i in range(200)}
    timings.update({"wide": 9.0, "narrow": 11.0})
    samples = {"wide": [7.0, 9.0, 15.0], "narrow": [10.9, 11.0, 11.1]}
    # budget small enough that exactly one spread entry must shed:
    # the NARROW one goes even though it's the more expensive query
    for budget in range(120, 190):
        d = json.loads(
            bench.render_line(timings, {}, 0.1, samples, budget=budget)
        )
        if list(_spread(d)) == ["wide"]:
            assert _spread(d)["wide"] == [7, 15]
            break
    else:
        raise AssertionError("no budget produced the single-shed state")


def test_integral_timings_render_compactly():
    line = bench.render_line({"q": 7.0, "r": 7.25}, {}, 0.01, None)
    assert '"q":7,' in line or '"q":7}' in line
    assert '"r":7.2' in line


def test_anchor_in_line_and_budget_survives(  # r18, VERDICT task 8
):
    """The calibration anchor's [open, middle, close] walls ride the
    line (1-decimal), never enter "queries"/total, and the byte
    budget still holds unconditionally with the anchor present."""
    timings, samples = _fleet(10)
    line = bench.render_line(
        timings, {}, 0.1, samples, spread_top=8, anchor=[1.01, 0.64, 0.9]
    )
    d = json.loads(line)
    assert d["anchor"] == [1.0, 0.6, 0.9]
    assert "anchor" not in d["queries"]
    assert d["value"] == round(sum(timings.values()), 2)
    # absent/empty anchor -> no key (old-line consumers unaffected)
    d2 = json.loads(bench.render_line(timings, {}, 0.1, samples, spread_top=8))
    assert "anchor" not in d2
    # the hard budget holds with the anchor riding along
    timings, samples = _fleet(200)
    for budget in (1900, 120):
        line = bench.render_line(
            timings, {}, 0.1, samples, spread_top=8, budget=budget,
            anchor=[1.01, 0.64, 0.9],
        )
        assert len(line) <= budget, (budget, len(line), line)
        assert json.loads(line)["anchor"] == [1.0, 0.6, 0.9]


def test_budget_is_a_hard_guarantee():
    """r13 advisor ask: when folding + spread-shedding still leaves
    the line over budget, the formerly spread-exempt heavy rows must
    fold too — the byte budget holds unconditionally."""
    timings, samples = _fleet(200)
    for budget in (120, 110, 100):
        line = bench.render_line(
            timings, {}, 0.1, samples, spread_top=8, budget=budget
        )
        assert len(line) <= budget, (budget, len(line), line)
        d = json.loads(line)
        assert abs(sum(d["queries"].values()) - d["value"]) < 0.1 * len(timings)


def test_budget_holds_under_mass_errors():
    """The errors dict was the last budget-exempt field: a round
    where dozens of queries fail could overflow the line on error
    text alone and lose the line's HEAD in the driver's tail capture.
    Messages shed longest-first, then whole entries drop into an
    errors_dropped count — failure visibility survives, budget
    holds."""
    timings, samples = _fleet(30)
    errors = {
        f"broken_query_{i:02d}": "AnalysisException: " + "x" * 200
        for i in range(25)
    }
    for budget in (1900, 800, 300):
        line = bench.render_line(
            timings, errors, 0.1, samples, spread_top=8, budget=budget
        )
        assert len(line) <= budget, (budget, len(line), line)
        d = json.loads(line)
        seen = len(d.get("errors", {})) + d.get("errors_dropped", 0)
        assert seen == 25  # every failure accounted for, shown or counted


def test_bench_drift_classifier():
    """scripts/bench_drift.py (r13 verdict task 7): wall+cpu both up
    -> REGRESSION; wall up with flat cpu -> BOX; wall down ->
    IMPROVED; None cpu placeholders skipped in the medians."""
    import importlib.util as _ilu
    from pathlib import Path as _P

    spec = _ilu.spec_from_file_location(
        "bench_drift",
        _P(__file__).resolve().parent.parent / "scripts" / "bench_drift.py",
    )
    bd = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bd)

    old = {
        "samples": {"a": [10.0, 10.2], "b": [10.0], "c": [10.0], "d": [0.3]},
        "cpu_sec": {"a": [50.0, None], "b": [50.0], "c": [50.0], "d": [0.2]},
    }
    new = {
        "samples": {"a": [14.0, 14.2], "b": [14.0], "c": [6.0], "d": [0.9]},
        "cpu_sec": {"a": [None, 75.0], "b": [52.0], "c": [30.0], "d": [0.5]},
    }
    rows = {r["query"]: r["verdict"] for r in bd.classify(old, new)}
    assert rows == {"a": "REGRESSION", "b": "BOX", "c": "IMPROVED"}


def _load_bd():
    import importlib.util as _ilu
    from pathlib import Path as _P

    spec = _ilu.spec_from_file_location(
        "bench_drift",
        _P(__file__).resolve().parent.parent / "scripts" / "bench_drift.py",
    )
    bd = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bd)
    return bd


def test_bench_drift_anchor_normalizes_uniform_box_drift():
    """r16 verdict task 2: a UNIFORM 1.3x inflation of every query
    AND the code-frozen anchor produces ZERO flags (the anchor ratio
    divides the drift out); the same inflation without anchor data
    still flags (pre-r17 raw behavior); and a real 2x single-query
    regression on a 1.3x-drifted box is still caught, with the box's
    other queries staying clean."""
    bd = _load_bd()
    old = {
        "samples": {"a": [10.0, 10.1], "b": [5.0], "c": [8.0]},
        "cpu_sec": {"a": [50.0, 50.5], "b": [25.0], "c": [40.0]},
        "anchor": {"samples": [2.0, 2.1, 2.0], "cpu_sec": [9.0, 9.1, 9.0]},
    }
    uniform = {
        "samples": {q: [w * 1.3 for w in ws] for q, ws in old["samples"].items()},
        "cpu_sec": {q: [c * 1.3 for c in cs] for q, cs in old["cpu_sec"].items()},
        "anchor": {
            "samples": [w * 1.3 for w in old["anchor"]["samples"]],
            "cpu_sec": [c * 1.3 for c in old["anchor"]["cpu_sec"]],
        },
    }
    assert bd.classify(old, uniform) == []  # box drift: zero flags

    no_anchor_new = {k: v for k, v in uniform.items() if k != "anchor"}
    raw = {r["query"]: r["verdict"] for r in bd.classify(old, no_anchor_new)}
    assert raw  # without the anchor the same drift still flags (raw)

    regressed = {
        "samples": dict(uniform["samples"], a=[w * 2 for w in uniform["samples"]["a"]]),
        "cpu_sec": dict(uniform["cpu_sec"], a=[c * 2 for c in uniform["cpu_sec"]["a"]]),
        "anchor": uniform["anchor"],
    }
    rows = {r["query"]: r["verdict"] for r in bd.classify(old, regressed)}
    assert rows == {"a": "REGRESSION"}  # the real mover, nothing else


def test_bench_drift_session_position_clears_jit_flags():
    """r14 verdict task 4: a mover whose inflated samples all ran at
    session positions <= EARLY_POS, with the NON-early samples back at
    baseline, is auto-cleared (verdict wrapped in SESSION-POS, exit
    code no longer fails); a mover whose late samples are also up
    keeps its flag; an all-early mover is marked INCONCLUSIVE but
    stays flagged; a pre-r15 sidecar (no positions) is untouched."""
    bd = _load_bd()
    old = {
        "samples": {"jit": [10.0, 10.0], "real": [10.0, 10.0], "early": [10.0]},
        "cpu_sec": {"jit": [50.0, 50.0], "real": [50.0, 50.0], "early": [50.0]},
    }
    new = {
        "samples": {
            "jit": [19.0, 10.1],
            "real": [14.0, 14.2, 14.1],
            "early": [15.0],
        },
        "cpu_sec": {
            "jit": [95.0, 50.0],
            "real": [70.0, 71.0, 70.5],
            "early": [75.0],
        },
        "positions": {
            "jit": [[0, 1], [1, 7]],            # inflated sample first-in-session
            "real": [[0, 5], [1, 8], [2, 11]],  # late samples also up
            "early": [[0, 2]],                  # only an early sample exists
        },
    }
    rows = {r["query"]: r for r in bd.classify(old, new)}
    assert rows["jit"]["verdict"] == "SESSION-POS (REGRESSION)"
    assert rows["jit"]["session_note"].startswith("CLEARED")
    assert rows["real"]["verdict"] == "REGRESSION"
    assert "session_note" not in rows["real"]
    assert rows["early"]["verdict"] == "REGRESSION"
    assert rows["early"]["session_note"].startswith("INCONCLUSIVE")
    # pre-r15 sidecars carry no positions: classification unchanged
    new_nopos = {k: v for k, v in new.items() if k != "positions"}
    rows2 = {r["query"]: r["verdict"] for r in bd.classify(old, new_nopos)}
    assert rows2 == {"jit": "REGRESSION", "real": "REGRESSION", "early": "REGRESSION"}


def test_bench_drift_zero_cpu_median_is_not_missing():
    """ADVICE r14: a legitimate 0.0 CPU median is a reading, not a
    missing sample — only a true None (or a zero denominator) may
    degrade the row to WALL-ONLY."""
    bd = _load_bd()
    old = {"samples": {"a": [10.0]}, "cpu_sec": {"a": [5.0]}}
    new = {"samples": {"a": [14.0]}, "cpu_sec": {"a": [0.0]}}
    (row,) = bd.classify(old, new)
    # 0.0/5.0 = 0.0 — a real, flat-cpu reading: BOX, not WALL-ONLY
    assert row["verdict"] == "BOX"
    assert row["cpu_ratio"] == 0.0
    old2 = {"samples": {"a": [10.0]}, "cpu_sec": {"a": [0.0]}}
    (row2,) = bd.classify(old2, new)
    # zero denominator: ratio undefined -> WALL-ONLY
    assert row2["verdict"].startswith("WALL-ONLY")
