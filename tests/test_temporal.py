"""asof_join (operators/temporal.py): hand-built semantics.

Real-data parity vs DuckDB's native ASOF JOIN runs through the
driver contract (queries.asof_last_purchase oracle); these tests pin
the corner semantics the oracle can't isolate: tie visibility,
strict mode, no-match NULLs, inner mode, matched-row NULL payloads,
and duplicate-(key, ts) determinism.
"""

from __future__ import annotations

import datetime as dt

import pytest

from data_mining_map_reduce_spark.operators.temporal import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l10"),
            (1, _ts(20), "l20"),
            (1, _ts(5), "l5"),
            (2, _ts(10), "l-k2"),
        ],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), "r10"),
            (1, _ts(15), "r15"),
            (3, _ts(1), "r-k3"),
        ],
        "k int, rts timestamp, rv string",
    )
    return left, right


def test_asof_left_inclusive(spark, frames):
    left, right = frames
    got = {
        (r.k, r.lv): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts"
        ).collect()
    }
    # l5 precedes every right row -> NULL; l10 sees the equal-ts r10
    # (inclusive); l20 sees r15 (latest <= 20); key 2 has no right
    # rows at all -> NULL
    assert got == {(1, "l5"): None, (1, "l10"): "r10", (1, "l20"): "r15",
                   (2, "l-k2"): None}


def test_asof_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    got = {
        (r.k, r.lv): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            inclusive=False,
        ).collect()
    }
    # strict: l10 no longer sees the equal-ts r10
    assert got[(1, "l10")] is None
    assert got[(1, "l20")] == "r15"


def test_asof_inner_drops_unmatched(spark, frames):
    left, right = frames
    rows = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", how="inner"
    ).collect()
    assert {(r.k, r.lv, r.rv) for r in rows} == {
        (1, "l10", "r10"),
        (1, "l20", "r15"),
    }


def test_asof_matched_row_null_payload_not_backfilled(spark):
    """A matched right row whose payload field is NULL must deliver
    that NULL — not an older right row's non-NULL value."""
    left = spark.createDataFrame([(1, _ts(30), "l")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(10), "old"), (1, _ts(20), None)],
        "k int, rts timestamp, rv string",
    )
    [row] = asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    assert row.rv is None  # the ts=20 row matched; its rv is NULL
    assert row.rts == _ts(20)


def test_asof_duplicate_key_ts_right_rows_deterministic(spark):
    """Two right rows at the identical (key, ts): greatest payload
    tuple wins, and repeat runs agree."""
    left = spark.createDataFrame([(1, _ts(30), "l")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(20), "a"), (1, _ts(20), "b")],
        "k int, rts timestamp, rv string",
    )
    for _ in range(3):
        [row] = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts"
        ).collect()
        assert row.rv == "b"


def test_asof_rejects_column_clash_and_bad_how(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="overlapping"):
        asof_join(left, left.withColumnRenamed("ts", "rts"), on="k",
                  left_ts="ts", right_ts="rts")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  how="full")


def test_asof_single_shuffle_plan(spark, frames):
    """Scale contract: the plan contains exactly ONE exchange (the
    key hash-partitioning for the window) — no join node, no
    per-pair row explosion."""
    left, right = frames
    plan = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
