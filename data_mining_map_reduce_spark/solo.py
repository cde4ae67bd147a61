"""Single-node no-Spark path (SURVEY §2.1 S10).

The reference ships a pure-Python twin of its Spark query: the
``--if_spark no_spark`` branch of Assignment1/task2.py:61-151
re-implements the category-average query with stdlib dicts over
json-loaded lists, so the assignment can compare single-node wall
time against the Spark run and cross-check the answers. This module
is the engine's equivalent of that branch for the flagship query
(broadcast join + token explode + avg + top-10): local parquet column
reads plus in-process aggregation, with no SparkSession anywhere.

Two interchangeable engines, parity-pinned against each other and
against the Spark flagship by pytest:

- ``engine="loop"`` — the reference branch's shape: stdlib dicts, one
  pass over the fact rows. Readable ground truth (r12: accumulates
  exact int cents, the same exactness model as the vector engine).
- ``engine="vector"`` (default) — the same aggregation vectorized
  with numpy: prices are money with exactly 2 decimals (asserted), so
  they group-sum as int64 cents via bincount over factorized part
  keys — exact, accumulation-order-free — and only the final
  per-category average is a float.

It exists for the same two reasons as the reference's branch:

1. a ground-truth twin whose output must match the Spark plan value
   for value (pytest parity at sf0.001 + the ``solo_flagship_parity``
   driver row, which replays it against the flagship's own DuckDB
   oracle), and
2. an honest single-node baseline for "is the cluster worth it at
   this scale".

It is deliberately NOT a scale path: the whole working set lives in
one process. The side it materializes in memory is the part table
(the side the Spark plan broadcasts — small by design) plus two fact
columns; but one process reading 100 TB is the wrong tool, and the
module says so instead of pretending otherwise. Use
``flagship_category_avg`` (queries.py) beyond toy scale.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import NamedTuple


class CategoryAvg(NamedTuple):
    category: str
    avg_price: float
    n: int


def _round_half_up(value: float, digits: int) -> float:
    """Match Spark's ROUND on doubles (HALF_UP over the shortest
    decimal representation — BigDecimal.valueOf semantics), which is
    also what DuckDB's ROUND produces on these money-valued inputs.
    Python's built-in round() is banker's rounding and would disagree
    on exact .5 boundaries."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(value)).quantize(q, rounding=ROUND_HALF_UP))


def _solo_loop(tokens_by_key, part_keys, li_keys, li_prices):
    """Reference-shaped dict loop (reference Assignment1/task2.py:
    85-118). Differences are deliberate fixes, not semantic drift:
    sums accumulate per category key directly (the reference's
    vocab.index() linear scan is O(vocab) per update) and prices
    accumulate as exact int cents — the SAME exactness model as the
    vector engine (r12, advisor ask), so the two solo engines are
    bit-identical by construction and the only remaining float story
    is the final cents/100 ÷ n, shared by both. (Previously this used
    math.fsum over the stored doubles, which differs from the cents
    sum by ~1 ulp pre-round — enough to flip a 4-dp half-boundary
    average between engines in principle.)"""
    cents_by_tok: dict[str, list[int]] = {}
    for key, price in zip(li_keys, li_prices):
        toks = tokens_by_key.get(key)
        if toks is None:
            continue  # inner-join semantics
        scaled = price * 100.0
        c = round(scaled)
        if abs(scaled - c) >= 1e-6:
            raise ValueError("l_extendedprice is not 2-decimal money")
        for tok in toks:
            acc = cents_by_tok.setdefault(tok, [0, 0])
            acc[0] += c
            acc[1] += 1
    return {
        tok: (cents / 100.0, n) for tok, (cents, n) in cents_by_tok.items()
    }


def _solo_vector(tokens_by_key, part_keys, li_keys, li_prices):
    """Vectorized twin: group-sum exact int64 cents per part key with
    bincount, then fold the 2 000-ish per-part subtotals into their
    category tokens in plain Python. Exactness argument: every price
    is money with 2 decimals (asserted below), so rint(price*100) is
    its exact integer value; int64 sums are associative, hence
    accumulation-order-free — unlike a float running sum."""
    import numpy as np

    keys = np.asarray(li_keys)
    prices = np.asarray(li_prices)
    cents = np.rint(prices * 100.0)
    if np.abs(prices * 100.0 - cents).max() >= 1e-6:
        raise ValueError("l_extendedprice is not 2-decimal money")
    cents = cents.astype(np.int64)

    part_arr = np.asarray(part_keys)
    # Factorize fact keys against the part dimension (inner join:
    # unmatched fact keys fall into the trailing drop bucket).
    order = np.argsort(part_arr)
    pos = np.searchsorted(part_arr, keys, sorter=order)
    pos = np.clip(pos, 0, len(part_arr) - 1)
    matched = part_arr[order[pos]] == keys
    codes = np.where(matched, order[pos], len(part_arr))

    sums = np.bincount(codes, weights=cents, minlength=len(part_arr) + 1)
    counts = np.bincount(codes, minlength=len(part_arr) + 1)

    by_token: dict[str, list[int]] = {}
    for i, key in enumerate(part_arr):
        if counts[i] == 0:
            continue
        for tok in tokens_by_key[key]:
            acc = by_token.setdefault(tok, [0, 0])
            acc[0] += int(sums[i])
            acc[1] += int(counts[i])
    return {
        tok: (cents_sum / 100.0, n) for tok, (cents_sum, n) in by_token.items()
    }


def flagship_category_avg_solo(
    sf_dir: str, k: int = 10, engine: str = "vector"
) -> list[CategoryAvg]:
    """Single-node flagship: avg l_extendedprice per p_type token, top-k.

    Shape mirrors the reference's no-Spark branch (reference
    Assignment1/task2.py:66-151): build an in-memory key->categories
    map from the dimension input, aggregate (sum, count) per category
    over the fact input, then average + sort. The top-k tie-break
    (avg desc, category asc) is the same total order the Spark query
    and the DuckDB oracle use.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    part_keys = part.column("p_partkey").to_pylist()
    tokens_by_key = {
        key: ptype.split(" ")
        for key, ptype in zip(part_keys, part.column("p_type").to_pylist())
    }

    lineitem = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    li_keys = lineitem.column("l_partkey")
    li_prices = lineitem.column("l_extendedprice")
    if engine == "loop":
        agg = _solo_loop(
            tokens_by_key, part_keys, li_keys.to_pylist(), li_prices.to_pylist()
        )
    elif engine == "vector":
        agg = _solo_vector(
            tokens_by_key, part_keys, li_keys.to_numpy(), li_prices.to_numpy()
        )
    else:
        raise ValueError(f"unknown solo engine {engine!r}")

    rows = [
        CategoryAvg(
            category=tok,
            avg_price=_round_half_up(total / n, 4),
            n=n,
        )
        for tok, (total, n) in agg.items()
    ]
    rows.sort(key=lambda r: (-r.avg_price, r.category))
    return rows[:k]
