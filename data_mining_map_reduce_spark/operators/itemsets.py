"""Frequent-itemset mining: SON two-phase + FPGrowth (SURVEY §2.4 A11).

The reference implements SON with per-partition A-Priori at scaled
threshold ⌊s/p⌋ (phase 1, reference Assignment2/task1.py:42-137) and
exact candidate verification (phase 2, :145-172). SON is *exact*:
phase-1 candidates are a superset of the truly frequent sets
(monotonicity), phase 2 recounts them exactly.

Engine mapping:
- phase 1 = ``mapInPandas`` over a deterministic ``repartition(p,
  key)`` — each partition is a basket block; A-Priori runs in
  Arrow-batched Python (partition-block algorithm, the sanctioned
  escape hatch per SURVEY §2.12).
- candidate union → driver (bounded: candidates only) → broadcast.
- phase 2 = ``mapInPandas`` exact counting + ``groupBy(itemset).sum``
  + HAVING — partial counts merge map-side, one small shuffle.
- FPGrowth (`pyspark.ml.fpm`) is the built-in capability twin used as
  a cross-check in tests.

Scale: the only driver-resident state is the candidate list, which
A-Priori keeps small at sane supports. Baskets never leave executors.
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _apriori_local(
    baskets: list[frozenset], threshold: int, max_size: int | None
) -> set[tuple]:
    """In-memory A-Priori (reference Assignment2/task1.py:47-83):
    frequent k-sets seed candidate (k+1)-sets; counts via subset
    scan. Returns frequent itemsets as sorted tuples."""
    threshold = max(threshold, 1)
    counts: dict = {}
    for basket in baskets:
        for item in basket:
            counts[item] = counts.get(item, 0) + 1
    frequent = {(i,) for i, c in counts.items() if c >= threshold}
    result = set(frequent)
    k = 1
    while frequent and (max_size is None or k < max_size):
        k += 1
        prev_items = sorted({i for tup in frequent for i in tup})
        candidates = set()
        for tup in frequent:
            for item in prev_items:
                if item > tup[-1]:
                    cand = tup + (item,)
                    # a-priori prune: all (k-1)-subsets must be frequent
                    if all(
                        tuple(sorted(set(cand) - {x})) in frequent for x in cand
                    ):
                        candidates.add(cand)
        if not candidates:
            break
        counts = {}
        for basket in baskets:
            if len(basket) < k:
                continue
            for cand in candidates:
                if basket.issuperset(cand):
                    counts[cand] = counts.get(cand, 0) + 1
        frequent = {c for c, n in counts.items() if n >= threshold}
        result |= frequent
    return result


def son_frequent_itemsets(
    baskets_df: DataFrame,
    items_col: str = "items",
    support: int = 3,
    num_partitions: int = 8,
    max_size: int | None = None,
) -> DataFrame:
    """SON over a (key, items array<string>) DataFrame →
    (itemset csv-string, support long), exact at ``support``.

    ``num_partitions`` is pinned (SURVEY §7 watch-list 4): phase-1
    thresholds depend on the partition count, so it is an explicit
    parameter, not cluster-dependent state.
    """
    spark = baskets_df.sparkSession
    total = baskets_df.count()
    local_threshold = max(1, support // num_partitions)
    parts = baskets_df.select(F.col(items_col).alias("items")).repartition(
        num_partitions, F.crc32(F.concat_ws(",", F.col(items_col)))
    )

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        baskets = []
        for pdf in batches:
            baskets.extend(frozenset(row) for row in pdf["items"])
        found = _apriori_local(baskets, local_threshold, max_size)
        yield pd.DataFrame({"itemset": [",".join(t) for t in found]})

    candidates = [
        r.itemset for r in parts.mapInPandas(phase1, "itemset string").distinct().collect()
    ]
    cand_bc = spark.sparkContext.broadcast(
        [tuple(c.split(",")) for c in candidates]
    )

    def phase2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cands = cand_bc.value
        counts = {c: 0 for c in cands}
        for pdf in batches:
            for row in pdf["items"]:
                b = frozenset(row)
                for cand in cands:
                    if b.issuperset(cand):
                        counts[cand] += 1
        yield pd.DataFrame(
            {
                "itemset": [",".join(c) for c in counts],
                "cnt": list(counts.values()),
            }
        )

    return (
        parts.mapInPandas(phase2, "itemset string, cnt long")
        .groupBy("itemset")
        .agg(F.sum("cnt").alias("support"))
        .where(F.col("support") >= support)
    )


def fpgrowth_frequent_itemsets(
    baskets_df: DataFrame, items_col: str = "items", support: int = 3
) -> DataFrame:
    """Built-in capability twin: ml.fpm.FPGrowth → same output shape
    (itemset csv-string sorted, support)."""
    from pyspark.ml.fpm import FPGrowth

    total = baskets_df.count()
    model = FPGrowth(
        itemsCol=items_col, minSupport=support / total, minConfidence=0.5
    ).fit(baskets_df)
    return model.freqItemsets.select(
        F.concat_ws(",", F.array_sort("items")).alias("itemset"),
        F.col("freq").alias("support"),
    ).where(F.col("support") >= support)
