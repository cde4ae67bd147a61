"""MinHash+LSH fuzzy oracle: precision 1.0 by construction (exact
verify), recall >= 0.8 vs the exact Jaccard path — the A3 PDF §4.1.4
grading rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.relational import baskets
from data_mining_map_reduce_spark.operators.similarity import (
    exact_jaccard_pairs,
    minhash_lsh_pairs,
)
from data_mining_map_reduce_spark.queries import _customer_part_pairs


def test_lsh_recall_and_precision(spark, sf_dir):
    pairs = _customer_part_pairs(spark, sf_dir)
    threshold = 0.05

    exact = {
        (r.a, r.b)
        for r in exact_jaccard_pairs(pairs, "k", "i", threshold).collect()
    }
    b = baskets(pairs.select("k", F.col("i").cast("string").alias("i")), "k", "i")
    lsh = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(
            b, "k", "items", threshold, num_hashes=32, bands=32
        ).collect()
    }

    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"
    assert len(exact) > 0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall:.3f} ({len(lsh)}/{len(exact)})"


def test_lsh_deterministic(spark, sf_dir):
    pairs = _customer_part_pairs(spark, sf_dir)
    b = baskets(pairs.select("k", F.col("i").cast("string").alias("i")), "k", "i")
    r1 = sorted(map(tuple, minhash_lsh_pairs(b, "k", "items", 0.05).collect()))
    r2 = sorted(map(tuple, minhash_lsh_pairs(b, "k", "items", 0.05).collect()))
    assert r1 == r2
