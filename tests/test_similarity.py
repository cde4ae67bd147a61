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


def test_exact_pairs_scale_guard(spark, monkeypatch):
    """r10 verdict task 2: the exact all-pairs twin must refuse to run
    above the key-count threshold the sf10 probe measured as fatal
    (~500k docs on one box), with a message routing users to the
    banded _lsh twin; below the threshold (and with the guard
    disabled) it must run unchanged."""
    import pytest as _pytest

    from data_mining_map_reduce_spark.operators.similarity import (
        exact_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(k, f"item{i}") for k in range(10) for i in range(k, k + 4)],
        "k long, it string",
    )
    # over the cap -> clear refusal naming the _lsh escape hatch
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIRS_MAX", "5")
    with _pytest.raises(ValueError, match="_lsh"):
        exact_jaccard_pairs(df, "k", "it", threshold=0.5)
    # under the cap -> runs
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIRS_MAX", "100")
    assert exact_jaccard_pairs(df, "k", "it", threshold=0.5).count() > 0
    # 0 disables (deliberate ground-truth runs)
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIRS_MAX", "0")
    assert exact_jaccard_pairs(df, "k", "it", threshold=0.5).count() > 0


def test_cooccurrence_lsh_refines_exact(spark, sf_dir):
    """r13 verdict task 1: the LSH-pre-cut edge build must REFINE the
    exact co-occurrence build — every emitted pair exists in the
    exact output with an IDENTICAL n_shared (precision 1.0: the
    verify is an exact intersection count), and recall on the smoke
    corpus stays above the floor the banding predicts (b=32, r=1:
    P(candidate) = 1-(1-J)^32; tau=3 pairs with low Jaccard are the
    documented misses)."""
    from data_mining_map_reduce_spark.operators.relational import (
        co_occurrence_pairs,
        co_occurrence_pairs_lsh,
    )

    pairs = _customer_part_pairs(spark, sf_dir)
    exact = {
        (r.a, r.b): r.n_shared
        for r in co_occurrence_pairs(pairs, "k", "i", min_shared=3).collect()
    }
    lsh = {
        (r.a, r.b): r.n_shared
        for r in co_occurrence_pairs_lsh(pairs, "k", "i", min_shared=3).collect()
    }
    assert set(lsh) <= set(exact), "pre-cut emitted a pair the exact build lacks"
    assert all(exact[p] == n for p, n in lsh.items()), "n_shared mismatch"
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.6, f"recall {recall:.3f} ({len(lsh)}/{len(exact)})"


def test_min_overlap_requires_verify():
    import pytest as _pytest

    from data_mining_map_reduce_spark.operators.similarity import (
        minhash_lsh_pairs,
    )

    with _pytest.raises(ValueError, match="verify"):
        minhash_lsh_pairs(
            None, "k", "items", 0.0, verify=False, min_overlap=3
        )
