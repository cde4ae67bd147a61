"""Dedup block: exact content-hash groups, MinHash-LSH and SimHash
near-dup over documents — planted-duplicate recall, mirroring the
reference's LSH grading (A3 PDF §4.1.4 accuracy >= 0.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.dedup import (
    doc_shingles,
    exact_duplicate_groups,
    simhash_near_dup_pairs,
)
from data_mining_map_reduce_spark.operators.similarity import (
    exact_jaccard_pairs,
    minhash_lsh_pairs,
)
from data_mining_map_reduce_spark.sources.catalog import load_table

SF_CORRECT = "/root/testdata/sf0.01"


def test_exact_dup_groups_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox."),
            (2, "the quick brown fox"),   # same after normalize
            (3, "THE QUICK, BROWN FOX!"),  # same after normalize
            (4, "a different document entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.canonical_id, r.group_size)
            for r in exact_duplicate_groups(docs).collect()}
    assert rows[1] == (1, 3) and rows[2] == (1, 3) and rows[3] == (1, 3)
    assert rows[4] == (4, 1)


def test_lsh_near_dup_recall_on_planted_docs(spark):
    """documents carries generator-planted near-dups; the LSH path
    must recover >= 90% of exact-Jaccard>=0.5 pairs with precision 1
    (verify step filters at the same threshold)."""
    docs = load_table(spark, SF_CORRECT, "documents")
    sh = doc_shingles(docs).cache()
    exact = {
        (r.a, r.b)
        for r in exact_jaccard_pairs(
            sh.select("doc_id", F.explode("shingles").alias("s")),
            "doc_id",
            "s",
            threshold=0.5,
        ).collect()
    }
    lsh = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(
            sh, "doc_id", "shingles", threshold=0.5, num_hashes=64, bands=32
        ).collect()
    }
    assert len(exact) > 0
    assert lsh <= exact  # precision 1.0 (same verify threshold)
    assert len(lsh & exact) / len(exact) >= 0.9


def test_simhash_separates_planted_from_random(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.upper() + "."),            # exact dup after normalize
            (3, "totally unrelated words " * 12 + "omicron pi rho sigma"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.a, r.b): r.hamming for r in simhash_near_dup_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_query_finds_planted_docs(spark):
    """At hamming<=7 with 8 bands, recall at that radius is 1.0 by
    pigeonhole; most of the corpus's planted near-dups (hamming 0-10
    at Jaccard 0.9+) must surface."""
    docs = load_table(spark, SF_CORRECT, "documents")
    pairs = simhash_near_dup_pairs(docs).collect()
    assert len(pairs) >= 15
    # every reported pair is within the radius
    assert all(r.hamming <= 7 for r in pairs)


def test_word_ngrams_short_input_guard(spark):
    from data_mining_map_reduce_spark.functions.text import word_ngrams

    df = spark.createDataFrame([("one two",), ("a b c d",)], "t string")
    out = df.select(
        word_ngrams(F.split("t", " "), 3).alias("g")
    ).collect()
    assert out[0].g == []
    assert out[1].g == ["a b c", "b c d"]
