"""S10 single-node no-Spark path (solo.py) + the two r11 pipeline
queries (X30 duplicate_ngram_spans, X31 pii_scan_stats).

The solo twin's contract is value-for-value agreement with the Spark
flagship plan — the reference's own no-Spark branch exists to
cross-check answers against its Spark run (reference
Assignment1/task2.py:61-151), and the engine holds itself to the
same bar.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from data_mining_map_reduce_spark.queries import SPARK_QUERIES
from data_mining_map_reduce_spark.solo import flagship_category_avg_solo

SF_SMOKE = "/root/testdata/sf0.001"


def test_solo_engines_agree():
    loop = flagship_category_avg_solo(SF_SMOKE, engine="loop")
    vector = flagship_category_avg_solo(SF_SMOKE, engine="vector")
    assert loop == vector
    assert len(loop) > 0


def test_solo_matches_spark_flagship(spark):
    solo = flagship_category_avg_solo(SF_SMOKE)
    spark_rows = [
        (r.category, r.avg_price, r.n)
        for r in SPARK_QUERIES["flagship_category_avg"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert [tuple(r) for r in solo] == spark_rows


def test_solo_rejects_unknown_engine():
    import pytest

    with pytest.raises(ValueError, match="unknown solo engine"):
        flagship_category_avg_solo(SF_SMOKE, engine="rdd")


def _write_documents(tmp_path, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcT"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_duplicate_ngram_spans_semantics(spark, tmp_path):
    sf = _write_documents(
        tmp_path,
        [
            # docs 1+2 share exactly one 8-gram ("a b c d e f g h")
            (1, "a b c d e f g h i"),
            (2, "a b c d e f g h z y x w"),
            # doc 3 repeats an 8-gram INSIDE one doc only -> n_docs=1,
            # must be filtered by the >=2 distinct-docs rule
            (3, "x x x x x x x x x"),
            # doc 4 is too short for any 8-gram; must not crash the
            # sequence() guard
            (4, "too short for spans"),
        ],
    )
    rows = SPARK_QUERIES["duplicate_ngram_spans"](spark, sf).collect()
    assert [(r.gram, r.n_docs, r.n_occ) for r in rows] == [
        ("a b c d e f g h", 2, 2)
    ]


_PASSAGE = (
    "the quick brown fox jumps over seventeen green wizards who "
    "compile elaborate spark plans nightly before dawn breaks"
)


def _winnowed_fixture(tmp_path):
    """docs 1+2 share an 18-word passage (long enough that winnowing
    guarantees >= 10 shared fingerprints -> they become candidates);
    docs 3+4 share exactly one 8-gram of single-letter words (8
    normalized chars — below the k+window-1 = 11-char winnowing
    guarantee and far below the 10-shared-fps pair threshold -> NOT
    candidates); doc 5 is unrelated."""
    return _write_documents(
        tmp_path,
        [
            (1, "alpha beta " + _PASSAGE + " gamma"),
            (2, "delta epsilon " + _PASSAGE + " zeta"),
            (3, "a b c d e f g h i nine ten eleven twelve"),
            (4, "zz yy xx a b c d e f g h qq rr ss tt"),
            (5, "completely unrelated filler content goes here okay then"),
        ],
    )


def test_winnowed_spans_cut_non_candidate_docs(spark, tmp_path):
    sf = _winnowed_fixture(tmp_path)
    uncut = {
        (r.gram, r.n_docs, r.n_occ)
        for r in SPARK_QUERIES["duplicate_ngram_spans"](spark, sf).collect()
    }
    winnowed = {
        (r.gram, r.n_docs, r.n_occ)
        for r in SPARK_QUERIES["duplicate_ngram_spans_winnowed"](
            spark, sf
        ).collect()
    }
    # the planted near-dup passage: all 11 of its word-8-grams
    # survive the winnowing cut with full counts (recall on true
    # near-dups)
    words = _PASSAGE.split()
    passage_spans = {
        (" ".join(words[i : i + 8]), 2, 2) for i in range(len(words) - 7)
    }
    assert len(passage_spans) == 11
    assert passage_spans <= winnowed
    assert passage_spans <= uncut
    # the incidental single-8-gram echo is in the uncut result but
    # cut by the candidate stage (its docs share < 10 fingerprints)
    assert ("a b c d e f g h", 2, 2) in uncut
    assert ("a b c d e f g h", 2, 2) not in winnowed
    # containment: on this fixture every winnowed span's occurrences
    # are confined to candidate docs, so its counts match the uncut
    # query's exactly
    assert winnowed <= uncut


def test_winnowed_spans_empty_when_no_candidates(spark, tmp_path):
    """A corpus with no fingerprint-overlap pairs (all docs distinct)
    must yield an EMPTY winnowed result without error — the shape a
    deduplicated crawl slice actually has."""
    sf = _write_documents(
        tmp_path,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "red orange yellow green blue indigo violet maroon pink"),
        ],
    )
    assert (
        SPARK_QUERIES["duplicate_ngram_spans_winnowed"](spark, sf).count() == 0
    )


def test_winnowed_spans_equal_spans_over_candidates(spark, tmp_path):
    """The composition is exactly 'X30 restricted to X4's candidate
    docs': recomputing span ranking over winnow_candidate_docs by hand
    must reproduce the registered query bit-for-bit."""
    from data_mining_map_reduce_spark.queries import (
        _dup_span_grams,
        _rank_dup_spans,
        winnow_candidate_docs,
    )
    from data_mining_map_reduce_spark.sources.catalog import load_table

    sf = _winnowed_fixture(tmp_path)
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    manual = _rank_dup_spans(_dup_span_grams(winnow_candidate_docs(docs)))
    registered = SPARK_QUERIES["duplicate_ngram_spans_winnowed"](spark, sf)
    assert [tuple(r) for r in manual.collect()] == [
        tuple(r) for r in registered.collect()
    ]


def test_pii_probe_row_pinned(spark):
    """The planted '_probe_pii' docs carry known PII: 2 emails, 2
    phone numbers, 5 IPv4s, 2 SSNs, and 2 Luhn-valid cards across 5
    documents (root@10.1.1.5 is an IP hit, NOT an email — the email
    TLD requires letters). A drift here means one regex dialect
    changed behavior."""
    rows = {
        r.source: r
        for r in SPARK_QUERIES["pii_scan_stats"](spark, SF_SMOKE).collect()
    }
    probe = rows["_probe_pii"]
    assert (
        probe.n_docs,
        probe.docs_with_pii,
        probe.emails,
        probe.phones,
        probe.ips,
    ) == (5, 5, 2, 2, 5)
    # the synthetic corpus itself is PII-free: every non-probe source
    # row must report zero matches
    for source, r in rows.items():
        if source != "_probe_pii":
            assert (r.docs_with_pii, r.emails, r.phones, r.ips) == (
                0,
                0,
                0,
                0,
            )
