"""X34 sequence packing + X35 domain-mixture reweighting.

Hand-computed goldens for the packing arithmetic, layout invariance
for the two-phase prefix sum (the scale-safety property: the answer
depends only on the content-addressed order, never on partitioning),
and ratio goldens for the mixture weights.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.packing import (
    packed_doc_spans,
    packed_sequence_stats,
)
from data_mining_map_reduce_spark.operators.text_analysis import (
    domain_mixture_weights,
)


def _hash_order(spark, rows):
    """The content-addressed order the operator packs in —
    recomputed independently (md5 via Spark SQL, sorted in Python)."""
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    hv = {
        r.doc_id: r.hv
        for r in df.select(
            "doc_id",
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("hv"),
        ).collect()
    }
    return sorted(rows, key=lambda r: (hv[r[0]], r[0]))


def _manual_pack(ordered, seq_len):
    """Reference packing plan: pure Python over the given order."""
    out, acc = {}, 0
    for doc_id, n in ordered:
        if n <= 0:
            continue
        start, end = acc, acc + n
        acc = end
        first, last = start // seq_len, (end - 1) // seq_len
        for s in range(first, last + 1):
            o = min(end, (s + 1) * seq_len) - max(start, s * seq_len)
            d, f, t = out.get(s, (0, 0, 0))
            out[s] = (d + 1, f + (1 if first == last else 0), t + o)
    return out


def test_packed_spans_hand_computed(spark):
    rows = [(1, 7), (2, 3), (3, 12), (4, 0), (5, 5)]
    ordered = _hash_order(spark, rows)
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    spans = {
        r.doc_id: r for r in packed_doc_spans(docs, seq_len=10).collect()
    }
    assert 4 not in spans  # zero-token doc contributes nothing
    acc = 0
    for doc_id, n in ordered:
        if n == 0:
            continue
        s = spans[doc_id]
        assert (s.start, s.first_seq, s.last_seq) == (
            acc,
            acc // 10,
            (acc + n - 1) // 10,
        )
        acc += n


def test_packed_sequence_stats_golden(spark):
    rows = [(i, (i * 37) % 23 + 1) for i in range(40)]  # 1..23 tokens
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.seq_id: (r.n_docs, r.n_docs_full, r.n_tokens)
        for r in packed_sequence_stats(docs, seq_len=16).collect()
    }
    want = _manual_pack(_hash_order(spark, rows), 16)
    assert got == want
    # every sequence but the last is exactly full
    last = max(got)
    assert all(v[2] == 16 for s, v in got.items() if s != last)
    assert sum(v[2] for v in got.values()) == sum(n for _, n in rows)


def test_packing_layout_invariant(spark):
    rows = [(i, (i * 13) % 40 + 1) for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    b = (
        spark.createDataFrame(list(reversed(rows)), "doc_id long, n_tokens long")
        .repartition(7)
    )
    pack_a = sorted(
        map(tuple, packed_sequence_stats(a, seq_len=32, parts=3).collect())
    )
    pack_b = sorted(
        map(tuple, packed_sequence_stats(b, seq_len=32, parts=16).collect())
    )
    assert pack_a == pack_b  # row order, input partitioning, and the
    #                          prefix-sum partition count are all invisible


def test_packing_nondeterministic_upstream(spark):
    """The eager localCheckpoint pins the range partitioning, so a
    nondeterministic upstream (rand-derived repartition) cannot place
    rows differently between the subtotal job and the final job
    (r16 ADVICE item 2). The offsets must be internally consistent:
    exactly the prefix sums of the hash order, no gaps, no overlaps."""
    rows = [(i, (i * 7) % 15 + 1) for i in range(50)]
    docs = (
        spark.createDataFrame(rows, "doc_id long, n_tokens long")
        .repartition(11, F.floor(F.rand() * 8))
    )
    spans = sorted(
        packed_doc_spans(docs, seq_len=16, parts=5).collect(),
        key=lambda r: r.start,
    )
    acc = 0
    want = dict(rows)
    for s in spans:
        assert s.start == acc  # contiguous: no gap, no overlap
        assert s.n_tokens == want[s.doc_id]
        acc += s.n_tokens
    assert acc == sum(n for _, n in rows)


def test_doc_longer_than_sequence_spans_many(spark):
    docs = spark.createDataFrame([(1, 100)], "doc_id long, n_tokens long")
    s = packed_doc_spans(docs, seq_len=10).first()
    assert (s.start, s.first_seq, s.last_seq) == (0, 0, 9)
    stats = packed_sequence_stats(docs, seq_len=10).collect()
    assert len(stats) == 10
    assert all(r.n_docs == 1 and r.n_docs_full == 0 for r in stats)
    assert all(r.n_tokens == 10 for r in stats)


def test_mixture_weights_uniform_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),  # 4 tokens
            (2, "a b", "s1"),  # 2
            (3, "x y z", "s2"),  # 3
            (4, "q", "s3"),  # 1
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in domain_mixture_weights(docs).collect()}
    assert rows["s1"].n_docs == 2 and rows["s1"].n_tokens == 6
    assert rows["s1"].natural_share == 0.6
    assert rows["s2"].natural_share == 0.3
    assert rows["s3"].natural_share == 0.1
    for r in rows.values():
        assert r.target_share == pytest.approx(1 / 3, abs=1e-6)
    # weight = target/natural; the tiny source upsamples hardest
    assert rows["s3"].weight == pytest.approx(10 / 3, abs=1e-5)
    assert rows["s1"].weight == pytest.approx(5 / 9, abs=1e-5)
    # token budget at corpus size: a third of 10 tokens each
    assert all(r.budget_tokens == 3 for r in rows.values())


def test_mixture_weights_explicit_target(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "c d", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {
        r.source: r
        for r in domain_mixture_weights(docs, target={"s1": 3, "s2": 1}).collect()
    }
    # target normalizes to 0.75 / 0.25
    assert rows["s1"].target_share == 0.75
    assert rows["s2"].target_share == 0.25
    assert rows["s1"].weight == pytest.approx(1.5, abs=1e-6)
    assert rows["s2"].weight == pytest.approx(0.5, abs=1e-6)


def test_mixture_weights_zero_token_domain(spark):
    """A domain whose docs all tokenize to zero tokens must still get
    its row (weight NULL via try_divide), not blow up the whole query
    with DIVIDE_BY_ZERO under the ANSI session (r16 ADVICE item 1)."""
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "", "empty"), (3, "   ", "empty")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in domain_mixture_weights(docs).collect()}
    assert set(rows) == {"s1", "empty"}
    e = rows["empty"]
    assert (e.n_docs, e.n_tokens, e.natural_share) == (2, 0, 0.0)
    assert e.weight is None  # undefined multiplier, reported not raised
    assert e.target_share == 0.5
    assert rows["s1"].weight == pytest.approx(0.5, abs=1e-6)


def test_bpe_pair_counts_golden(spark):
    """Hand-computed BPE pair counts: 'aab' x2 + 'ab' x1 + 'a' x1
    (too short) -> aa:2, ab:3; multiplicity-weighted, one enumeration
    per DISTINCT word."""
    from data_mining_map_reduce_spark.operators.text_analysis import (
        bpe_pair_counts,
    )

    docs = spark.createDataFrame(
        [(1, "aab ab"), (2, "aab a"), (3, "xy")],
        "doc_id long, text string",
    )
    got = [(r.pair, r.n) for r in bpe_pair_counts(docs, k=10).collect()]
    assert got == [("ab", 3), ("aa", 2), ("xy", 1)]


def test_dedup_keep_best_semantics(spark):
    """Keep-best canonical: within every duplicate group the kept doc
    has the max token count (doc_id tie-break), and exactly one doc
    per group is kept."""
    from data_mining_map_reduce_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["dedup_keep_best_docs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_best: dict = {}
    for r in rows:
        by_best.setdefault(r.best_id, []).append(r)
    for best_id, grp in by_best.items():
        kept = [r for r in grp if r.is_kept]
        assert len(kept) == 1 and kept[0].doc_id == best_id
    # the kept doc really is the longest: re-derive token counts
    from pyspark.sql import functions as F2

    from data_mining_map_reduce_spark.functions.text import (
        normalize,
        tokenize,
    )
    from data_mining_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ntok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F2.size(tokenize(normalize(F2.col("text")))).alias("n")
        ).collect()
    }
    for best_id, grp in by_best.items():
        mx = max((ntok[r.doc_id], -r.doc_id) for r in grp)
        assert (ntok[best_id], -best_id) == mx
