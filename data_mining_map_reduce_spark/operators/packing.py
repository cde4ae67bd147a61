"""Sequence packing — the last step of a training-data pipeline:
concatenate the curated corpus in a deterministic order and chunk it
into fixed-size context windows ("concat-and-chunk", the standard
LLM pre-training layout; e.g. GPT-2/3, LLaMA data loaders).

The engine computes the PACKING PLAN, not the token stream: which
documents land in which training sequence, how many documents each
sequence straddles, and how full each sequence is. That plan is pure
integer arithmetic over per-doc token counts — no tokenizer needed —
and is what a 100 TB pipeline materializes anyway (the shard
manifest that lets every worker slice its sequences without reading
its neighbours).

Scale design: the only global state is a prefix sum over token
counts in a content-addressed order (md5 of doc id — the same
layout-independent ordering the stratified sampler uses, replayable
in SQL). A naive ``SUM() OVER (ORDER BY ...)`` with no partition key
coalesces the whole corpus into ONE task; instead the prefix sum is
the classic two-phase scan:

  1. range-repartition by the hash key (Spark's distributed sort
     machinery, no single-task stage), per-PARTITION token subtotals
     — one row per partition — collected to the driver (bounded by
     the partition count, never the data);
  2. broadcast the per-partition starting offsets back and finish
     with a window PARTITIONED by partition id — every task scans
     only its own partition.

The result depends only on the global hash order, not on where the
range boundaries fall, so the plan is deterministic under any
cluster size (range-sampling may place boundaries differently; the
exclusive prefix offsets are exact either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash60

__all__ = ["packed_doc_spans", "packed_sequence_stats"]


def packed_doc_spans(
    docs: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    parts: int = 32,
) -> DataFrame:
    """Per-document packing plan: concatenate all documents in
    md5(``id_col``) order and cut the stream every ``seq_len``
    tokens. Returns one row per document —
    (id, n_tokens, start, first_seq, last_seq) — where ``start`` is
    the document's global token offset and first/last_seq the
    training sequences it overlaps (a doc longer than ``seq_len``
    spans several; docs never pad, the cut crosses them).

    Zero-token documents are excluded — they contribute nothing to
    the stream (same contract as doc_lm_perplexity's >= 1-token
    rule).

    Eager-action note (the _guard_lsh_verify convention): building
    this DataFrame runs TWO driver jobs before the caller's own
    action — the eager localCheckpoint that materializes the
    range-partitioned relation, then the per-partition subtotal
    collect (bounded: one row per partition). The checkpoint pins
    the partition layout so the subtotal job and the final plan read
    the SAME placement — without it, a nondeterministic upstream
    (rand/sample/nondeterministic source) could land rows in
    different range partitions across the two executions and yield
    silently wrong offsets (r16 ADVICE item 2; cf. the
    media_near_dup_pairs pin).
    """
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = (
        docs.select(
            F.col(id_col).alias("_id"),
            tok.cast("bigint").alias("n_tokens"),
            md5_hash60(id_col).alias("_hv"),
        )
        .where(F.col("n_tokens") > 0)
        .repartitionByRange(parts, "_hv", "_id")
        .localCheckpoint(eager=True)
    )
    pid = F.spark_partition_id()
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("_hv", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn("_pid", pid).withColumn(
        "_local_start", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # phase-1 subtotals: one row per partition, driver state bounded
    # by the partition count
    subtotals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(subtotals):
        offsets[p] = acc
        acc += subtotals[p]
    off = F.coalesce(
        *(
            [
                F.when(F.col("_pid") == p, F.lit(o))
                for p, o in sorted(offsets.items())
            ]
            + [F.lit(0)]
        )
    )
    start = F.col("_local_start") + off
    return local.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        start.alias("start"),
        F.floor(start / seq_len).alias("first_seq"),
        F.floor((start + F.col("n_tokens") - 1) / seq_len).alias("last_seq"),
    )


def packed_sequence_stats(
    docs: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    parts: int = 32,
) -> DataFrame:
    """Per-sequence packing stats: for every ``seq_len``-token
    training sequence, how many documents it touches, how many it
    contains whole, and how many tokens it holds (== ``seq_len``
    everywhere but the final, partially-filled sequence). One row
    per sequence — (seq_id, n_docs, n_docs_full, n_tokens).

    The explode is bounded: a document emits one row per sequence it
    overlaps, so total exploded rows = n_docs + total_tokens/seq_len
    — linear, never quadratic.
    """
    spans = packed_doc_spans(
        docs, seq_len=seq_len, id_col=id_col, tokens_col=tokens_col, parts=parts
    )
    end = F.col("start") + F.col("n_tokens")  # exclusive
    seq = F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id")
    per_seq = spans.select(
        seq,
        F.col("start"),
        end.alias("_end"),
        (F.col("first_seq") == F.col("last_seq")).alias("_single"),
    )
    s_start = F.col("seq_id") * seq_len
    s_end = s_start + seq_len
    overlap = F.least(F.col("_end"), s_end) - F.greatest(F.col("start"), s_start)
    # a doc is whole in a sequence iff it overlaps exactly one
    # (first_seq == last_seq ⇒ its only exploded row is that one)
    whole = F.col("_single")
    return (
        per_seq.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(whole.cast("long")).alias("n_docs_full"),
            F.sum(overlap).cast("long").alias("n_tokens"),
        )
        .orderBy("seq_id")
    )
