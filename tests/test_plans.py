"""Physical-plan shape assertions: the scale contract, checked.

Correctness oracles prove the WHAT; these prove the HOW survives a
100x scale-up — filters reach the parquet scan, small dims broadcast,
the multi-grain rollup is one pass, the range join never shuffles the
fact side. A plan that silently degrades (broadcast dropped,
pushdown lost, extra shuffle) fails here long before it fails a
cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mining_map_reduce_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_prunes_and_pushes(spark, sf_dir):
    """Column pruning + predicate pushdown reach the lineitem scan:
    a 2-column projection with a filter must read 2-3 columns, not
    all 11, and carry a PushedFilters entry."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_flagship_joins_broadcast(spark, sf_dir):
    """The flagship scan+join+agg query must broadcast its dimension
    sides — no shuffle (SortMerge/ShuffledHash) join anywhere."""
    from data_mining_map_reduce_spark.queries import flagship_category_avg

    plan = _plan(flagship_category_avg(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_multigrain_rollup_single_shuffle(spark, sf_dir):
    """event_rollup_multigrain: both grains from ONE events scan and
    ONE aggregation exchange (plus the orderBy's range exchange) —
    not a scan-per-grain union."""
    from data_mining_map_reduce_spark.queries import event_rollup_multigrain

    plan = _plan(event_rollup_multigrain(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_range_join_broadcasts_dim(spark, sf_dir):
    """event_value_tier_counts: the tier dim rides a broadcast
    nested-loop join; the fact side must not shuffle for the join."""
    from data_mining_map_reduce_spark.queries import event_value_tier_counts

    plan = _plan(event_value_tier_counts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_cooccurrence_no_cartesian(spark, sf_dir):
    """The pair theta-join is expressed as equi-join + HAVING: no
    CartesianProduct / non-broadcast nested loop may appear."""
    from data_mining_map_reduce_spark.queries import cooccurrence_pairs

    plan = _plan(cooccurrence_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_exact_jaccard_prefix_branch_no_cartesian(spark, sf_dir):
    """Prefix-filtered all-pairs similarity: candidates come from an
    item equi-join, never a cross product. (Codegen spans aren't
    asserted — under AQE the pre-execution plan string hides them.)"""
    from data_mining_map_reduce_spark.operators.similarity import (
        exact_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    pairs = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    plan = _plan(exact_jaccard_pairs(pairs, "doc_id", "w", threshold=0.5))
    assert "CartesianProduct" not in plan


def test_partition_layout_stats_balance(spark, sf_dir):
    """A1-task3 twin: the hash8 layout spreads rows across all 8
    partitions with no empty partition and reasonable balance (hash
    partitioning on a high-cardinality key), and totals match the
    table count under BOTH layouts."""
    from data_mining_map_reduce_spark.queries import partition_layout_stats

    rows = partition_layout_stats(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "lineitem").count()
    by_layout: dict[str, list[int]] = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r.n_rows)
    assert sum(by_layout["default"]) == total
    assert sum(by_layout["hash8"]) == total
    assert len(by_layout["hash8"]) == 8
    mx, mn = max(by_layout["hash8"]), min(by_layout["hash8"])
    assert mn > 0 and mx <= 3 * mn, by_layout["hash8"]


def test_kmv_plans_take_ordered(spark, sf_dir):
    """kmv_distinct_users: the k smallest hashes must come from
    TakeOrderedAndProject (per-partition top-k merged on the driver),
    never a global Sort — the difference between O(k) driver state
    and a full-sort shuffle at corpus scale."""
    from data_mining_map_reduce_spark.operators.sketches import (
        kmv_distinct_estimate,
    )

    events = load_table(spark, sf_dir, "events")
    plan = _plan(kmv_distinct_estimate(events, "user_id", k=256))
    assert "TakeOrderedAndProject" in plan
    # no global sort exchange for the top-k (rangepartitioning = sort)
    assert "Exchange rangepartitioning" not in plan


def test_minhash_signature_partial_aggregates(spark, sf_dir):
    """The MinHash signature must be a partial->final aggregate (the
    shuffle carries one 32-slot row per key per map partition), and
    the per-item hashing must appear ONCE in the plan — the r6
    rewrite's whole point vs the interpreted per-row HOF tree."""
    from data_mining_map_reduce_spark.operators.similarity import (
        minhash_lsh_pairs,
    )
    from data_mining_map_reduce_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        doc_shingles(docs), "doc_id", "shingles",
        threshold=0.5, num_hashes=32, bands=16, materialize=False,
    )
    plan = _plan(pairs)
    assert "partial_min" in plan  # map-side combine of the signature mins

    # The default (materialize=True) pins the signature aggregate
    # behind a lazy localCheckpoint: the consuming plan must read RDD
    # blocks, with NO signature aggregate and NO parquet re-scan in
    # sight — the r13 fix for the ~6x basket-subtree re-execution
    # (the aggregate shape itself is pinned above via the knob).
    pinned = _plan(
        minhash_lsh_pairs(
            doc_shingles(docs), "doc_id", "shingles",
            threshold=0.5, num_hashes=32, bands=16,
        )
    )
    assert "ExistingRDD" in pinned
    assert "partial_min" not in pinned
    assert "Scan parquet" not in pinned


def test_count_min_plans_broadcast_and_partial_agg(spark, sf_dir):
    """cm_heavy_hitter_partkeys: the <= depth*width-row sketch side
    must BROADCAST into the estimate join (never shuffle the
    candidate side for it), the grid build must partial-aggregate
    map-side, and the final top-20 must be TakeOrderedAndProject,
    not a global sort."""
    from data_mining_map_reduce_spark.queries import cm_heavy_hitter_partkeys

    plan = _plan(cm_heavy_hitter_partkeys(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_duplicate_ngram_spans_plan_stays_in_codegen(spark, sf_dir):
    """X30's span expansion (transform + sequence + slice +
    array_join + explode) must stay JVM-side — no Python evaluation
    node anywhere in the hot path — and the final top-25 must be
    TakeOrderedAndProject, not a global sort. The countDistinct must
    partial-aggregate map-side (the distinct (gram, doc) collapse is
    what bounds hot-span skew at scale)."""
    from data_mining_map_reduce_spark.queries import duplicate_ngram_spans

    plan = _plan(duplicate_ngram_spans(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_pii_scan_plan_stays_in_codegen(spark, sf_dir):
    """X31's triple regexp_extract_all scan is a stateless projection:
    JVM regex in codegen, one partial-aggregated groupBy, no Python
    nodes, no join."""
    from data_mining_map_reduce_spark.queries import pii_scan_stats

    plan = _plan(pii_scan_stats(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_" in plan


def test_pii_redact_plan_stays_in_codegen(spark, sf_dir):
    """The redaction half is the same stateless scan shape as the
    detection half — the regexp_replace chain and all six re-scan
    counts are one codegen projection, one partial-aggregated
    groupBy, no Python nodes, no join."""
    from data_mining_map_reduce_spark.queries import pii_redact_stats

    plan = _plan(pii_redact_stats(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_" in plan


def test_winnowed_spans_plan_shape(spark, sf_dir):
    """X30 x X4: no Python nodes anywhere (winnowing is window
    functions over a posexplode, the span expansion is the same
    codegen tree as the uncut X30), no cartesian product, and the
    final top-25 is TakeOrderedAndProject. The candidate join is left
    to AQE on purpose (the candidate list's size is data-dependent) —
    this test pins only the 100TB-unsafe shapes out."""
    from data_mining_map_reduce_spark.queries import (
        duplicate_ngram_spans_winnowed,
    )

    plan = _plan(duplicate_ngram_spans_winnowed(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    # the winnowing pipeline (per-char posexplode + double window)
    # must NOT appear in the consuming plan: the r12 localCheckpoint
    # materializes the fp relation once, where the un-checkpointed
    # plan executed the whole pipeline three times (plan-audited)
    assert "posexplode" not in plan


def test_lm_perplexity_prunes_and_stays_codegen(spark, sf_dir):
    """doc_lm_perplexity's scale contract: the documents scan reads
    ONLY (doc_id, text) — a perplexity pass over 100 TB must not drag
    the other columns — and the scoring plan contains no Python eval
    (everything is codegen expressions; the only BroadcastNestedLoop
    is the intended 1-row corpus-total broadcast)."""
    from data_mining_map_reduce_spark.operators.text_analysis import (
        lm_perplexity,
    )

    docs = load_table(spark, sf_dir, "documents")
    # materialize=False: the localCheckpoint pin replaces lineage with
    # an ExistingRDD scan in the outer plan (same knob contract as
    # minhash_lsh_pairs), so pruning is asserted on the pure plan
    plan = _plan(lm_perplexity(docs, materialize=False))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    for ln in scan:
        schema = ln.split("ReadSchema:")[1]
        assert "text" in schema and "doc_id" in schema
        assert "lang" not in schema and "source" not in schema, ln
        assert "n_chars" not in schema, ln
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_weights_single_explode_pin(spark, sf_dir):
    """X33 plan contract: the (doc, slice, token, count) relation is
    pinned behind a lazy localCheckpoint, so the consuming plan reads
    RDD blocks — the tokenizer explode and the documents scan appear
    ZERO times (three consumers would otherwise re-run the explode
    each; the minhash/source_token_kl precedent). materialize=False
    keeps the pure-lineage plan for shape checks."""
    from data_mining_map_reduce_spark.operators.text_analysis import (
        dsir_log_importance,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned = _plan(dsir_log_importance(docs, "src0"))
    assert "ExistingRDD" in pinned
    assert "Scan parquet" not in pinned
    assert "Generate explode" not in pinned
    # the pure-lineage form keeps the explode visible (the knob the
    # pin is asserted against)
    raw = _plan(dsir_log_importance(docs, "src0", materialize=False))
    assert "Generate explode" in raw


def test_no_rowwise_python_or_cartesian_anywhere_fast_subset(spark, sf_dir):
    """Registry-wide structural invariant, asserted on the subset
    whose plans build without training jobs (scripts/plan_audit.py
    sweeps ALL queries per round — PLAN_AUDIT.md is its committed
    receipt): no BatchEvalPython (row-at-a-time Python UDF) and no
    raw CartesianProduct (unbroadcast cross join) may appear in any
    executed plan. Arrow-batched MapInPandas/FlatMapGroupsInPandas
    and BroadcastNestedLoopJoin are the sanctioned forms."""
    from data_mining_map_reduce_spark.queries import SPARK_QUERIES

    fast = [
        "flagship_category_avg", "basic_count_stats", "join_filter_brand_counts",
        "top_customers_per_segment", "event_rollup_multigrain", "revenue_cube",
        "word_count_top20", "tfidf_top_terms", "doc_lm_perplexity",
        "source_token_kl", "doc_dsir_weights", "stratified_doc_sample",
        "cooccurrence_pairs", "frequent_pairs", "order_item_lists",
        "asof_last_purchase", "pivot_status_by_priority", "language_id_docs",
        "doc_quality_stats", "exact_dup_doc_groups",
    ]
    for name in fast:
        plan = (
            SPARK_QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
