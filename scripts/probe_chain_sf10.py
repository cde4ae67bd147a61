#!/usr/bin/env python
"""The realistic end-to-end curation chain, measured at scale
(r15 verdict task 7, extended r16 with the packing tail): subsample
-> curation funnel -> DSIR importance resample -> sequence packing.

A 100 TB training-data pipeline in its real order:

  1. **stratified subsample** — fix a per-source document budget
     FIRST (content-addressed md5 order, resumable), so every
     downstream stage works on the budgeted corpus, not the raw one;
  2. **curation funnel (LSH)** — exact dedup -> banded-MinHash
     near-dup -> quality -> language, over the subsample only (the
     near-dup stage is quadratic-ish in candidate mass, so the
     subsample shrinks it by the square of the sampling rate —
     measured in scale_artifacts/subsample_curate.json);
  3. **DSIR importance resample** (Xie et al. 2023,
     arXiv:2302.03169) — score each surviving doc by the target-vs-
     corpus unigram likelihood ratio and draw the final training
     subset with the log-domain A-ES sampler (X33 + X22).

Every stage is a registered operator (stratified_doc_sample's
top_k_per_group, _corpus_funnel_impl, dsir_log_importance,
weighted_sample_log2) — this probe only composes them and measures
per-stage walls + counts at $SPARK_GRAFT_SF_DIR (default
scaledata/sf10).

Writes scale_artifacts/chain_sf10.json.

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python scripts/probe_chain_sf10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUOTA = 2000  # docs per source — the rebalancing budget (matches
#               probe_subsample_curate.py so the funnel walls compare)
FINAL_K = int(os.environ.get("CHAIN_FINAL_K", "5000"))  # resampled subset size


def main() -> int:
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf10"),
    )
    from data_mining_map_reduce_spark import queries as Q
    from data_mining_map_reduce_spark.functions.hashing import md5_hash60
    from data_mining_map_reduce_spark.operators import relational as R
    from data_mining_map_reduce_spark.operators.text_analysis import (
        dsir_log_importance,
    )
    from data_mining_map_reduce_spark.session import get_spark
    from data_mining_map_reduce_spark.sources.catalog import load_table
    from data_mining_map_reduce_spark.streaming.reservoir import (
        weighted_sample_log2,
    )

    spark = get_spark(app_name="probe_chain_sf10")
    out: dict = {"sf_dir": sf, "quota_per_source": QUOTA, "final_k": FINAL_K}

    docs = load_table(spark, sf, "documents")
    out["n_docs_full"] = docs.count()

    # -- stage 1: stratified subsample ---------------------------------
    t0 = time.time()
    sampled_ids = R.top_k_per_group(
        docs.select("source", "doc_id", md5_hash60("doc_id").alias("_hv")),
        "source",
        [F.col("_hv").asc(), F.col("doc_id").asc()],
        k=QUOTA,
        ties=False,
    ).select("doc_id")
    sampled = docs.join(sampled_ids, "doc_id").localCheckpoint(eager=True)
    out["n_docs_sampled"] = sampled.count()
    out["sample_sec"] = round(time.time() - t0, 1)

    # -- stage 2: curation funnel (LSH path), survivors out -------------
    t0 = time.time()
    surv_ids = Q._corpus_funnel_impl(
        spark, sf, lsh=True, docs=sampled, survivors=True
    ).localCheckpoint(eager=True)
    out["n_docs_curated"] = surv_ids.count()
    out["curate_sec"] = round(time.time() - t0, 1)

    # -- stage 3: DSIR weights + log-domain A-ES resample ---------------
    t0 = time.time()
    surv_docs = sampled.join(surv_ids, "doc_id")
    weights = dsir_log_importance(surv_docs, target_value="src0")
    final = weighted_sample_log2(
        weights, FINAL_K, "log2_w", seed=7, id_cols=["doc_id"]
    ).select("doc_id", "n_tokens", "log2_w")
    rows = final.collect()
    out["dsir_resample_sec"] = round(time.time() - t0, 1)
    out["n_docs_final"] = len(rows)

    # the paper's §3 sanity property, at scale: the resampled subset's
    # mean log importance must exceed the survivor-pool mean
    pool_n, pool_mean = weights.agg(
        F.count(F.lit(1)), F.avg("log2_w")
    ).first()
    sel_mean = sum(r.log2_w for r in rows) / max(len(rows), 1)
    out["pool_n"] = pool_n
    out["pool_mean_log2_w"] = round(pool_mean, 4)
    out["selected_mean_log2_w"] = round(sel_mean, 4)
    out["selection_lift"] = round(sel_mean - pool_mean, 4)
    # vacuous when k >= pool (the sampler keeps everything)
    if pool_n > FINAL_K:
        assert sel_mean > pool_mean, "resample failed to shift toward target"

    # -- stage 4: pack the selected subset into training sequences ------
    from data_mining_map_reduce_spark.operators.packing import (
        packed_sequence_stats,
    )

    t0 = time.time()
    sel = spark.createDataFrame(rows).select("doc_id", "n_tokens")
    seqs = packed_sequence_stats(sel, seq_len=2048).collect()
    out["pack_sec"] = round(time.time() - t0, 1)
    out["n_sequences"] = len(seqs)
    out["packed_tokens"] = int(sum(r.n_tokens for r in seqs))
    assert out["packed_tokens"] == sum(r.n_tokens for r in rows)

    path = os.path.join(
        os.path.dirname(__file__), "..", "scale_artifacts", "chain_sf10.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
