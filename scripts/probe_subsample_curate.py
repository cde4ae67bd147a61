#!/usr/bin/env python
"""Subsample-then-curate, the realistic pipeline order, measured
(r14 verdict optional task 7).

A 100 TB pipeline rarely curates the whole corpus and then samples;
it fixes a per-source token/document budget FIRST (the
stratified_doc_sample shape — content-addressed, resumable) and runs
the expensive curation funnel over the subsample only. This probe
composes the two registered operators at scale and measures what the
composition buys: the funnel's near-dup stage is quadratic-ish in
candidate mass, so cutting the corpus to a fixed per-source quota
up front shrinks the dominant stage by the square of the sampling
rate, not linearly.

Runs at $SPARK_GRAFT_SF_DIR (default scaledata/sf10):
  1. stratified subsample: top QUOTA docs per source by md5 order
     (same operator the registered query uses);
  2. the LSH curation funnel (_corpus_funnel_impl, docs injected)
     over the subsample;
  3. for reference, the same funnel over the FULL corpus — skipped
     unless PROBE_FULL=1 (at sf10 the full-corpus run is the
     ~10-minute receipt SCALE.md already carries for
     corpus_curation_funnel_lsh's family).

Writes scale_artifacts/subsample_curate.json.

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python scripts/probe_subsample_curate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUOTA = 2000  # docs per source — a fixed rebalancing budget


def main() -> int:
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf10"),
    )
    from data_mining_map_reduce_spark import queries as Q
    from data_mining_map_reduce_spark.functions.hashing import md5_hash60
    from data_mining_map_reduce_spark.operators import relational as R
    from data_mining_map_reduce_spark.session import get_spark
    from data_mining_map_reduce_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_subsample_curate")
    out: dict = {"sf_dir": sf, "quota_per_source": QUOTA}

    docs = load_table(spark, sf, "documents")
    out["n_docs_full"] = docs.count()

    t0 = time.time()
    sampled_ids = R.top_k_per_group(
        docs.select("source", "doc_id", md5_hash60("doc_id").alias("_hv")),
        "source",
        [F.col("_hv").asc(), F.col("doc_id").asc()],
        k=QUOTA,
        ties=False,
    ).select("doc_id")
    # materialize the sample once — the funnel reads `docs` from many
    # subtrees and must not re-run the per-source window each time
    sampled = (
        docs.join(sampled_ids, "doc_id").localCheckpoint(eager=True)
    )
    out["n_docs_sampled"] = sampled.count()
    out["sample_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    funnel = Q._corpus_funnel_impl(spark, sf, lsh=True, docs=sampled).collect()
    out["curate_sampled_sec"] = round(time.time() - t0, 1)
    out["funnel_sampled"] = [
        {"stage": r.stage, "n_docs": r.n_docs, "n_tokens": r.n_tokens}
        for r in funnel
    ]

    if os.environ.get("PROBE_FULL") == "1":
        t0 = time.time()
        Q._corpus_funnel_impl(spark, sf, lsh=True).collect()
        out["curate_full_sec"] = round(time.time() - t0, 1)

    path = os.path.join(
        os.path.dirname(__file__), "..", "scale_artifacts", "subsample_curate.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
