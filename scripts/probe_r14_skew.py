#!/usr/bin/env python
"""The pre-cut edge build's WIN REGIME, measured (r14): degree skew.

The flat sf10 corpus is the exact build's home turf — item degree is
~10 with zero hot buckets (max banded bucket 73 at sf10), and ~40-item
baskets against 32 minhashes mean banding samples nearly every item:
measured candidate volume 343M vs the exact build's ~300M pair rows,
so the pre-cut pays signature + dedup on top of the same volume and
LOSES (758.7 s vs 350.6 s, SCALE.md r14). The pre-cut exists for the
regime that kills the exact build at 100 TB: a few HOT items whose d²
term owns the output. This probe manufactures that regime on the sf1
corpus — HOT_N synthetic items each shared by every ~SKIP-th customer
— and times both builds on the SAME skewed relation:

  exact:   each hot item adds C(n_hot, 2) ≈ 32M pair rows through the
           shuffle (5 items ≈ +160M rows on a 30M-row base — the d²
           blowup in miniature);
  pre-cut: a hot item is the per-hash MINIMUM of only ~1/|basket| of
           its holders, so its buckets stay ~n_hot/40 wide and the
           banding absorbs the skew; candidates barely grow.

Writes scale_artifacts/precut_skew.json (consumed by SCALE.md).

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python scripts/probe_r14_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_mining_map_reduce_spark.session import get_spark  # noqa: E402

HOT_N = 5
SKIP = 18  # every 18th custkey holds each hot item (~8.3k holders at sf1)


def main() -> int:
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf1"),
    )
    out: dict = {"sf_dir": sf, "hot_items": HOT_N, "holder_skip": SKIP}
    spark = get_spark(app_name="precut-skew-probe")

    from data_mining_map_reduce_spark.operators.relational import (
        co_occurrence_pairs,
        co_occurrence_pairs_lsh,
    )
    from data_mining_map_reduce_spark.queries import _customer_part_pairs

    base = _customer_part_pairs(spark, sf)
    keys = base.select("k").distinct()
    hot = (
        keys.crossJoin(spark.range(HOT_N).select(F.col("id").alias("_h")))
        .where(F.pmod(F.col("k"), F.lit(SKIP)) == F.col("_h"))
        # ids far outside the real partkey range; same BIGINT type as i
        .select("k", (F.lit(10_000_000_000) + F.col("_h")).alias("i"))
    )
    skewed = base.unionByName(hot).localCheckpoint(eager=True)
    out["pairs_rows"] = skewed.count()
    out["hot_holders"] = skewed.where(F.col("i") >= 10_000_000_000).count()

    t0 = time.perf_counter()
    out["precut_edges"] = co_occurrence_pairs_lsh(
        skewed, "k", "i", min_shared=3
    ).count()
    out["precut_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["exact_edges"] = co_occurrence_pairs(
        skewed, "k", "i", min_shared=3
    ).count()
    out["exact_sec"] = round(time.perf_counter() - t0, 1)

    path = os.path.join(
        os.path.dirname(__file__), "..", "scale_artifacts", "precut_skew.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
