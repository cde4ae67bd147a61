#!/usr/bin/env python
"""r18 VERDICT task 5 receipt: FPGrowth numPartitions sweep.

The ml.fpm mining (genFreqItemsets — one flatMap task per conditional
tree group) runs at ACTION time over the basket relation's partition
layout; AQE coalesces the basket-prep joins to very few partitions at
bench scale, so the mining can be underparallelized. ``numPartitions``
is the mllib-level knob that repartitions the conditional-tree work.
This probe times the full query wall (construction + noop action) per
setting and asserts output identity against the default.

Usage: python scripts/probe_r18_fpg_parts.py [sf_dir] [parts ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = [int(p) for p in sys.argv[2:]] or [0, 8, 32, 64]

    from data_mining_map_reduce_spark.queries import (
        SPARK_QUERIES,
        _order_baskets,
        _son_support,
    )
    from data_mining_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="fpg_parts_probe")
    SPARK_QUERIES["flagship_category_avg"](spark, sf_dir).collect()

    baseline = None
    for rep in range(2):
        for p in parts:
            # p=0 -> the library default (env "0" disables the knob)
            os.environ["SPARK_GRAFT_FPG_PARTS"] = str(p)
            spark.sparkContext.setJobDescription(f"fpg parts={p}")
            t0 = time.perf_counter()
            df = SPARK_QUERIES["fpgrowth_itemsets"](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            print(f"rep={rep} parts={p}: {w:.2f}s", flush=True)
            spark.catalog.clearCache()
            if rep == 0:
                rows = {(r["itemset"], r["support"]) for r in df.collect()}
                if baseline is None:
                    baseline = rows
                print(f"  identical_to_default={rows == baseline} n={len(rows)}",
                      flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
