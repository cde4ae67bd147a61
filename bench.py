#!/usr/bin/env python
"""Benchmark harness: runs every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A warmup
run of the flagship query absorbs JVM/codegen startup so per-query
numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from data_mining_map_reduce_spark.queries import SPARK_QUERIES
    from data_mining_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warmup: JVM JIT + codegen + parquet footer caches.
    SPARK_QUERIES["flagship_category_avg"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in sorted(SPARK_QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
