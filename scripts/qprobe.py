#!/usr/bin/env python
"""Per-query measurement probe (guide §1: measure first).

For each named query: time CONSTRUCTION (plan build — includes any
eager guard/fit/checkpoint jobs) separately from the ACTION, count
Spark jobs attributable to each phase via the status tracker, and
report both. The action is ``collect()`` by default — the bench's
timed action — or the noop sink with ``--noop`` (guide §1.4) to time
computation without driver transfer.

Usage:
    python scripts/qprobe.py [--noop] [--reps N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        if i + 1 >= len(args):
            print("usage: --reps N (missing N)", file=sys.stderr)
            return 2
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_mining_map_reduce_spark.queries import SPARK_QUERIES
    from data_mining_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="qprobe")
    # warmup: same as bench
    SPARK_QUERIES["flagship_category_avg"](spark, sf_dir).collect()
    tracker = spark.sparkContext.statusTracker()
    out = []
    for name in names:
        fn = SPARK_QUERIES[name]
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"qprobe:{name}:build")
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None))
            spark.sparkContext.setJobDescription(f"qprobe:{name}:action")
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None))
            spark.catalog.clearCache()
            rec = {
                "query": name,
                "rep": rep,
                "build_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "action_jobs": j2 - j1,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
