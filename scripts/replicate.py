#!/usr/bin/env python
"""Idle-session replicate — the canonical drift adjudication step,
mechanized (r15; BENCH_NOTES r14/r15 performed it by hand).

Runs each named query N times back-to-back in ONE warm session on an
otherwise idle box and prints the walls. Reading the result: the
first execution pays codegen/JIT (1.5-2x, r14 calibration); if the
LATER walls converge to the committed official's fast draws, a drift
flag on this row was box noise or session-position, not a plan
change. If they converge ABOVE the old official, the regression is
real — bisect the code on the row's path.

Usage:
    python scripts/replicate.py graph_triangle_count [more...] [--reps 3]
    (SPARK_GRAFT_SF_DIR overrides the data dir, default sf0.1.
     Never run while bench/pytest/driver_sim is live — contention
     invalidates the replicate.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if not argv:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_mining_map_reduce_spark.queries import SPARK_QUERIES
    from data_mining_map_reduce_spark.session import get_spark

    unknown = [n for n in argv if n not in SPARK_QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark(app_name="replicate")
    for name in argv:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            SPARK_QUERIES[name](spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        tail = walls[1:] or walls
        print(
            f"{name}: {walls}  (first-in-session {walls[0]}, "
            f"converged ~{min(tail)})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
