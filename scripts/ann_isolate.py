#!/usr/bin/env python
"""One isolated rep of the ann_topk_ivf / ann_topk_ivfpq timing
(BENCH_NOTES.md "ann_topk_ivf isolation" section): fresh session,
flagship warmup (the bench.py condition), one timed collect each.
Run several times, minutes apart, on a quiet box.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from data_mining_map_reduce_spark.queries import SPARK_QUERIES  # noqa: E402
from data_mining_map_reduce_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ann-isolate")
SPARK_QUERIES["flagship_category_avg"](spark, sf).collect()
for name in ("ann_topk_ivf", "ann_topk_ivfpq"):
    t0 = time.perf_counter()
    SPARK_QUERIES[name](spark, sf).collect()
    print(f"{name}: {time.perf_counter() - t0:.2f}s")
spark.stop()
