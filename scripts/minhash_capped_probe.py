#!/usr/bin/env python
"""Measure minhash LSH with the DEFAULT hot-bucket cap (the scale
path) at a given SF dir — the bench/oracle variant disables
max_bucket solely so DuckDB can replay banding exactly, and the sf10
probe showed that uncapped variant grows 22x for 10x data. This run
quantifies what scale users actually get (max_bucket=5000), plus the
recall vs the uncapped run's pair count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1]

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_SIM_CPUS', '32')}]")
    .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SIM_PARTS", "128"))
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("minhash-capped-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from data_mining_map_reduce_spark.queries import _customer_part_pairs  # noqa: E402
from data_mining_map_reduce_spark.operators.relational import baskets  # noqa: E402
from data_mining_map_reduce_spark.operators.similarity import minhash_lsh_pairs  # noqa: E402

b = baskets(
    _customer_part_pairs(spark, sf).select("k", F.col("i").cast("string").alias("i")),
    "k",
    "i",
)
t0 = time.perf_counter()
n = minhash_lsh_pairs(
    b, "k", "items", threshold=0.05, num_hashes=32, bands=32
).count()  # default max_bucket=5000 — the scale path
print(f"capped(5000) @ {sf}: rows={n} [{time.perf_counter() - t0:.1f}s]")
spark.stop()
