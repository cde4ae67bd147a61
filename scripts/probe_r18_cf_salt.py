#!/usr/bin/env python
"""r18 VERDICT task 3 receipt: salted (two-level) vs direct pair
aggregation for the CF co-rating self-join, at sf1.

The direct plan already does map-side partial aggregation before the
wide exchange (plans/r18/cf_item_similarities_before.txt nodes 27-28),
so reduce-side rows per (i1, i2) key are bounded by the map-partition
count; a salt level can only help if a single reduce TASK is
overloaded, and it costs a whole extra exchange of the suffstat rows.
This probe measures both forms end-to-end (noop sink) and records the
max/median task skew of the pair-aggregation stage from the Spark
status API. Sums are integer-exact and associative, so the two forms
are value-identical (asserted here on the full output).

Usage: python scripts/probe_r18_cf_salt.py [sf_dir] [salts]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    n_salt = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from data_mining_map_reduce_spark.operators.recommend import (
        _pearson_sim,
        _pearson_suffstat_aggs,
    )
    from data_mining_map_reduce_spark.queries import _ratings
    from data_mining_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="cf_salt_probe")
    ratings = _ratings(spark, sf_dir).cache()
    from data_mining_map_reduce_spark.operators.recommend import _micros

    a = ratings.select(
        F.col("u").alias("_u"), F.col("i").alias("i1"), _micros("rating").alias("_xa6")
    )
    b = ratings.select(
        F.col("u").alias("_u"), F.col("i").alias("i2"), _micros("rating").alias("_xb6")
    )
    joined = a.join(b, "_u").where(F.col("i1") < F.col("i2"))

    def finish(agg):
        return (
            agg.withColumn("_c", _pearson_sim())
            .where((F.col("n_co") >= 3) & F.col("_c").isNotNull())
            .select("i1", "i2", F.col("_c").alias("sim"), "n_co")
        )

    direct = finish(joined.groupBy("i1", "i2").agg(*_pearson_suffstat_aggs()))

    # two-level: aggregate by (i1, i2, salt) then merge — every
    # suffstat is an associative sum/min/max/count, so the merged
    # totals are bit-identical longs
    lvl1 = joined.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("_u")), F.lit(n_salt)).cast("int")
    ).groupBy("i1", "i2", "_salt").agg(*_pearson_suffstat_aggs())
    merged = lvl1.groupBy("i1", "i2").agg(
        F.sum("n_co").alias("n_co"),
        F.sum("_sx").alias("_sx"),
        F.sum("_sy").alias("_sy"),
        F.sum("_sxy_hi").alias("_sxy_hi"),
        F.sum("_sxy_lo").alias("_sxy_lo"),
        F.sum("_sxx_hi").alias("_sxx_hi"),
        F.sum("_sxx_lo").alias("_sxx_lo"),
        F.sum("_syy_hi").alias("_syy_hi"),
        F.sum("_syy_lo").alias("_syy_lo"),
        F.min("_mna").alias("_mna"),
        F.max("_mxa").alias("_mxa"),
        F.min("_mnb").alias("_mnb"),
        F.max("_mxb").alias("_mxb"),
    )
    salted = finish(merged)

    ratings.count()  # populate the cache outside the timed region

    def timed(df, label):
        spark.sparkContext.setJobDescription(f"cf_salt:{label}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        print(f"{label}: {w:.2f}s", flush=True)
        return w

    out = {}
    for rep in range(2):
        for label, df in (("direct", direct), ("salted", salted)):
            out.setdefault(label, []).append(timed(df, label))

    # value identity (order-insensitive)
    d = {(r.i1, r.i2): (r.sim, r.n_co) for r in direct.collect()}
    s = {(r.i1, r.i2): (r.sim, r.n_co) for r in salted.collect()}
    print(f"pairs: direct={len(d)} salted={len(s)} identical={d == s}")
    print({k: min(v) for k, v in out.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
