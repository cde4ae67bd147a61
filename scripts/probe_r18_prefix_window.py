#!/usr/bin/env python
"""r18 VERDICT task 7 receipt: window vs sort-free prefix construction
for the exact-Jaccard prefix filter, at sf1 (where the per-key sort
shuffle actually grows; sf0.1 measured neutral in r17).

Form A (shipped): row_number() over (partitionBy key, orderBy df, i)
— a full partition sort per window exchange.
Form B (sort-free): groupBy(key) -> sort_array(collect_list(struct
(df, i))) -> posexplode of the prefix slice — same shuffle key, but
the ordering work happens per-ROW-GROUP as small in-task array sorts.
(df, i) is unique per key, so both orders are identical and the
emitted (key, item, size, rank) rows match exactly (asserted).

Both forms are timed through the FULL candidate+verify pipeline tail
(the prefix feeds a self-join whose cost dwarfs ranking — timing only
the prefix stage would overweight the change).

Usage: python scripts/probe_r18_prefix_window.py [sf_dir] [threshold]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from data_mining_map_reduce_spark.operators.dedup import doc_shingle_pairs
    from data_mining_map_reduce_spark.session import get_spark
    from data_mining_map_reduce_spark.sources.catalog import load_table

    spark = get_spark(app_name="prefix_window_probe")
    docs = load_table(spark, sf_dir, "documents")
    df_in = doc_shingle_pairs(docs)

    base = (
        df_in.select(F.col("doc_id").alias("_k"), F.xxhash64("shingle").alias("_i"))
        .distinct()
        .cache()
    )
    sizes = base.groupBy("_k").agg(F.count(F.lit(1)).alias("_sz"))
    dfreq = base.groupBy("_i").agg(F.count(F.lit(1)).alias("_df"))
    prefix_len = F.col("_sz") - F.ceil(
        F.round(F.lit(threshold) * F.col("_sz"), 6)
    ) + 1

    # Form A — the shipped window construction
    rarity = Window.partitionBy("_k").orderBy("_df", "_i")
    prefix_a = (
        base.join(dfreq, "_i")
        .withColumn("_rn", F.row_number().over(rarity))
        .join(sizes, "_k")
        .where(F.col("_rn") <= prefix_len)
        .select("_k", "_i", "_sz", "_rn")
    )

    # Form B — sort-free: per-key array sort + posexplode of the slice
    plen_of = lambda sz: sz - F.ceil(F.round(F.lit(threshold) * sz, 6)) + 1
    grouped = (
        base.join(dfreq, "_i")
        .groupBy("_k")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("_i")))
            ).alias("_ord"),
            F.count(F.lit(1)).alias("_sz"),
        )
    )
    prefix_b = (
        grouped.select(
            "_k",
            "_sz",
            F.posexplode(
                F.slice("_ord", 1, plen_of(F.col("_sz")).cast("int"))
            ).alias("_pos", "_s"),
        )
        .select(
            "_k", F.col("_s._i").alias("_i"), "_sz",
            (F.col("_pos") + 1).alias("_rn"),
        )
    )

    def tail(prefix):
        """the collision + positional-filter + verify pipeline from
        exact_jaccard_pairs, verbatim"""
        prefix = prefix.localCheckpoint(eager=False)
        collisions = (
            prefix.select(
                F.col("_k").alias("a"), "_i", F.col("_sz").alias("_sza"),
                F.col("_rn").alias("_rna"),
            )
            .join(
                prefix.select(
                    F.col("_k").alias("b"), "_i", F.col("_sz").alias("_szb"),
                    F.col("_rn").alias("_rnb"),
                ),
                "_i",
            )
            .where(
                (F.col("a") < F.col("b"))
                & (F.col("_sza") >= F.round(F.lit(threshold) * F.col("_szb"), 6))
                & (F.col("_szb") >= F.round(F.lit(threshold) * F.col("_sza"), 6))
            )
        )
        required = F.round(
            F.lit(threshold / (1.0 + threshold)) * (F.col("_sza") + F.col("_szb")), 6
        )
        candidates = (
            collisions.groupBy("a", "b")
            .agg(
                F.min("_rna").alias("_ia"), F.min("_rnb").alias("_jb"),
                F.first("_sza").alias("_sza"), F.first("_szb").alias("_szb"),
            )
            .where(
                (F.lit(1) + F.least(F.col("_sza") - F.col("_ia"),
                                    F.col("_szb") - F.col("_jb"))) >= required
            )
            .select("a", "b")
        )
        sets = (
            base.groupBy("_k")
            .agg(F.sort_array(F.collect_list("_i")).alias("_set"))
            .localCheckpoint(eager=False)
        )
        inter = F.size(F.array_intersect("_ia", "_ib"))
        scored = (
            candidates.join(sets.select(F.col("_k").alias("a"), F.col("_set").alias("_ia")), "a")
            .join(sets.select(F.col("_k").alias("b"), F.col("_set").alias("_ib")), "b")
            .select("a", "b", inter.alias("_inter"),
                    (F.size("_ia") + F.size("_ib")).alias("_tot"))
        )
        return (
            scored.withColumn(
                "jaccard",
                F.col("_inter").cast("double")
                / (F.col("_tot") - F.col("_inter")).cast("double"),
            )
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        )

    base.count()  # populate cache outside the timed region

    results = {}
    walls = {}
    for rep in range(2):
        for label, pfx in (("window", prefix_a), ("sortfree", prefix_b)):
            spark.sparkContext.setJobDescription(f"prefix:{label}")
            t0 = time.perf_counter()
            out = tail(pfx)
            out.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            walls.setdefault(label, []).append(w)
            print(f"rep={rep} {label}: {w:.2f}s", flush=True)
            if rep == 0:
                results[label] = {tuple(r) for r in out.collect()}
    print(f"identical={results['window'] == results['sortfree']} "
          f"n={len(results['window'])}")
    print({k: round(min(v), 2) for k, v in walls.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
