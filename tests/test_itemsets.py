"""SON correctness: SON == FPGrowth == DuckDB brute force (pairs) at
sf0.001, mirroring A2's two-case grading (SURVEY §5)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.itemsets import (
    fpgrowth_frequent_itemsets,
    son_frequent_itemsets,
)
from data_mining_map_reduce_spark.operators.relational import baskets
from data_mining_map_reduce_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def order_baskets(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    return baskets(
        li.select("l_orderkey", F.col("l_partkey").cast("string").alias("i")),
        "l_orderkey",
        "i",
    )


def test_son_equals_fpgrowth(spark):
    b = order_baskets(spark).cache()
    son = {(r.itemset, r.support) for r in son_frequent_itemsets(b, support=3).collect()}
    fp = {(r.itemset, r.support) for r in fpgrowth_frequent_itemsets(b, support=3).collect()}
    assert son == fp
    assert len(son) > 0


def test_son_pairs_match_bruteforce(spark):
    b = order_baskets(spark)
    son = {
        (r.itemset, r.support)
        for r in son_frequent_itemsets(b, support=3).collect()
        if "," in r.itemset and r.itemset.count(",") == 1
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey p
                    FROM read_parquet('{SF_DIR}/lineitem.parquet'))
        SELECT a.p p1, b.p p2, COUNT(*) c
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
        """
    ).fetchall()
    brute = set()
    for p1, p2, c in rows:
        pair = sorted([str(p1), str(p2)])  # string sort = engine's item order
        brute.add((",".join(pair), c))
    assert son == brute
