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


def test_fractional_support_mode_matches_oracle(spark):
    """r13 verdict task 6: fractional support ("num/den") must derive
    the SAME absolute threshold in both engines via integer-exact
    ceil — the Spark side from a distinct-basket count, the oracle
    from a COUNT subquery with DuckDB integer `//` — so a scale probe
    needs no manually-sized absolute. At sf0.001 (1473 baskets),
    1/750 -> ceil(1473/750) = 2."""
    from data_mining_map_reduce_spark.queries import (
        _itemset_oracle,
        _order_baskets,
        _son_support,
        _son_support_sql,
    )
    from data_mining_map_reduce_spark.operators.itemsets import (
        son_frequent_itemsets,
    )

    sup = _son_support(spark, SF_DIR, frac="1/750")
    assert sup == 2
    b = _order_baskets(spark, SF_DIR)
    got = {
        (r.itemset, r.support)
        for r in son_frequent_itemsets(b, support=sup, max_size=3).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = {
        (r[0], r[1])
        for r in con.execute(
            _itemset_oracle(_son_support_sql(frac="1/750"))
        ).fetchall()
    }
    assert got == want and len(got) > 0
