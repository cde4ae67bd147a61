"""Named query registry: the driver contract surface.

Each entry pairs a Spark DataFrame query (spark, sf_dir) -> DataFrame
with (where SQL-expressible) an ANSI-SQL oracle that DuckDB runs over
the same parquet tables. Column names AND value representations are
kept identical on both sides:

- every aggregate/computed column is aliased the same in both;
- double-valued outputs are rounded (4-6 decimals) on BOTH sides so
  summation-order float noise can't break the value hash;
- year()/count() outputs are cast to fixed widths where the two
  engines' natural types differ.

Queries map 1:1 to SURVEY.md §2 operator rows (noted per entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.text import STOPWORDS, normalize, tokenize
from .operators import relational as R
from .sources.catalog import load_table

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7 phase 0): scan + broadcast join + explode + agg
# + sort + limit in one query — the A1-task2 shape (reference
# Assignment1/task2.py:26-43) on testdata.
# ---------------------------------------------------------------------------
@query(
    "flagship_category_avg",
    """
    SELECT category,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(p.p_type, ' ')) AS category,
               l.l_extendedprice
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    GROUP BY category
    ORDER BY avg_price DESC, category ASC
    LIMIT 10
    """,
)
def flagship_category_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg extended price per part-type token, top-10.

    Part is a dimension → broadcast join (no shuffle of lineitem);
    explode of the split tokens stays in codegen; TakeOrderedAndProject
    caps the sort at k rows per partition.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            F.explode(F.split("p_type", " ")).alias("category"),
            "l_extendedprice",
        )
        .groupBy("category")
        .agg(
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("avg_price").desc(), F.col("category").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A1: global count (reference Assignment1/task1.py:22)
# ---------------------------------------------------------------------------
@query("count_global", "SELECT COUNT(*) AS n FROM lineitem")
def count_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.count_rows(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# A2+F3: count per extracted year (reference Assignment1/task1.py:18,25)
# ---------------------------------------------------------------------------
@query(
    "count_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n
    FROM orders GROUP BY yr ORDER BY yr
    """,
)
def count_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        R.count_by(orders.select(F.year("o_orderdate").alias("yr")), "yr")
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# A3: exact distinct count (reference Assignment1/task1.py:29)
# ---------------------------------------------------------------------------
@query("distinct_users", "SELECT COUNT(DISTINCT o_custkey) AS n_users FROM orders")
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.distinct_count(
        load_table(spark, sf_dir, "orders"), "o_custkey", alias="n_users"
    )


# ---------------------------------------------------------------------------
# O1+O3: top-k by count, ties key-ascending (reference
# Assignment1/task1.py:32; tie rule A1 PDF §4.1.3)
# ---------------------------------------------------------------------------
@query(
    "top_users_by_orders",
    """
    SELECT o_custkey, COUNT(*) AS n
    FROM orders GROUP BY o_custkey
    ORDER BY n DESC, o_custkey ASC LIMIT 10
    """,
)
def top_users_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_k_by_count(load_table(spark, sf_dir, "orders"), "o_custkey", 10)


# ---------------------------------------------------------------------------
# A4: algebraic average per key (reference Assignment1/task2.py:37-43)
# ---------------------------------------------------------------------------
@query(
    "avg_price_by_priority",
    """
    SELECT o_orderpriority, ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def avg_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A7+F1+F4: word count with normalization + stopword filter
# (reference Assignment1/task1.py:40-53)
# ---------------------------------------------------------------------------
@query(
    "word_count_top20",
    f"""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(translate(lower(text), '([,.!?:;])', ''), ' ')) AS word
        FROM documents
    )
    WHERE word <> '' AND word NOT IN {_STOPWORDS_SQL}
    GROUP BY word
    ORDER BY n DESC, word ASC LIMIT 20
    """,
)
def word_count_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        R.word_count(docs, "text", stopwords=STOPWORDS)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J1+P3: left outer join + null filter (reference Assignment1/task2.py:34)
# ---------------------------------------------------------------------------
@query(
    "join_filter_brand_counts",
    """
    SELECT p.p_brand, COUNT(*) AS n,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type IS NOT NULL
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def join_filter_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(
            F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left"
        )
        .where(F.col("p_type").isNotNull())
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# A5: basket build — key → sorted distinct item list, serialized to a
# string so hashing is representation-stable (reference
# Assignment2/task1.py:28-35)
# ---------------------------------------------------------------------------
@query(
    "baskets_by_customer",
    """
    SELECT o.o_custkey,
           array_to_string(list_sort(list(DISTINCT CAST(l.l_partkey AS VARCHAR))), ',') AS items,
           COUNT(DISTINCT l.l_partkey) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_custkey
    ORDER BY o.o_custkey
    """,
)
def baskets_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set(F.col("l_partkey").cast("string")))
            ).alias("items"),
            F.countDistinct("l_partkey").alias("n_items"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# J3+J6: co-occurrence theta-join as equi-join + HAVING (reference's
# O(V^2) driver loop, Assignment4/task1.py:32-47, made distributed)
# ---------------------------------------------------------------------------
@query(
    "cooccurrence_pairs",
    """
    WITH base AS (
        SELECT DISTINCT o.o_custkey AS k, l.l_partkey AS i
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT a.k AS u1, b.k AS u2, COUNT(*) AS n_shared
    FROM base a JOIN base b ON a.i = b.i AND a.k < b.k
    GROUP BY u1, u2
    HAVING COUNT(*) >= 3
    ORDER BY u1, u2
    """,
)
def cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("k"), F.col("l_partkey").alias("i")
    )
    return (
        R.co_occurrence_pairs(pairs, "k", "i", min_shared=3, left_alias="u1", right_alias="u2")
        .orderBy("u1", "u2")
    )


# ---------------------------------------------------------------------------
# §2.5/A14: tie-aware top-k per group via dense_rank (reference
# Assignment6/task3.py:86-97 keeps all ties)
# ---------------------------------------------------------------------------
@query(
    "top_customers_per_segment",
    """
    SELECT c_mktsegment, c_custkey, total, rnk
    FROM (
        SELECT c.c_mktsegment, c.c_custkey,
               ROUND(SUM(o.o_totalprice), 2) AS total,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY ROUND(SUM(o.o_totalprice), 2) DESC
               ) AS INTEGER) AS rnk
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    )
    WHERE rnk <= 3
    ORDER BY c_mktsegment, rnk, c_custkey
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    totals = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("total").desc())
    return (
        totals.withColumn("rnk", F.dense_rank().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "total", "rnk")
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    )


# ---------------------------------------------------------------------------
# §2.7: relational INTERSECT (free in the engine; absent in reference)
# ---------------------------------------------------------------------------
@query(
    "customers_in_both_statuses",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def customers_in_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# A15 (CF building block): Pearson correlation per group
# ---------------------------------------------------------------------------
@query(
    "corr_qty_price_by_flag",
    """
    SELECT l_returnflag, ROUND(corr(l_quantity, l_extendedprice), 6) AS r
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def corr_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# F5+F3+F15: scalar function showcase — JSON extraction, year,
# formatted timestamp (reference Assignment6/task2.py:44-46 JSON pluck;
# Assignment1/task1.py:18 year slice)
# ---------------------------------------------------------------------------
@query(
    "event_props_extract",
    """
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS yr,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE event_type = 'click'
    ORDER BY event_id
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("event_type") == "click")
        .select(
            "event_id",
            F.year("ts").alias("yr"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
        .orderBy("event_id")
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
