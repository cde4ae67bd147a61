"""Replicates the driver's correctness gate locally: every
``queries()`` entry that has an ``oracle_sql()`` twin is executed on
Spark AND DuckDB at sf0.001 and compared on row count, column names,
and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_mining_map_reduce_spark.queries import ORACLES, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if hasattr(value, "isoformat"):  # datetime/date
        return value.isoformat()
    if isinstance(value, list):
        return tuple(canon(v) for v in value)
    return value


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    spark_df = SPARK_QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_conn()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_canon(spark_cols, spark_rows)
    d = rows_canon(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(SPARK_QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [c for c in df.columns] == ["category", "avg_price", "n"]


def test_dictionary_encode_paths_agree(spark, sf_dir):
    """Window path and range-partitioned zipWithIndex path must emit
    identical (value, id) dictionaries."""
    from data_mining_map_reduce_spark.operators.encoding import (
        dictionary_encode,
        dictionary_encode_big,
    )
    from data_mining_map_reduce_spark.sources.catalog import load_table

    part = load_table(spark, sf_dir, "part")
    small = sorted(map(tuple, dictionary_encode(part, "p_brand", "id").collect()))
    big = sorted(map(tuple, dictionary_encode_big(part, "p_brand", "id").collect()))
    assert small == big
