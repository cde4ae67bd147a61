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


def test_cc_pointer_jump_sql_path_graph():
    """The pointer-jumping CC oracle (r10 verdict task 4) must be
    EXACT, not approximately converged: a 3000-vertex path is the
    worst case for min-label propagation (diameter = n), so it proves
    the shortcut step delivers the claimed exponential reach within
    the fixed 20 rounds."""
    import duckdb

    from data_mining_map_reduce_spark.queries import _cc_pointer_jump_ctes

    con = duckdb.connect()
    n = 3000
    con.execute(
        "CREATE TABLE e AS SELECT i AS src, i + 1 AS dst "
        f"FROM range(1, {n}) t(i)"
    )
    sql = f"""
    WITH undirected AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    {_cc_pointer_jump_ctes()}
    SELECT MIN(component), MAX(component), COUNT(*) FROM comp
    """
    lo, hi, cnt = con.execute(sql).fetchone()
    assert (lo, hi, cnt) == (1, 1, n)


def test_cc_pointer_jump_sql_union_find_parity():
    """Random-graph parity against a reference union-find: every
    vertex must map to the exact min id of its component."""
    import random

    import duckdb

    from data_mining_map_reduce_spark.queries import _cc_pointer_jump_ctes

    rng = random.Random(11)
    n, m = 400, 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {
        v: find(v)
        for v in set(x for e in edges for x in e)
        if any(v in e and e[0] != e[1] for e in edges)
    }
    # min-label canonicalization: map each root to the min member
    comp_min: dict[int, int] = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[r] for v, r in expected.items()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = f"""
    WITH undirected AS (
        SELECT src, dst FROM e WHERE src <> dst
        UNION ALL
        SELECT dst, src FROM e WHERE src <> dst
    ),
    {_cc_pointer_jump_ctes()}
    SELECT id, component FROM comp
    """
    got = dict(con.execute(sql).fetchall())
    assert got == expected
