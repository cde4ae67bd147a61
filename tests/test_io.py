"""IO layer round-trips (SURVEY §2.1 S1-S3, S7-S9): write a known
query result with each sink, read it back with the pinned-schema
readers, assert exact equality. Determinism comes from explicit
orderBy at write + re-sort at compare."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_mining_map_reduce_spark.queries import SPARK_QUERIES
from data_mining_map_reduce_spark.sources.readers import (
    read_chunked_dir,
    read_csv,
    read_json_lines,
    read_parquet,
)
from data_mining_map_reduce_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("avg_price", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _flagship(spark, sf_dir):
    return SPARK_QUERIES["flagship_category_avg"](spark, sf_dir)


def _rows(df):
    return sorted(map(tuple, df.select("category", "avg_price", "n").collect()))


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    df = _flagship(spark, sf_dir)
    path = str(tmp_path / "out_parquet")
    write_parquet(df, path)
    assert _rows(read_parquet(spark, path)) == _rows(df)


def test_parquet_partitioned_write(spark, sf_dir, tmp_path):
    df = _flagship(spark, sf_dir)
    path = str(tmp_path / "out_parquet_part")
    write_parquet(df, path, partition_by=["category"])
    back = read_parquet(spark, path)
    # partition column comes back (string) — values preserved
    assert sorted(r.category for r in back.collect()) == sorted(
        r.category for r in df.collect()
    )


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    df = _flagship(spark, sf_dir)
    path = str(tmp_path / "out_json")
    write_json(df, path, order_by=["category"], single_file=True)
    back = read_json_lines(spark, path, RESULT_SCHEMA)
    assert _rows(back) == _rows(df)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = _flagship(spark, sf_dir)
    path = str(tmp_path / "out_csv")
    write_csv(df, path, order_by=["category"], single_file=True)
    back = read_csv(spark, path, schema=RESULT_SCHEMA, header=True)
    assert _rows(back) == _rows(df)


def test_headerless_csv_requires_schema(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_csv(spark, str(tmp_path / "x"), schema=None, header=False)


def test_chunked_dir_roundtrip(spark, sf_dir, tmp_path):
    df = _flagship(spark, sf_dir)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"chunk_{i}")
        write_parquet(df, p)
        paths.append(p)
    chunks = read_chunked_dir(spark, paths, fmt="parquet")
    assert len(chunks) == 3
    assert sum(c.count() for c in chunks) == 3 * df.count()
