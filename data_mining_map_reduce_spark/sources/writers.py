"""Sinks (SURVEY.md §2.1 S7-S9) with deterministic ordering.

The reference writes driver-side with ``json.dumps`` / csv module
(Assignment1/task1.py:67-68, Assignment3/task1.py:110-113,
Assignment2/task1.py:179-183). The engine writes distributed
(``df.write``); determinism comes from an explicit ``orderBy`` +
``coalesce(1)`` only when a single ordered file is demanded —
otherwise parallel part-files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Column


def write_json(df: DataFrame, path: str, order_by: list[str | Column] | None = None,
               single_file: bool = False, mode: str = "overwrite") -> None:
    """S7/S8: line-delimited JSON sink."""
    if order_by:
        df = df.orderBy(*order_by)
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, order_by: list[str | Column] | None = None,
              single_file: bool = False, mode: str = "overwrite",
              header: bool = True) -> None:
    """S9: text/CSV report sink."""
    if order_by:
        df = df.orderBy(*order_by)
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Columnar sink — the default for anything that feeds another
    query. ``partition_by`` gives downstream partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed-table sink — the shuffle-amortizing layout.

    Bucketing hash-partitions rows into ``num_buckets`` files per
    partition ON WRITE; two tables bucketed the same way on the same
    key then equi-join WITHOUT a shuffle (Catalyst plans a
    bucket-local sort-merge join), and aggregations on the bucket key
    skip the exchange. At 100 TB that converts every repeated
    fact-to-fact join on the bucket key from a full-network shuffle
    into a local merge — the single biggest lever a warehouse layout
    has. ``sort_by`` pre-sorts within buckets so the merge phase skips
    its sort too. Bucketing requires ``saveAsTable`` (metastore
    bookkeeping); plain path-writes can't express it.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """Columnar ORC sink (Spark-native) — parquet's interchange twin
    for warehouses standardized on ORC; same pruning/pushdown story."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
