"""Table sinks: partitioned parquet layout and bucketed tables.

The 100 TB layout story:

- **Partition by low-cardinality pruning columns** (date, event_type):
  a filtered read then touches only matching directories — dynamic
  partition pruning extends this through joins.
- **Bucket by high-cardinality JOIN keys**: two tables bucketed on the
  same key with the same bucket count join WITHOUT a shuffle — the
  exchange disappears from the plan (asserted in
  tests/test_tables.py), which at fact-fact scale is the single
  biggest cost removed. Bucketing metadata lives in the session
  catalog (in-memory here; a metastore in production).
- **Sort within buckets** by the join/scan key to enable merge-join
  without a sort node and better row-group statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> str:
    """Directory-partitioned parquet (hive layout: ``col=value/``)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed (and optionally sorted) managed table. Reading it back
    via ``spark.table`` carries the bucket spec, so equi-joins and
    aggregations on the bucket key skip their exchange."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
    return table


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
