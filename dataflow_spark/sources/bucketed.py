"""Bucketed-table helpers: co-located joins without a per-query shuffle.

Spark's native datasource bucketing (no Hive needed): writing with
``bucketBy(n, key)`` pre-hash-partitions the table into ``n`` buckets on
disk; a join or aggregation on the bucket key then reads both sides
already co-partitioned, so Catalyst drops the Exchange entirely. On a
100 TB corpus where the same join key is hit repeatedly (doc_id,
orderkey, user_id), paying one bucketed write amortizes every
subsequent shuffle away.

Contract notes (Spark semantics, not ours):
  - both join sides must be bucketed on the join key with the same
    bucket count (or a divisor) for the shuffle-free plan;
  - ``sortBy`` on the same key additionally removes the Sort for
    sort-merge joins;
  - bucket pruning applies equality filters on the bucket key to skip
    whole buckets at scan time.

Usage:
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", buckets=64)
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=64)
    joined = read_bucketed(spark, "lineitem_b").join(
        read_bucketed(spark, "orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # .explain(): SortMergeJoin with NO Exchange on either side
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite", format: str = "parquet",
                   path: str | None = None) -> None:
    """Save ``df`` as a bucketed table (managed, or external when ``path``
    is given — bucket metadata lives in the catalog either way).

    ``key`` may be one column or several (hash over the tuple). With
    ``sort=True`` rows are sorted by the key inside each bucket so
    sort-merge joins skip their Sort too.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format(format).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog;
    a plain ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table)
