"""Bucketed-table co-located joins: write once, join shuffle-free."""

import pytest

from pyspark.sql import functions as F

from dataflow_spark.sources import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=4,
                   path=str(base / "orders_b"))
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", buckets=4,
                   path=str(base / "lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # force the sort-merge path so the Exchange check is meaningful
    # (a broadcast join would hide the shuffle question entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = read_bucketed(spark, "lineitem_b").join(
            read_bucketed(spark, "orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    got = read_bucketed(spark, "lineitem_b").join(
        read_bucketed(spark, "orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert got == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = read_bucketed(spark, "lineitem_b").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
