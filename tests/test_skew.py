"""Salted aggregation / join equivalence with plain Spark results."""

from pyspark.sql import functions as F

from dataflow_spark.functions.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        tuple(r[:1]): r[1:]
        for r in li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.min("l_discount").alias("dmin"),
            F.max("l_discount").alias("dmax"),
        ).collect()
    }
    salted = {
        tuple(r[:1]): r[1:]
        for r in salted_agg(
            li.select("l_returnflag", "l_quantity", "l_discount"),
            ["l_returnflag"],
            {"n": ("count", None), "qty": ("sum", "l_quantity"),
             "dmin": ("min", "l_discount"), "dmax": ("max", "l_discount")},
            n_salts=7,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.range(1)
    try:
        salted_agg(df, ["id"], {"m": ("median", "id")})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "median" in str(e)


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    plain = sorted(map(tuple, orders.join(cust, ["o_custkey"]).collect()))
    salted = sorted(map(tuple, salted_join(orders, cust, ["o_custkey"],
                                           n_salts=5).collect()))
    assert plain == salted


def test_zorder_key_scales_bits_down_keeps_msbs(spark):
    """4 columns at bits=16 would reach bit 63 (the long sign bit);
    zorder_key must scale to 15 bits/column keeping each value's MOST
    significant bits, and every key must stay non-negative."""
    from pyspark.sql import functions as F

    from dataflow_spark.functions.vector import zorder_key

    df = spark.createDataFrame(
        [(65535, 65535, 65535, 65535), (0, 0, 0, 0),
         (65535, 0, 65535, 0), (32768, 32768, 0, 0)],
        ["a", "b", "c", "d"])
    cols = [F.col(c) for c in ["a", "b", "c", "d"]]
    out = [r["z"] for r in df.select(
        zorder_key(cols, bits=16).alias("z")).collect()]
    assert all(z >= 0 for z in out)
    assert max(out) < (1 << 60)  # 4 cols x 15 bits
    # max input must still produce the max key (MSBs kept, not dropped)
    assert out[0] == (1 << 60) - 1
    assert out[1] == 0


def test_zorder_key_rejects_too_many_columns(spark):
    from pyspark.sql import functions as F

    from dataflow_spark.functions.vector import zorder_key

    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.lit(1)] * 64, bits=16)
