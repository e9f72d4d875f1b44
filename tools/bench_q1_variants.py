"""Micro-bench: q1 exact-cents aggregate variants at sf0.1.

Variant A (current): single groupBy, per-row decimal(38,0) sums.
Variant B (two-level): partial long sums per (keys, partition_id),
widen to decimal(38,0) only at the tiny final merge.
Variant C (pure long, overflow-unsafe at 100TB — measurement floor).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflow_spark import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cents(col):
    return (F.col(col) * 100 + F.lit(0.5)).cast("long")


def variant_a(li):
    d = "decimal(38,0)"
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_cents("l_quantity").cast(d)).alias("_sq"),
                 F.sum(_cents("l_extendedprice").cast(d)).alias("_sp"),
                 F.sum((_cents("l_extendedprice")
                        * (100 - _cents("l_discount"))).cast(d)).alias("_s4"),
                 F.sum(_cents("l_discount").cast(d)).alias("_sd"),
                 F.count(F.lit(1)).alias("count_order")))


def variant_b(li):
    d = "decimal(38,0)"
    part = (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus",
                     F.spark_partition_id().alias("_pid"))
            .agg(F.sum(_cents("l_quantity")).alias("_sq"),
                 F.sum(_cents("l_extendedprice")).alias("_sp"),
                 F.sum(_cents("l_extendedprice")
                       * (100 - _cents("l_discount"))).alias("_s4"),
                 F.sum(_cents("l_discount")).alias("_sd"),
                 F.count(F.lit(1)).alias("count_order")))
    return (part.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("_sq").cast(d)).alias("_sq"),
                 F.sum(F.col("_sp").cast(d)).alias("_sp"),
                 F.sum(F.col("_s4").cast(d)).alias("_s4"),
                 F.sum(F.col("_sd").cast(d)).alias("_sd"),
                 F.sum("count_order").alias("count_order")))


def variant_c(li):
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_cents("l_quantity")).alias("_sq"),
                 F.sum(_cents("l_extendedprice")).alias("_sp"),
                 F.sum(_cents("l_extendedprice")
                       * (100 - _cents("l_discount"))).alias("_s4"),
                 F.sum(_cents("l_discount")).alias("_sd"),
                 F.count(F.lit(1)).alias("count_order")))


def variant_d(li):
    """Split exact sums (r7's q1 form): hi/lo halves as plain longs in
    one aggregate, recombined in decimal over the output rows."""
    d = "decimal(38,0)"
    S = 1 << 16
    cq = "cast(l_quantity * 100 + 0.5 as bigint)"
    cp = "cast(l_extendedprice * 100 + 0.5 as bigint)"
    cd = "cast(l_discount * 100 + 0.5 as bigint)"
    c4 = f"{cp} * (100 - {cd})"
    exprs = []
    for sql, name in [(cq, "_sq"), (cp, "_sp"), (c4, "_s4"), (cd, "_sd")]:
        exprs += [f"sum(({sql}) div {S}) AS {name}_hi",
                  f"sum(({sql}) % {S}) AS {name}_lo"]
    exprs.append("count(1) AS count_order")
    part = (li.where("l_shipdate <= '1998-09-02'")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(*[F.expr(e) for e in exprs]))
    rec = {n: f"(cast({n}_hi as {d}) * {S} + cast({n}_lo as {d}))"
           for n in ("_sq", "_sp", "_s4", "_sd")}
    return part.selectExpr(
        "l_returnflag", "l_linestatus",
        *[f"{e} AS {n}" for n, e in rec.items()], "count_order")


def main():
    spark = get_spark("bench_q1_variants", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    li.count()  # warm

    for name, fn in [("A_decimal", variant_a), ("B_twolevel", variant_b),
                     ("C_purelong", variant_c)]:
        df = fn(li)
        df.write.format("noop").mode("overwrite").save()  # warm codegen
        ts = []
        for _ in range(5):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{name}: median={ts[2]:.3f} all={[round(t,3) for t in ts]}")

    # value parity A vs B
    a = {tuple(r[:2]): r[2:] for r in variant_a(li).collect()}
    b = {tuple(r[:2]): r[2:] for r in variant_b(li).collect()}
    assert a == b, f"A!=B\n{a}\n{b}"
    print("A == B values: OK")
    spark.stop()


if __name__ == "__main__":
    main()
