"""Regenerate the linear-family sf100 replica (r6 layout): documents,
events, embeddings at x1000 the sf0.1 source, with the remaining
tables symlinked from the sf1 replica for view registration.

The full sf100 generation (600M-row lineitem) was shown in r6 to spill
past free disk in a single exploded plan; the r7 relational family used
the streamed generator separately. This tool reproduces ONLY the
linear-family layout the doc/event sweeps need: documents and
embeddings replicate in one bounded plan (5M / 2M rows), events go
through generate_fact_streamed (100M rows, append batches, no global
shuffle).

Usage: python tools/make_sf100_linear.py [--src /root/testdata/sf0.1]
           [--out .bench_data/sf100] [--sf1 .bench_data/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_scaled_data import (SHIFT_COLS, STRIDE, _OUT_FILES,
                                    generate_fact_streamed)  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".bench_data/sf100")
    ap.add_argument("--sf1", default=".bench_data/sf1")
    ap.add_argument("--factor", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_spark import get_spark

    spark = get_spark("make-sf100-linear")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for table in ("documents", "embeddings"):
        df = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(args.factor - 1))))
        for c in SHIFT_COLS[table]:
            rep = rep.withColumn(
                c, F.col(c).cast("long")
                + F.col("_r").cast("long") * F.lit(STRIDE).cast("long"))
        if table == "documents":
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" #r"),
                             F.col("_r").cast("string"))))
        rep.drop("_r").repartition(_OUT_FILES).write.mode(
            "overwrite").parquet(os.path.join(args.out, f"{table}.parquet"))
        print(f"wrote {table} x{args.factor}")

    generate_fact_streamed(spark, args.src, args.out, "events",
                           args.factor, batch_replicas=100)
    print("wrote events (streamed)")

    sf1_abs = os.path.abspath(args.sf1)
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
        dst = os.path.join(args.out, f"{table}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            continue
        os.symlink(os.path.join(sf1_abs, f"{table}.parquet"), dst)
    print("symlinked relational tables from", sf1_abs)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
