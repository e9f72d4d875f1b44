"""Generate scaled benchmark data by replicating an sf directory with
id-remapping (default 10x sf0.1 -> .bench_data/sf1).

Referential integrity is preserved: every key column is shifted by
replica * STRIDE, with foreign keys shifted by the same stride as the
table they reference. Document text gets a per-replica suffix so the
replicas are NEAR-duplicates (realistic dedup stress: MinHash still
clusters them, exact-hash does not).

Usage: python tools/make_scaled_data.py [--factor 10]
       [--src /root/testdata/sf0.1] [--out .bench_data/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 100_000_000

# table -> columns shifted by replica*STRIDE (keys + their foreign keys)
SHIFT_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


# single-file single-row-group parquet makes every scan ONE task (a
# row group is the minimum split unit — maxPartitionBytes cannot split
# inside it), serializing scans and Python UDF work and poisoning the
# scale-check ratios. Write fact tables across enough files that a
# local[32] scan parallelizes; this also mirrors how a real writer
# must lay out files at 100 TB.
_OUT_FILES = 32


def generate(spark, src: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for table, shift_cols in SHIFT_COLS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        if not shift_cols:  # pure dimension: copy once
            df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
            continue
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        for c in shift_cols:
            # long arithmetic: replica * STRIDE overflows int32 past
            # factor 21 (ANSI throws), and int key columns overflow
            # once shifted — widen both sides first
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
            "overwrite").parquet(os.path.join(out, f"{table}.parquet"))


def ensure_scaled_data(spark, src: str = "/root/testdata/sf0.1",
                       out: str | None = None, factor: int = 10) -> str:
    """Generate once, reuse across runs (marker file gates)."""
    if out is None:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_data", "sf1")
    marker = os.path.join(out, "_GENERATED")
    stamp = f"v2 factor={factor} src={src} files={_OUT_FILES}\n"
    current = ""
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read()
    if current != stamp:  # regenerate on layout/format changes too
        generate(spark, src, out, factor)
        with open(marker, "w") as f:
            f.write(stamp)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".bench_data/sf1")
    args = ap.parse_args()

    from dataflow_spark import get_spark

    spark = get_spark("make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.src, args.out, args.factor)
    with open(os.path.join(args.out, "_GENERATED"), "w") as f:
        f.write(f"factor={args.factor} src={args.src}\n")
    print(f"wrote {args.out} ({args.factor}x {args.src})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def generate_fact_streamed(spark, src: str, out_dir: str, table: str,
                           factor: int, batch_replicas: int = 50) -> None:
    """Replicate ONE fact table by ``factor`` in bounded append batches.

    The full-factor ``generate`` path explodes every replica into one
    plan and repartitions — at factor 1000 (600M lineitem rows) that
    global shuffle was projected to spill past the box's disk and was
    aborted in r6. Here each batch explodes only ``batch_replicas``
    replicas of the (small) source and APPENDS without any shuffle:
    a narrow scan->explode->shift->write pipeline whose working set is
    one batch, mirroring how a real ingest would land a 100 TB table —
    partition-at-a-time, never a global re-shuffle.
    """
    from pyspark.sql import functions as F

    shift_cols = SHIFT_COLS[table]
    dst = os.path.join(out_dir, f"{table}.parquet")
    if os.path.islink(dst):
        os.remove(dst)  # replace a placeholder symlink with real data
    import shutil
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    src_df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    for lo in range(0, factor, batch_replicas):
        hi = min(lo + batch_replicas, factor)
        rep = src_df.withColumn(
            "_r", F.explode(F.sequence(F.lit(lo), F.lit(hi - 1))))
        for c in shift_cols:
            rep = rep.withColumn(
                c, F.col(c).cast("long")
                + F.col("_r").cast("long") * F.lit(STRIDE).cast("long"))
        if table == "documents":
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" #r"),
                             F.col("_r").cast("string"))))
        rep.drop("_r").write.mode("append").parquet(dst)
