"""Scale-adaptive spreading of expensive per-row kernel stages.

A single-row-group parquet file scans as ONE task no matter how small
``spark.sql.files.maxPartitionBytes`` is, so any expensive per-row
kernel planned into the scan stage (pandas UDF signature/score kernels,
mapInPandas GEMM workers) runs on one core while the rest of the
cluster idles. :func:`spread_for_udf` round-robins the (narrow,
pre-projected) frame to ``defaultParallelism`` — but ONLY when the
frame has fewer partitions than that, so on any real-scale input
(thousands of splits) it adds no Exchange at all. Guide §2.2 (more map
tasks for the stage feeding the work) / §6.1 (split-bound scans).

Results never change: the kernels are per-row, and every downstream
grouping/join is keyed, so row placement is semantics-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_udf(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the cluster iff it is under-split.

    Call on the NARROW projection that feeds the kernel (id + kernel
    input columns), never on full rows — the repartition ships exactly
    what the kernel stage needs.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
