"""Floor decomposition for the r6-flagged sf1 ratio doublings:
q_bm25_topk 1.92->3.55, x_decontaminate 1.86->3.55 (BENCH_r06).

Method (same as the d_exact_hash treatment, ORACLE_SWEEP.md): n>=3
medians of (a) the full query, (b) a bare scan+tokenize floor over the
same table, (c) intermediate stages, at BOTH scales; ratio of each
layer tells whether the 10x growth is in real per-row work (expected
<= ~10/32-core parallel ~ 1-3x wall) or in a superlinear stage.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as em
from dataflow_spark import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.bench_data/sf1"


def timed(df, n=3):
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3)


def main():
    spark = get_spark("floor", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    for sf_name, sf in [("sf0.1", SF01), ("sf1", SF1)]:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        docs.count()
        n_docs, n_chars = docs.select(
            F.count("*"), F.sum(F.length("text"))).first()
        print(f"--- {sf_name}: {n_docs} docs, {n_chars} chars")
        # layer 0: bare scan + count
        print("  scan_count:", timed(docs.select("doc_id")))
        # layer 1: scan + whitespace tokenize + explode + count per token
        toks = (docs.select(F.explode(F.split(F.lower("text"),
                                              r"\s+")).alias("t"))
                .groupBy("t").count())
        print("  tokenize_group:", timed(toks))
        # layer 2: word 3-gram explode (decontaminate's dominant stage)
        g3 = (docs.select(F.explode(
            F.transform(
                F.slice(F.split(F.lower("text"), r"\s+"), 1, 5000),
                lambda x: x)).alias("w")))
        print("  word_explode:", timed(g3.groupBy("w").count()))
        # full queries
        print("  q_bm25_topk:", timed(qs["q_bm25_topk"](spark, sf)))
        print("  x_decontaminate:", timed(qs["x_decontaminate"](spark, sf)))
    spark.stop()


if __name__ == "__main__":
    main()
