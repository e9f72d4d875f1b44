"""Quick isolated per-query timing: warm-up + N noop-sink runs, prints
median/min. Mirrors bench.py methodology for one query.

Usage: python tools/quick_query_bench.py <query> [iters] [repo_root]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

root = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("quick-bench", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    fn = qs[name]
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(iters):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{name}: med {statistics.median(samples)} min {min(samples)} "
          f"{samples}")
    spark.stop()


if __name__ == "__main__":
    main()
