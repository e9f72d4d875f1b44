"""Split each headline query's wall into DataFrame-BUILD time (python +
py4j plan construction, plus any eager driver work like the CC probe)
vs ACTION time (analysis + optimization + scheduling + execution of the
noop write).

Directs optimization effort per guide §1: if build dominates, the fix
is python-side (fewer py4j round trips, lighter expression trees, less
eager work); if action dominates, it is Catalyst/runtime-side.

Usage: python tools/decompose_overhead.py [names...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from dataflow_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024))
    spark = get_spark("decompose", extra_conf={
        "spark.sql.files.maxPartitionBytes": mpb,
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # mirror bench.py warm-up
    spark.range(1000).count()
    for t in ["lineitem", "orders", "customer", "events", "documents",
              "embeddings"]:
        try:
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        except Exception:
            pass

    n_iter = int(os.environ.get("DECOMP_ITERS", "5"))
    rows = []
    for name in (names or HEADLINE):
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        builds, actions = [], []
        for _ in range(n_iter):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            actions.append(t2 - t1)
        rows.append({
            "query": name,
            "build_med": round(statistics.median(builds), 3),
            "action_med": round(statistics.median(actions), 3),
            "total_med": round(statistics.median(
                [b + a for b, a in zip(builds, actions)]), 3),
        })
        print(json.dumps(rows[-1]))
    tb = sum(r["build_med"] for r in rows)
    ta = sum(r["action_med"] for r in rows)
    print(json.dumps({"sum_build": round(tb, 3), "sum_action": round(ta, 3),
                      "sum_total": round(tb + ta, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
