"""VERDICT r9 item 4: perf-measure the over-budget FALLBACK paths.

The r9 decontamination / segment-dedup optimizations added broadcast
fast paths with join-plan fallbacks that are correctness-tested but were
never perf-measured at scale. This forces each budget to 0 (so the
operator takes its fallback join plan) and times fast path vs fallback
at the given SF dir, interleaved in one session.

Usage:
  SPARK_GRAFT_SF_DIR=/root/repo/.bench_data/sf10 python tools/fallback_perf_sf10.py [iters]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark
    from dataflow_spark.operators.filters import decontaminate as DC
    from dataflow_spark.operators.refiners import segment_dedup as SD

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/repo/.bench_data/sf10")
    spark = get_spark("fallback-perf", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    budgets = {
        "x_decontaminate": (DC, "_BENCH_SET_BUDGET"),
        "r_segment_dedup": (SD, "_DUP_COLLECT_CAP"),
    }

    def timed(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(iters):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        return samples

    for name, (mod, attr) in budgets.items():
        fn = qs[name]
        orig = getattr(mod, attr)
        fast = timed(fn)
        setattr(mod, attr, 0)          # force the fallback join plan
        try:
            fb = timed(fn)
        finally:
            setattr(mod, attr, orig)
        print(f"{name}: fast min {min(fast)} med {statistics.median(fast)} "
              f"{fast} | FALLBACK min {min(fb)} med {statistics.median(fb)} "
              f"{fb}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
