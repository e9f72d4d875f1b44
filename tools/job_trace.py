"""Trace the Spark jobs of one query invocation: job count, per-job
wall, and what triggered each (driver-side stack hint via job group).

Usage: python tools/job_trace.py <query> [iters]
Parses DAGScheduler 'Job N finished: <callsite>, took Ns' INFO lines.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-trace", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    fn = qs[name]

    # warm
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # capture DAGScheduler INFO through log4j: route to stderr which we
    # can't easily split per job -> instead poll the status tracker
    st = spark.sparkContext.statusTracker()
    for it in range(iters):
        before_ids = set(st.getJobIdsForGroup() or [])
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        ids = sorted(set(st.getJobIdsForGroup() or []) - before_ids)
        print(f"iter {it}: build {t1-t0:.3f}s action {t2-t1:.3f}s "
              f"jobs {len(ids)}")
        for jid in ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            sts = [st.getStageInfo(s) for s in ji.stageIds]
            n_tasks = sum(s.numTasks for s in sts if s)
            print(f"  job {jid}: stages {len(ji.stageIds)} tasks {n_tasks}")
    spark.stop()


if __name__ == "__main__":
    main()
