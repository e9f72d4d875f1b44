"""Interleaved A/B of the FIRST (honest) invocation of queries.

For operators whose repeated in-session invocations were cache-assisted
before the r10 cache-scope fix (near-dup family), warm-up+timed-runs
methodology measures the r9 side reading its own warm-up's cache. The
honest comparable number is the FIRST invocation after generic session
warm-up (JVM, parquet reader, python workers — no query-specific
state). This runs one fresh subprocess per (side, cycle), alternating
sides, each timing build+execute of ONE invocation per query;
calibration-gated like tools/ab_bench.py; reports per-query min.

Usage:
  python tools/ab_first_invocation.py --a /root/r9_final --b /root/repo \
      --queries d_minhash_lsh,d_simhash --cycles 4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

RUNNER = r'''
import json, os, sys, time
repo = sys.argv[1]
names = sys.argv[2].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entrymod
from dataflow_spark import get_spark
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-first", extra_conf={
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
spark.range(1000).count()
for t in ["documents", "embeddings"]:
    try:
        spark.read.parquet(os.path.join(sf_dir, t + ".parquet")).count()
    except Exception:
        pass
from pyspark.sql import functions as F
warm = spark.createDataFrame([("w",)] * 256, ["text"]).repartition(32)
@F.pandas_udf("long")
def _wlen(s):
    return s.str.len()
warm.select(_wlen("text").alias("n")).agg(F.sum("n")).collect()
# one generic window+aggregate to JIT the exchange/codegen machinery
spark.range(100000).selectExpr("id % 97 AS k", "id").groupBy("k").count().collect()
out = {}
for name in names:
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
'''


def probe() -> dict:
    out = subprocess.run([sys.executable, os.path.join(HERE, "box_calibration.py")],
                         capture_output=True, text=True, timeout=300)
    return json.loads(out.stdout.strip().splitlines()[-1])


def healthy(p: dict) -> bool:
    return p["gemm_s"] < 1.7 and p["steal_pct_loaded"] < 9.0


def run_side(repo: str, queries: str) -> dict:
    r = subprocess.run([sys.executable, "-c", RUNNER, repo, queries],
                       capture_output=True, text=True, timeout=1800)
    for ln in r.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            return json.loads(ln[len("ABRESULT "):])
    raise RuntimeError(f"no result from {repo}: {r.stdout[-500:]} {r.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--max-wait-s", type=int, default=3600)
    args = ap.parse_args()

    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    kept = 0
    deadline = time.time() + args.max_wait_s
    cycle = 0
    while kept < args.cycles and time.time() < deadline:
        pre = probe()
        print(f"[abf] pre {pre}", flush=True)
        if not healthy(pre):
            time.sleep(90)
            continue
        cycle += 1
        order = [("a", args.a), ("b", args.b)]
        if cycle % 2 == 0:
            order.reverse()
        res = {tag: run_side(repo, args.queries) for tag, repo in order}
        post = probe()
        ok = healthy(post)
        print(f"[abf] cycle {cycle} post {post} keep={ok}", flush=True)
        for tag in ("a", "b"):
            print(f"   {tag}: {res[tag]}", flush=True)
        if not ok:
            continue
        kept += 1
        for tag in ("a", "b"):
            for q, s in res[tag].items():
                cur = mins[tag].get(q)
                mins[tag][q] = s if cur is None else min(cur, s)
    print("[abf] FINAL first-invocation mins:", json.dumps(mins, indent=1),
          flush=True)
    for q in mins["a"]:
        a, b = mins["a"][q], mins["b"].get(q)
        if b:
            print(f"[abf] {q}: A={a} B={b} B/A={b/a:.3f}", flush=True)


if __name__ == "__main__":
    main()
