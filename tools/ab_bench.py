"""Interleaved A/B bench of a query subset between two repo checkouts.

Runs the SAME bench methodology (1 warm-up + N timed noop-sink runs per
query) in a fresh subprocess per (side, cycle), alternating A/B so host
drift hits both sides equally; reports per-query MIN across cycles (host
noise only ever adds time, so the min converges to the true floor).
Calibration-gated: each cycle fires only when the box probe passes, and
a cycle whose post-probe fails is voided for both sides.

Usage:
  python tools/ab_bench.py --a /root/r9_final --b /root/repo \
      --queries d_minhash_lsh,d_simhash --cycles 4 [--iters 3]
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
iters = int(sys.argv[3])
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entrymod
from dataflow_spark import get_spark
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024))
spark = get_spark("ab-bench", extra_conf={
    "spark.sql.files.maxPartitionBytes": mpb,
    "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
spark.range(1000).count()
for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
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
out = {}
for name in names:
    fn = qs[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(iters):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    out[name] = samples
print("ABRESULT " + json.dumps(out))
spark.stop()
'''


def probe() -> dict:
    out = subprocess.run([sys.executable, os.path.join(HERE, "box_calibration.py")],
                         capture_output=True, text=True, timeout=300)
    return json.loads(out.stdout.strip().splitlines()[-1])


def healthy(p: dict) -> bool:
    return p["gemm_s"] < 1.7 and p["steal_pct_loaded"] < 9.0


def run_side(repo: str, queries: str, iters: int) -> dict:
    r = subprocess.run([sys.executable, "-c", RUNNER, repo, queries, str(iters)],
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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max-wait-s", type=int, default=3600)
    args = ap.parse_args()

    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    kept = 0
    t_deadline = time.time() + args.max_wait_s
    cycle = 0
    while kept < args.cycles and time.time() < t_deadline:
        pre = probe()
        print(f"[ab] pre {pre}", flush=True)
        if not healthy(pre):
            time.sleep(90)
            continue
        cycle += 1
        order = [("a", args.a), ("b", args.b)]
        if cycle % 2 == 0:
            order.reverse()
        res = {}
        for tag, repo in order:
            res[tag] = run_side(repo, args.queries, args.iters)
        post = probe()
        ok = healthy(post)
        print(f"[ab] cycle {cycle} post {post} keep={ok}", flush=True)
        for tag in ("a", "b"):
            for q, samples in res[tag].items():
                print(f"   {tag} {q}: {samples}", flush=True)
        if not ok:
            continue
        kept += 1
        for tag in ("a", "b"):
            for q, samples in res[tag].items():
                cur = mins[tag].get(q)
                m = min(samples)
                mins[tag][q] = m if cur is None else min(cur, m)
    print("[ab] FINAL mins over kept cycles:", json.dumps(mins, indent=1),
          flush=True)
    for q in mins["a"]:
        a, b = mins["a"][q], mins["b"].get(q)
        if b:
            print(f"[ab] {q}: A={a:.3f} B={b:.3f} B/A={b/a:.3f}", flush=True)


if __name__ == "__main__":
    main()
