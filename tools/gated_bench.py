"""Gated bench runner: probe the box, fire the bench only in a healthy
window, keep only runs that pass the three-test rule.

The sandbox host oscillates between healthy and contended on minute
timescales (rounds 7-9 record), so a single wall-clock bench is
untrustworthy. This runner:

1. probes with tools/box_calibration.py every ~2 min;
2. fires ``python bench.py`` when gemm < GEMM_GATE and loaded steal
   < STEAL_GATE (the r9 operating points — the stricter gate starved
   captures for 80+ min);
3. keeps a run only if (a) the pre-probe passed, (b) a post-probe
   also passes, and (c) the untouched-query discriminator holds
   (q1_pricing_summary <= 0.49, q3 <= 0.83, q5 <= 0.63 — ~1.3x the r8
   driver medians; these queries' plans have not changed since r8, so
   uniform inflation on them = host, not code).

Usage: python tools/gated_bench.py [out_prefix] [max_attempts]
Writes <out_prefix>_<n>.json per attempt with probes + bench line +
keep verdict; exits after the first KEPT run or max_attempts.
Env: pass through SPARK_GRAFT_* (set SPARK_GRAFT_SCALE_CHECK=0 for the
headline-only ~2.5 min bench that fits a healthy burst).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

GEMM_GATE = 1.7
STEAL_GATE = 9.0
DISCRIMINATOR = {"q1_pricing_summary": 0.49,
                 "q3_shipping_priority": 0.83,
                 "q5_regional_revenue": 0.63}


def probe() -> dict:
    out = subprocess.run([sys.executable, os.path.join(HERE, "box_calibration.py")],
                         capture_output=True, text=True, timeout=300)
    return json.loads(out.stdout.strip().splitlines()[-1])


def healthy(p: dict) -> bool:
    return p["gemm_s"] < GEMM_GATE and p["steal_pct_loaded"] < STEAL_GATE


def main() -> None:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gated_bench"
    max_attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    attempt = 0
    while attempt < max_attempts:
        pre = probe()
        print(f"[gate] pre-probe {pre}", flush=True)
        if not healthy(pre):
            time.sleep(120)
            continue
        attempt += 1
        t0 = time.time()
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, timeout=3600,
                           cwd=REPO)
        wall = time.time() - t0
        line = [ln for ln in r.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        bench = json.loads(line)
        post = probe()
        disc_ok = all(
            isinstance(bench["queries"].get(q), (int, float))
            and bench["queries"][q] <= b
            for q, b in DISCRIMINATOR.items())
        keep = healthy(post) and disc_ok
        rec = {"pre": pre, "post": post, "bench": bench,
               "bench_wall_s": round(wall, 1),
               "disc_ok": disc_ok, "keep": keep}
        path = f"{prefix}_{attempt}.json"
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"[gate] attempt {attempt}: total={bench['value']} "
              f"disc_ok={disc_ok} post_healthy={healthy(post)} "
              f"keep={keep} -> {path}", flush=True)
        if keep:
            print("[gate] KEPT", flush=True)
            return
        time.sleep(60)
    print("[gate] exhausted attempts without a kept run", flush=True)


if __name__ == "__main__":
    main()
