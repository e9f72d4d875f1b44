"""Deterministic box-speed calibration — run before trusting any
wall-clock comparison against a prior round's medians.

Rounds 7-9 repeatedly re-litigated 1.3-1.6x bench upticks that turned
out to be HOST state (CPU steal on the shared hypervisor, page-cache
temperature), not plan regressions. This tool measures the box itself,
Spark-free, in ~15s:

- md5_mb_s: single-thread CPU throughput (md5 over 200MB);
- gemm_s: 5x 2000^3 float64 GEMM (BLAS/SIMD health);
- alloc_mb_s: first-touch page-fault bandwidth on a fresh 512MB mmap
  (the r8 discovery: ~50MB/s when the host is contended — THE number
  that moves GEMM-worker walls);
- steal_pct_loaded: CPU steal with 32 spinning processes (what a
  32-thread Spark stage actually experiences).

One JSON line to stdout. Record it next to any bench run used for a
flag disposition; compare ratios of calibration numbers before
comparing ratios of query walls.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time


def _spin(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        x += 1


def _cpu_stat():
    f = open("/proc/stat").readline().split()
    return list(map(int, f[1:]))


def main() -> None:
    import numpy as np

    out = {}

    b = b"x" * 1_000_000
    h = hashlib.md5()
    t = time.time()
    for _ in range(200):
        h.update(b)
    out["md5_mb_s"] = round(200 / (time.time() - t), 1)

    a = np.random.default_rng(0).normal(size=(2000, 2000))
    t = time.time()
    for _ in range(5):
        a @ a
    out["gemm_s"] = round(time.time() - t, 3)

    # fresh-allocation first-touch bandwidth: np.empty mmaps 512MB,
    # writing one byte/page faults every page in
    t = time.time()
    buf = np.empty(512 * 1024 * 1024, dtype=np.uint8)
    buf[:: 4096] = 1
    out["alloc_mb_s"] = round(512 / (time.time() - t), 1)
    del buf

    s0 = _cpu_stat()
    stop = time.time() + 5
    ps = [mp.Process(target=_spin, args=(stop,)) for _ in range(32)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    s1 = _cpu_stat()
    d = [y - x for x, y in zip(s0, s1)]
    out["steal_pct_loaded"] = round(100 * d[7] / max(1, sum(d)), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
