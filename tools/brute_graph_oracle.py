"""Brute-force oracle for the co-error graph queries at scales where
the SQL twins are infeasible.

At sf1 the co-error graph has ~24M edges. The contract oracles are
exact but their DuckDB shapes do not scale there: the connected-
components twin is a RECURSIVE transitive closure (O(nodes x edges)
rows) and the PageRank twin spilled the disk on its 48M-edge joins.
Both algorithms are pure integer fixed-point, so a third
implementation is trivial and assumption-free:

- edges come from DuckDB (the cheap part of the oracle, verbatim SQL);
- connected components: array-based union-find, component = min id;
- PageRank: 3 power iterations with the operator's exact fixed-point
  arithmetic (SCALE=1e9 integers, floor divisions) via int64
  np.add.at — associative, so bit-identical to any correct engine.

Usage:
    python tools/brute_graph_oracle.py [--sf .bench_data/sf1]
        [--query q_connected_components,q_pagerank]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES_SQL = """
WITH eh AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
            FROM events WHERE event_type = 'error')
SELECT DISTINCT a.user_id AS src, b.user_id AS dst
FROM eh a JOIN eh b ON a.h = b.h AND a.user_id < b.user_id
"""


def load_edges(sf_dir: str) -> np.ndarray:
    import duckdb

    p = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    con.execute("SET memory_limit='20GB'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}'")
    e = con.execute(EDGES_SQL).fetchnumpy()
    con.close()
    return np.stack([e["src"].astype(np.int64),
                     e["dst"].astype(np.int64)], axis=1)


def brute_components(edges: np.ndarray) -> dict[int, int]:
    ids = np.unique(edges)
    idx = {int(v): i for i, v in enumerate(ids)}
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges.tolist():
        rs, rt = find(idx[s]), find(idx[t])
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    comp_min: dict[int, int] = {}
    for v in ids.tolist():
        r = find(idx[v])
        comp_min[r] = min(comp_min.get(r, v), v)
    return {int(v): comp_min[find(idx[v])] for v in ids.tolist()}


def brute_pagerank(edges: np.ndarray, n_iter: int = 3,
                   scale: int = 10 ** 9, d_num: int = 850) -> dict[int, float]:
    sym = np.concatenate([edges, edges[:, ::-1]])
    ids = np.unique(sym)
    idx_map = {int(v): i for i, v in enumerate(ids)}
    s = np.fromiter((idx_map[int(v)] for v in sym[:, 0]), dtype=np.int64)
    t = np.fromiter((idx_map[int(v)] for v in sym[:, 1]), dtype=np.int64)
    n = len(ids)
    deg = np.bincount(s, minlength=n).astype(np.int64)
    pr = np.full(n, scale // n, dtype=np.int64)
    for _ in range(n_iter):
        contrib = pr[s] // deg[s]
        m = np.zeros(n, dtype=np.int64)
        np.add.at(m, t, contrib)
        # mirror of the contract oracle / PageRankOperator fixed point:
        # (1000-d)*SCALE // (1000*n) + (d*m) // 1000, all integer
        pr = ((1000 - d_num) * scale) // (1000 * n) + (d_num * m) // 1000
    return {int(v): pr[idx_map[int(v)]] / float(scale)
            for v in ids.tolist()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".bench_data/sf1")
    ap.add_argument("--query",
                    default="q_connected_components,q_pagerank")
    args = ap.parse_args()

    t0 = time.time()
    edges = load_edges(args.sf)
    print(f"      edges: {len(edges)} ({time.time()-t0:.1f}s)")

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    spark = get_spark("brute-graph-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    ok = True
    for name in args.query.split(","):
        t0 = time.time()
        if name == "q_connected_components":
            want = brute_components(edges)
            t_brute = time.time() - t0
            t0 = time.time()
            got = {int(r[0]): int(r[1])
                   for r in qs[name](spark, args.sf).collect()}
        elif name == "q_pagerank":
            want = brute_pagerank(edges)
            t_brute = time.time() - t0
            t0 = time.time()
            got = {int(r[0]): float(r[1])
                   for r in qs[name](spark, args.sf).collect()}
        else:
            raise SystemExit(f"unknown query {name}")
        t_engine = time.time() - t0
        print(f"      {name}: brute {t_brute:.1f}s, engine {t_engine:.1f}s")
        bad = {k for k in set(want) | set(got)
               if want.get(k) != got.get(k)}
        if bad:
            ex = sorted(bad)[:5]
            print(f"FAIL  {name}: {len(bad)} mismatches of "
                  f"{len(want)}; e.g. "
                  f"{[(k, got.get(k), want.get(k)) for k in ex]}")
            ok = False
        else:
            print(f"PASS  {name}: {len(got)} rows exact")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
