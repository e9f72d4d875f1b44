"""Fourth-decade (sf100) slab verification for the dense GEMM kNN path.

``s_most_similar`` is exact all-pairs self-kNN — quadratic by
definition. At 2M vectors that is 4e12 candidate pairs (~100x the
sf10 wall, ~2h engine / ~9h oracle): the operator's own
``max_broadcast_queries`` guard refuses self-kNN at this size by
design, and the contract's scale path is LSHKNN/IVFKNN (both
value-exact at sf100, see ORACLE_SWEEP.md r9). What CAN be verified
at the fourth decade is the dense worker itself: a deterministic
query SLAB (vec_id % slab_mod == 7, ~20k queries) against the FULL
2M corpus — the same GEMM/tie/zero-norm machinery at sf10-equivalent
flops, with the corpus side at genuine sf100 scale.

Oracle: the same tie-robust blocked-GEMM construction as
tools/brute_text_oracle.numpy_most_similar (pre-normalized unit
matrix, reused block buffers, margin candidates re-scored with
position-independent per-pair dots, ties to smaller id), restricted
to the slab's rows and excluding self-pairs by id.

Usage: python tools/sf100_similarity_slab.py [--sf .bench_data/sf100]
           [--slab-mod 100] [--k 1]
Exits 0 iff engine and oracle agree exactly (ids and cosines to 4dp).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def oracle_slab_top1(sf_dir: str, slab_mod: int):
    import duckdb

    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{p}' ORDER BY vec_id").fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    zero = norms == 0
    with np.errstate(invalid="ignore", divide="ignore"):
        Mu = np.divide(M, norms[:, None], out=np.zeros_like(M),
                       where=norms[:, None] > 0)
    qmask = (ids % slab_mod) == 7
    qidx = np.nonzero(qmask)[0]
    n, nq = len(ids), len(qidx)

    blk = 2048
    # ENGINE RULE r8: block buffers allocated once, computed via out=
    rawb = np.empty((min(blk, nq), n))
    maskb = np.empty((min(blk, nq), n), dtype=bool)
    out = {}
    for lo in range(0, nq, blk):
        nr = min(blk, nq - lo)
        qrows = qidx[lo:lo + nr]
        cos = rawb[:nr]
        np.matmul(Mu[qrows], Mu.T, out=cos)
        cos[:, zero] = -np.inf
        cos[np.arange(nr), qrows] = -np.inf  # self excluded by position
        mx = np.max(cos, axis=1)
        thr = mx - np.maximum(1e-9 * np.abs(mx), 1e-12)
        thr[~np.isfinite(mx)] = np.inf
        thr[zero[qrows]] = np.inf
        mask = maskb[:nr]
        np.greater_equal(cos, thr[:, None], out=mask)
        rr, cc = np.nonzero(mask)
        if not len(rr):
            continue
        s = np.empty(len(rr))
        for t in range(len(rr)):
            qi, ci = qrows[rr[t]], cc[t]
            s[t] = (float(np.dot(M[qi], M[ci]))
                    / (norms[qi] * norms[ci]))
        order = np.lexsort((ids[cc], -s, rr))
        rs = rr[order]
        starts = np.r_[0, 1 + np.flatnonzero(rs[1:] != rs[:-1])]
        win = order[starts]
        for w in win:
            out[int(ids[qrows[rr[w]]])] = (int(ids[cc[w]]),
                                           round(float(s[w]), 4))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".bench_data/sf100")
    ap.add_argument("--slab-mod", type=int, default=100)
    ap.add_argument("--k", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_spark import get_spark
    from dataflow_spark.core.registry import get_operator

    spark = get_spark("sf100-knn-slab", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % args.slab_mod == 7)
    op = get_operator("BruteForceKNN", {
        "id_key": "vec_id", "embedding_key": "embedding", "k": args.k})
    t0 = time.time()
    got = {int(r["query_id"]): (int(r["neighbor_id"]),
                                round(float(r["cosine_sim"]), 4))
           for r in op.run(emb, queries=queries).collect()}
    t_eng = time.time() - t0
    spark.stop()

    t0 = time.time()
    want = oracle_slab_top1(args.sf, args.slab_mod)
    t_ora = time.time() - t0

    bad = [(q, got.get(q), want.get(q))
           for q in set(got) | set(want) if got.get(q) != want.get(q)]
    if not bad:
        print(f"PASS  s_most_similar sf100-slab: {len(got)} queries vs "
              f"full 2M corpus, exact (engine {t_eng:.1f}s, oracle "
              f"{t_ora:.1f}s)")
        return 0
    print(f"FAIL  s_most_similar sf100-slab: {len(bad)} mismatches, "
          f"first {bad[:5]}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
