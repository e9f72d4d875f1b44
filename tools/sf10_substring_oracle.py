"""Quotient oracle for the substring-duplicate family at the sf10
replica corpus (.bench_data/sf10 = 100x sf0.1 via make_scaled_data.py).

The replica algebra: doc(i, r) has doc_id = i + r*STRIDE and text
base_i for r=0, base_i + " #r" + str(r) for r>0. The brute DuckDB
oracle is ~quadratic in the replication (130M 40-gram rows whose
equijoin groups are 100x denser than at base scale), but the TRUE
answer factorizes over the 5,000 base texts:

Preconditions (asserted): every base is >= 40+4 chars and '#'-free.
Then a 40-char substring shared between doc(i,r) and doc(j,s) is
either (a) '#'-free — i.e. a 40-gram shared between the '#'-free
extensions A_i(+" " iff r>0) and A_j(+" " iff s>0), since any gram
reaching past the suffix space contains '#' — or (b) contains the
single '#' of both texts, which pins the alignment: run length =
common_suffix(A_i, A_j) + len(" #") + 1 + rl, with rl = lcp(str(r),
str(s)) for r != s (max 1 for distinct 1-2 digit numbers) and
rl = len(str(r)) for r == s.

So the full 27M-pair answer reduces to, per base pair:
  P00  = grams40(A_i)       & grams40(A_j)        -> the (0,0) pair
  PSij = grams40(A_i)       & grams40(A_j + " ")  -> 99 (0,s>0) pairs
  PSji = grams40(A_j)       & grams40(A_i + " ")  -> 99 (r>0,0) pairs
  PSS  = grams40(A_i + " ") & grams40(A_j + " ")  -> 99x99 (r>0,s>0)
  plus the '#'-crossing fringe when common_suffix(A_i,A_j) >= 35.
Intra-base: every base >= 40 chars, so each family is a full
100-clique (C(100,2) pairs).

Survivor quotient (d_substring_dedup): replica components == base-
family components (families are cliques), merged by PSS or any
'#'-fringe pair; survivors = the min base id per component, at r=0.

The script runs the ENGINE at sf10 and compares the full pair multiset
(exact numpy sort compare of all ~27M (doc_a, doc_b) tuples) and the
exact survivor set. Usage:

    python tools/sf10_substring_oracle.py [--sf .bench_data/sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 100_000_000
L = 40
NREP = 100  # overridden by --factor


def grams40(t: str) -> set:
    return {t[i:i + L] for i in range(len(t) - L + 1)}


def common_suffix(a: str, b: str) -> int:
    n = 0
    while n < len(a) and n < len(b) and a[-1 - n] == b[-1 - n]:
        n += 1
    return n


def lcp(a: str, b: str) -> int:
    n = 0
    while n < len(a) and n < len(b) and a[n] == b[n]:
        n += 1
    return n


def base_pair_classes(bases: dict) -> tuple:
    """-> (classes: {(i, j): (p00, psij, psji, pss)}, csfx: {(i, j): n})"""
    t0 = time.time()
    idx = defaultdict(list)  # gram -> [(base_id, kind)] kind 0=plain,1=tail
    for i, t in bases.items():
        ext = t + " "
        for g in grams40(t):
            idx[g].append((i, 0))
        tail = ext[-L:]
        idx[tail].append((i, 1))
    flags = defaultdict(int)  # (i, j) -> bitmask of which class shares
    for g, members in idx.items():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            ia, ka = members[x]
            for y in range(x + 1, len(members)):
                ib, kb = members[y]
                if ia == ib:
                    continue
                i, j = (ia, ib) if ia < ib else (ib, ia)
                ki, kj = (ka, kb) if ia < ib else (kb, ka)
                # plain-plain gram: shared by A_i and A_j -> every class
                if ki == 0 and kj == 0:
                    flags[(i, j)] |= 0b1111
                elif ki == 0 and kj == 1:   # gram in A_i, tail gram of A_j+' '
                    flags[(i, j)] |= 0b0110  # PSij (i plain vs j+' ') + PSS
                elif ki == 1 and kj == 0:
                    flags[(i, j)] |= 0b1010  # PSji + PSS
                else:                        # both tail grams
                    flags[(i, j)] |= 0b0010  # PSS only
    # bit 0 = P00, bit 1 = PSS, bit 2 = PSij, bit 3 = PSji
    # '#'-fringe: common suffix >= 35 (needs csfx+3+rl >= 40, rl <= 2)
    by_tail = defaultdict(list)
    for i, t in bases.items():
        by_tail[t[-35:]].append(i)
    csfx = {}
    for _, ids in by_tail.items():
        if len(ids) < 2:
            continue
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = ids[x], ids[y]
                csfx[(i, j)] = common_suffix(bases[i], bases[j])
    print(f"  base algebra: {len(flags)} linked base pairs, "
          f"{len(csfx)} >=35-char common-suffix pairs "
          f"({time.time() - t0:.1f}s)")
    return flags, csfx


def hash_fringe_rs(cs: int) -> list:
    """(r, s) pairs (r,s>0, unordered r<s plus r==s meaning (r,0)? no —
    r==s only valid for DIFFERENT bases) whose '#'-crossing run reaches
    L given a common base suffix of cs chars. Run = cs + 3 + rl."""
    out = []
    for r in range(1, NREP):
        for s in range(r, NREP):
            rl = len(str(r)) if r == s else lcp(str(r), str(s))
            if cs + 3 + rl >= L:
                out.append((r, s))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".bench_data/sf10")
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--out", default="/tmp/sf10_substring_oracle.json")
    args = ap.parse_args()
    global NREP
    NREP = args.factor

    import duckdb

    bases = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{args.base_sf}/documents.parquet'"
    ).fetchall())
    assert all(len(t) >= L + 4 and "#" not in t for t in bases.values()), \
        "replica algebra preconditions violated"
    print(f"bases: {len(bases)}")

    flags, csfx = base_pair_classes(bases)

    # ---- expected pair multiset, as (doc_a, doc_b) int64 arrays -------
    t0 = time.time()
    chunks = []
    ids = np.array(sorted(bases), dtype=np.int64)
    # intra-base 100-cliques: for each (r, s) r<s, all bases
    r_, s_ = np.triu_indices(NREP, k=1)
    for r, s in zip(r_.tolist(), s_.tolist()):
        chunks.append(np.stack([ids + r * STRIDE, ids + s * STRIDE], 1))
    # cross-base
    rs_full = [(r, s) for r in range(1, NREP) for s in range(1, NREP)]
    for (i, j), f in sorted(flags.items()):
        combos = []
        if f & 0b0001:
            combos.append((0, 0))
        if f & 0b0100:
            combos.extend((0, s) for s in range(1, NREP))
        if f & 0b1000:
            combos.extend((r, 0) for r in range(1, NREP))
        if f & 0b0010:
            combos.extend(rs_full)
        elif (i, j) in csfx:
            for r, s in hash_fringe_rs(csfx[(i, j)]):
                combos.append((r, s))
                if r != s:
                    combos.append((s, r))
        if combos:
            arr = np.array(combos, dtype=np.int64)
            a = i + arr[:, 0] * STRIDE
            b = j + arr[:, 1] * STRIDE
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            chunks.append(np.stack([lo, hi], 1))
    # csfx-only pairs with no gram link at all
    for (i, j), cs in sorted(csfx.items()):
        if (i, j) in flags:
            continue
        combos = []
        for r, s in hash_fringe_rs(cs):
            combos.append((r, s))
            if r != s:
                combos.append((s, r))
        if combos:
            arr = np.array(combos, dtype=np.int64)
            a = i + arr[:, 0] * STRIDE
            b = j + arr[:, 1] * STRIDE
            chunks.append(np.stack([np.minimum(a, b), np.maximum(a, b)], 1))
    exp = np.unique(np.concatenate(chunks), axis=0)
    print(f"expected pairs: {len(exp)} ({time.time() - t0:.1f}s)")

    # ---- expected survivors -------------------------------------------
    parent = {i: i for i in bases}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # any replica-level cross pair links the two 100-cliques
    linked = set(flags)
    for (i, j), cs in csfx.items():
        if cs + 3 + 2 >= L:  # best-case fringe (rl <= 2) reaches L
            if hash_fringe_rs(cs):
                linked.add((i, j))
    for i, j in linked:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    exp_survivors = sorted({find(i) for i in bases})
    print(f"expected survivors: {len(exp_survivors)}")

    # ---- engine --------------------------------------------------------
    from dataflow_spark import get_spark
    import __spark_entry__ as entry

    spark = get_spark("sf10-substring-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    t0 = time.time()
    pairs_df = qs["d_substring_pairs"](spark, args.sf)
    got = pairs_df.toPandas()
    wall_pairs = time.time() - t0
    # sort rows lexicographically for the multiset compare
    got_arr = got[["doc_a", "doc_b"]].to_numpy(dtype=np.int64)
    got_arr = got_arr[np.lexsort((got_arr[:, 1], got_arr[:, 0]))]
    ok_pairs = got_arr.shape == exp.shape and bool((got_arr == exp).all())
    print(f"d_substring_pairs sf10: engine {wall_pairs:.1f}s, "
          f"{len(got_arr)} pairs, exact={ok_pairs}")
    if not ok_pairs:
        print("  expected", exp.shape, "got", got_arr.shape)
        if got_arr.shape == exp.shape:
            d = np.nonzero((got_arr != exp).any(1))[0][:5]
            print("  first diffs:", exp[d].tolist(), got_arr[d].tolist())

    t0 = time.time()
    kept = qs["d_substring_dedup"](spark, args.sf).toPandas()
    wall_dedup = time.time() - t0
    got_surv = sorted(kept["doc_id"].tolist())
    ok_surv = got_surv == exp_survivors
    print(f"d_substring_dedup sf10: engine {wall_dedup:.1f}s, "
          f"{len(got_surv)} survivors, exact={ok_surv}")
    if not ok_surv:
        print("  missing:", sorted(set(exp_survivors) - set(got_surv))[:10])
        print("  extra:", sorted(set(got_surv) - set(exp_survivors))[:10])

    import json
    with open(args.out, "w") as f:
        json.dump({"sf": args.sf, "factor": args.factor,
                   "expected_pairs": int(exp.shape[0]),
                   "engine_pairs": int(got_arr.shape[0]),
                   "pairs_exact": ok_pairs,
                   "pairs_engine_s": round(wall_pairs, 1),
                   "expected_survivors": len(exp_survivors),
                   "engine_survivors": len(got_surv),
                   "survivors_exact": ok_surv,
                   "dedup_engine_s": round(wall_dedup, 1)}, f, indent=1)
    print("wrote", args.out)
    sys.exit(0 if (ok_pairs and ok_surv) else 1)


if __name__ == "__main__":
    main()
