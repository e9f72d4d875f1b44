"""Third-family sf10 oracles for the text/document queries whose DuckDB
contract twins exceed the sweep's 300s watchdog (r8, judge ask #5).

Two strategies, both exact:

1. ``python`` (d_minhash_lsh, d_simhash, d_minhash_clusters): the
   signature kernels are the module-level Spark-free functions the
   contract already standardizes on (``minhash_md5_one`` /
   ``simhash_md5_one`` — the SIGNATURE is the semantics; the SQL twin
   replays the same md5 construction), memoized per DISTINCT text;
   everything downstream — exact-signature collapse, plain band keys,
   bucket star edges, signature verify, union-find components,
   keep-first — is reimplemented here in plain Python/numpy with no
   shared code or assumptions with the Spark operators.

2. ``quotient`` (t_langid, f_stop_word, t_language_filter,
   q_pipeline_text_filter): these oracles are PER-ROW functions of
   (text[, doc_id residue flags]). Evaluating a per-row query on one
   representative per equivalence class of its inputs and fanning the
   results back out over the class members is value-identical — and at
   sf10 (replicated corpus: 500k docs, 5k distinct texts) it turns a
   >300s regex scan into seconds. The contract oracle SQL runs
   VERBATIM over the quotient view; only the view and the fan-out join
   are added.

Usage:
    python tools/brute_text_oracle.py [--sf .bench_data/sf10]
        [--query d_minhash_lsh,d_simhash,...]

Exits 0 iff every checked query's engine output matches exactly
(same compare as tools/verify_oracle.py: sorted columns,
order-insensitive rows, floats to 1e-9).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_oracle import to_rows  # noqa: E402

# GEMM block height for numpy_most_similar. Module-level so the
# allocation-pattern test (tests/test_similarity.py) can shrink it to
# force many blocks and assert the two block buffers are allocated
# exactly once (ENGINE RULE r8: preallocate block buffers once,
# compute via out= — see docs/engineering-notes.md).
_ORACLE_GEMM_BLK = 2048

PY_QUERIES = {"d_minhash_lsh", "d_simhash", "d_minhash_clusters",
              "d_incremental_minhash", "q_pipeline_corpus_curation"}
NUMPY_QUERIES = {"s_most_similar", "e_vendi_diversity", "x_kcenter_coreset",
                 "d_semantic"}
# engine output -> parquet, multiset-diffed against the contract SQL in
# DuckDB (EXCEPT ALL both ways): for rows whose sf10 failure mode is the
# COMPARE volume (tens of millions of rows through collect + python
# normalization), not oracle compute
DIFF_QUERIES = {"q_unpivot"}
# quotient rep keys beyond text: doc_id-derived flags the oracle reads
QUOTIENT_KEYS: dict[str, list[str]] = {
    "t_langid": [],
    "f_stop_word": [],
    "t_language_filter": [],
    "x_reasoning_ngram_filter": [],
    "e_cider": [],
    "x_pipeline_text_pt": [],
    "t_quality_score": [],
    "q_pipeline_text_filter": ["doc_id % 31 = 0", "doc_id % 37 = 0",
                               "doc_id % 41 = 0", "doc_id % 43 = 0"],
}
# which columns beyond doc_id the query outputs (joined back by rep id)
QUOTIENT_OUT_COLS: dict[str, list[str]] = {
    "t_langid": ["pred_lang"],
    "f_stop_word": [],
    "t_language_filter": [],
    "x_reasoning_ngram_filter": ["repetition_score"],
    "e_cider": ["cider"],
    "x_pipeline_text_pt": [],
    "t_quality_score": ["quality_score"],
    "q_pipeline_text_filter": [],
}


class _UF:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p, root = self.parent, x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _components(edges) -> dict[int, int]:
    uf = _UF()
    nodes: set[int] = set()
    for s, t in edges:
        nodes.add(s); nodes.add(t)
        uf.union(s, t)
    comp_min: dict[int, int] = {}
    for v in nodes:
        r = uf.find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[uf.find(v)] for v in nodes}


def _load_docs(sf_dir: str):
    import duckdb

    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    d = con.execute(
        f"SELECT doc_id, coalesce(text, '') AS text FROM '{p}' "
        "ORDER BY doc_id").fetchall()
    con.close()
    return d


def _near_dup(docs, sig_of, band_keys, verify, threshold_desc,
              assign: bool):
    """Shared brute near-dup machinery: memoized signatures ->
    exact-signature collapse -> rep band buckets -> star edges ->
    verify -> exact edges -> components -> keep-first/assign."""
    memo: dict[str, object] = {}
    sigs = []
    for did, text in docs:
        s = memo.get(text)
        if s is None:
            s = sig_of(text)
            memo[text] = s
        sigs.append((did, s))
    # exact-signature collapse (rep = min id per identical signature)
    by_sig: dict[object, list[int]] = {}
    for did, s in sigs:
        by_sig.setdefault(_hashable(s), []).append(did)
    sig_of_id = dict(sigs)
    exact_edges = []
    reps = []
    for ids in by_sig.values():
        ids.sort()
        reps.append(ids[0])
        exact_edges.extend((ids[0], d) for d in ids[1:])
    # band buckets over reps, star edges anchored at bucket min
    buckets: dict[tuple, list[int]] = {}
    for rid in reps:
        for bk in band_keys(sig_of_id[rid]):
            buckets.setdefault(bk, []).append(rid)
    star = set()
    for ids in buckets.values():
        if len(ids) > 1:
            ids.sort()
            star.update((ids[0], d) for d in ids[1:])
    verified = [(a, b) for a, b in star
                if verify(sig_of_id[a], sig_of_id[b])]
    comp = _components(verified + exact_edges)
    if assign:
        return [(did, comp.get(did, did)) for did, _ in docs]
    return [(did,) for did, _ in docs if comp.get(did, did) == did]


def _hashable(s):
    return tuple(s) if isinstance(s, list) else s


def brute_rows(name: str, docs):
    from dataflow_spark.functions.hashing import (minhash_md5_one,
                                                  simhash_md5_one)

    if name in ("d_minhash_lsh", "d_minhash_clusters"):
        num_perm, rows, bands, t = 64, 16, 4, 0.9

        def band_keys(sig):
            return [(b, tuple(sig[b * rows:(b + 1) * rows]))
                    for b in range(bands)]

        def verify(sa, sb):
            eq = sum(1 for x, y in zip(sa, sb) if x == y)
            return eq / num_perm >= t

        return _near_dup(docs, lambda txt: minhash_md5_one(txt, num_perm, 5),
                         band_keys, verify, "est_jaccard>=0.9",
                         assign=(name == "d_minhash_clusters"))
    if name == "d_simhash":
        def band_keys(sig):
            return [(b, (sig >> (16 * b)) & 0xFFFF) for b in range(4)]

        def verify(sa, sb):
            return bin(sa ^ sb).count("1") <= 3

        return _near_dup(docs, lambda txt: simhash_md5_one(txt, 4),
                         band_keys, verify, "hamming<=3", assign=False)
    if name == "d_incremental_minhash":
        return brute_incremental_minhash(docs)
    raise SystemExit(f"no python oracle for {name}")


def brute_incremental_minhash(docs):
    """Cross-corpus stage (new = doc_id%3!=0 vs existing = doc_id%3=0:
    band-bucket candidates over DISTINCT signatures, est-Jaccard >= 0.9
    verify), then the standard in-batch MinHash-LSH keep-first over the
    survivors via the same _near_dup machinery the d_minhash_lsh brute
    uses. Signature work is quotiented per distinct text — matching is
    a pure function of the signature, so the fan-out is value-exact."""
    from dataflow_spark.functions.hashing import minhash_md5_one

    num_perm, rows, bands, t = 64, 16, 4, 0.9
    memo: dict[str, tuple] = {}

    def sig_of(text):
        s = memo.get(text)
        if s is None:
            s = tuple(minhash_md5_one(text, num_perm, 5))
            memo[text] = s
        return s

    def band_keys(sig):
        return [(b, sig[b * rows:(b + 1) * rows]) for b in range(bands)]

    def est(sa, sb):
        return sum(1 for x, y in zip(sa, sb) if x == y) / num_perm

    # band index over the distinct EXISTING signatures
    buckets: dict[tuple, set] = {}
    for did, text in docs:
        if did % 3 == 0:
            s = sig_of(text)
            for bk in band_keys(s):
                buckets.setdefault(bk, set()).add(s)
    # per distinct NEW signature: matched iff any bucket-sharing
    # existing signature verifies
    matched: dict[tuple, bool] = {}
    survivors = []
    for did, text in docs:
        if did % 3 == 0:
            continue
        s = sig_of(text)
        m = matched.get(s)
        if m is None:
            m = any(est(s, e) >= t
                    for bk in band_keys(s)
                    for e in buckets.get(bk, ()))
            matched[s] = m
        if not m:
            survivors.append((did, text))

    def verify(sa, sb):
        return est(sa, sb) >= t

    def bk_lists(sig):
        return [(b, tuple(sig[b * rows:(b + 1) * rows]))
                for b in range(bands)]

    return _near_dup(survivors, lambda txt: minhash_md5_one(txt, num_perm, 5),
                     bk_lists, verify, "est_jaccard>=0.9", assign=False)


def brute_corpus_curation(sf_dir: str):
    """Independent python replay of the q_pipeline_corpus_curation
    chain: 3-gram benchmark decontamination -> corpus-wide 10-word
    segment dedup (global count + keep-first by (doc_id, pos)) ->
    >=5-word filter -> domain-mixture downsampling -> md5 split
    assignment. Float arithmetic mirrors the oracle's double ops in
    written order so the sampling thresholds are bit-identical."""
    import hashlib
    import math
    import re as _re

    import duckdb

    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, coalesce(text, '') AS text, source FROM '{p}' "
        "ORDER BY doc_id").fetchall()
    con.close()

    ws = _re.compile(r"\s+")
    wmemo: dict[str, list] = {}

    def words(t):
        w = wmemo.get(t)
        if w is None:
            w = [x for x in ws.split(t) if x]
            wmemo[t] = w
        return w

    gmemo: dict[str, frozenset] = {}

    def grams3(t):
        g = gmemo.get(t)
        if g is None:
            w = words(t)
            if len(w) >= 3:
                s = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
            else:
                s = {" ".join(w)}
            s.discard("")
            g = frozenset(s)
            gmemo[t] = g
        return g

    bg: set = set()
    for did, text, _ in rows:
        if did % 50 == 0:
            bg |= grams3(text)
    clean_memo: dict[str, bool] = {}
    clean = []
    for did, text, src in rows:
        if did % 50 == 0:
            continue
        ok = clean_memo.get(text)
        if ok is None:
            ok = not any(g in bg for g in grams3(text))
            clean_memo[text] = ok
        if ok:
            clean.append((did, text, src))

    smemo: dict[str, list] = {}

    def segments(t):
        s = smemo.get(t)
        if s is None:
            w = words(t)
            s = [" ".join(w[i * 10:(i + 1) * 10])
                 for i in range(math.ceil(len(w) / 10.0))]
            smemo[t] = s
        return s

    count: dict[str, int] = {}
    for _, text, _ in clean:
        for s in segments(text):
            count[s] = count.get(s, 0) + 1
    seen: set = set()
    kept = []  # (doc_id, source) of docs whose rebuilt text has >=5 words
    for did, text, src in clean:  # clean is doc_id-ascending; pos in order
        parts = []
        for s in segments(text):
            if count[s] < 2:
                parts.append(s)
            elif s not in seen:
                seen.add(s)
                parts.append(s)
        rebuilt = " ".join(parts)
        if len([x for x in ws.split(rebuilt) if x]) >= 5:
            kept.append((did, src))

    w2 = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    wsum = 0.4 + 0.3 + 0.2 + 0.1  # left-to-right, as the VALUES order sums
    cnt: dict[str, float] = {}
    for _, src in kept:
        cnt[src] = cnt.get(src, 0.0) + 1.0
    present = [s for s in ("src0", "src1", "src2", "src3") if s in cnt]
    min_ratio = min(cnt[s] / (w2[s] / wsum) for s in present)
    rate = {s: min(1.0, (w2[s] / wsum) * min_ratio / cnt[s]) for s in present}

    def h16(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    out = []
    for did, src in kept:
        r = rate.get(src)
        if r is None:
            continue
        if h16("mix" + str(did)) % 10000 < math.floor(r * 10000):
            b = h16("split" + str(did)) % 10000
            split = "train" if b < 9000 else ("val" if b < 9500 else "test")
            out.append((did, src, split))
    return ["doc_id", "source", "split"], out


def numpy_most_similar(sf_dir: str):
    """Chunked float64 GEMM top-1 oracle for s_most_similar: every
    vector's highest-cosine neighbor, ties to the smaller id (the
    contract's ORDER BY cos DESC, id ASC), cosine rounded to 4.

    Tie robustness (r8): byte-identical duplicate vectors do NOT get
    bitwise-equal cosines out of one GEMM — measured on this box, a
    single GEMV gives 1.0 for one copy and 1.0000000000000002 for
    another (SIMD/blocking position effects), so a bare argmax breaks
    ties by kernel luck, not by the contract. Candidates within a
    relative margin of the row max are therefore re-scored with a
    per-pair np.dot on the original vectors — deterministic for equal
    content regardless of position — and ranked (cos desc, id asc).
    Ranking between genuinely distinct cosines still comes from this
    tool's own blocked GEMM, independent of the engine's plan."""
    import duckdb
    import numpy as np

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
    n = len(ids)
    best_id = np.zeros(n, dtype=np.int64)
    best_cos = np.full(n, -np.inf)
    zero = norms == 0  # null-cosine rows are excluded on both sides
    blk = _ORACLE_GEMM_BLK
    # pre-normalized unit vectors + ONE reused GEMM buffer: the
    # expression form allocated ~20GB of temporaries per block, and on
    # this VM first-touch page faults run at ~50MB/s — the oracle spent
    # 85%+ of its wall in the kernel faulting freshly-mmapped pages.
    # Candidate RANKING between genuinely distinct cosines is unchanged
    # (any two cosines further than 1e-9 apart order identically); all
    # near-ties are settled by the exact per-pair rescore below.
    with np.errstate(invalid="ignore", divide="ignore"):
        Mu = np.divide(M, norms[:, None], out=np.zeros_like(M),
                       where=norms[:, None] > 0)
    rawb = np.empty((min(blk, n), n))
    maskb = np.empty((min(blk, n), n), dtype=bool)
    for lo in range(0, n, blk):
        nr = min(blk, n - lo)
        cos = rawb[:nr]
        np.matmul(Mu[lo:lo + nr], Mu.T, out=cos)
        cos[:, zero] = -np.inf
        for i in range(nr):
            cos[i, lo + i] = -np.inf  # self excluded
        mx = np.max(cos, axis=1)
        # candidates within max(relative, absolute) margin of the row
        # max; rows with no finite entry and zero-norm query rows
        # (their unit row is all-zero, giving cos 0, not the join
        # path's null) keep none
        thr = mx - np.maximum(1e-9 * np.abs(mx), 1e-12)
        thr[~np.isfinite(mx)] = np.inf
        thr[zero[lo:lo + nr]] = np.inf
        mask = maskb[:nr]
        np.greater_equal(cos, thr[:, None], out=mask)
        rr, cc = np.nonzero(mask)
        if not len(rr):
            continue
        s = np.empty(len(rr))
        for t in range(len(rr)):
            qi, ci = lo + rr[t], cc[t]
            s[t] = (float(np.dot(M[qi], M[ci]))
                    / (norms[qi] * norms[ci]))
        order = np.lexsort((ids[cc], -s, rr))
        rs = rr[order]
        starts = np.r_[0, 1 + np.flatnonzero(rs[1:] != rs[:-1])]
        win = order[starts]  # first of each row group = best
        best_id[lo + rr[win]] = ids[cc[win]]
        best_cos[lo + rr[win]] = s[win]
    return (["query_id", "neighbor_id", "cosine_sim"],
            [(int(ids[i]), int(best_id[i]), round(float(best_cos[i]), 4))
             for i in range(n) if not zero[i] and best_cos[i] != -np.inf])


def _load_embeddings(sf_dir: str):
    import duckdb
    import numpy as np

    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{p}' WHERE embedding IS NOT NULL "
        "ORDER BY vec_id").fetchall()
    n_total = con.execute(f"SELECT count(*) FROM '{p}'").fetchone()[0]
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    return n_total, ids, M


def numpy_vendi(sf_dir: str):
    """Order-2 Vendi via the Gram identity: sum_ij cos^2 = ||Vh^T Vh||_F^2
    over the unit-normalized non-zero rows (zero-norm rows contribute
    cs=0 to every pair but still count toward n). O(n d^2), no n x n
    matrix — an independent closed-form twin of the contract's CROSS
    JOIN oracle."""
    import numpy as np

    _, ids, M = _load_embeddings(sf_dir)
    n = len(ids)  # oracle n = count of non-null embeddings
    norms = np.sqrt((M * M).sum(axis=1))
    nz = norms > 0
    Vh = M[nz] / norms[nz, None]
    G = Vh.T @ Vh
    fro2 = float((G * G).sum())
    return (["n", "vendi_score"], [(n, round(n * n / fro2, 4))])


def numpy_kcenter(sf_dir: str, k: int = 50):
    """Greedy k-center selection (min-id start, max-squared-distance
    pick, min-id tie-break) replayed over the duckdb-loaded embedding
    matrix — verifies the engine's Spark plumbing (collect, id carry,
    semi-join) at a scale where the recursive-CTE oracle cannot run.
    Squared distance is selection-equivalent to the oracle's euclidean
    (sqrt is monotone; exact ties come from replicated identical
    vectors, where both forms tie exactly)."""
    import numpy as np

    _, ids, X = _load_embeddings(sf_dir)
    k = min(k, len(ids))
    start = int(np.argmin(ids))
    chosen = [start]
    d = ((X - X[start]) ** 2).sum(axis=1)
    for _ in range(1, k):
        d[chosen] = -np.inf
        cand = np.flatnonzero(d == d.max())
        nxt = int(cand[np.argmin(ids[cand])])
        chosen.append(nxt)
        d = np.minimum(d, ((X - X[nxt]) ** 2).sum(axis=1))
    return (["vec_id"], [(int(ids[i]),) for i in chosen])


def numpy_semantic(sf_dir: str, eps: float = 0.05, num_planes: int = 16,
                   num_bands: int = 4, seed: int = 42):
    """Third-family twin of d_semantic (SemDeduplicateFilter): exact
    replication of the engine's semantics in numpy, feasible where the
    contract SQL's in-bucket pair materialization OOMs (the replicated
    sf100 corpus has ~1000 byte-identical copies per vector, so the
    DuckDB twin's bucket join explodes ~quadratically per copy group
    while both the engine and this twin collapse exact duplicates
    first).

    Faithful to dedup.py SemDeduplicateFilter step by step:
    exact-embedding collapse (rep = min vec_id per identical vector) ->
    hyperplane sign-bit band keys on reps (same RandomState(seed)
    standard_normal plane family and (M @ planes.T) > 0 expression as
    functions/vector.hyperplane_bands_udf) -> per-(band, h) bucket STAR
    edges anchored at the bucket-min rep -> exact cosine verify at
    >= 1 - eps with the engine's left-to-right double fold
    (functions/vector.dot is F.aggregate's sequential sum, NOT numpy's
    pairwise reduction) -> union-find components over verified star
    edges (exact-collapse edges cannot change which rep is a component
    minimum: every dup id is > its rep) -> survivors = ids equal to
    their component's min."""
    import numpy as np

    _, ids, M = _load_embeddings(sf_dir)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    # exact-embedding collapse: group byte-identical vectors, rep = min id
    uniq, first_idx = np.unique(
        np.ascontiguousarray(M).view([("", M.dtype)] * M.shape[1]),
        return_index=True)
    rep_idx = np.sort(first_idx)  # ids sorted -> first occurrence = min id
    reps = M[rep_idx]
    rep_ids = ids[rep_idx]
    # engine collapse groups by md5(concat_ws(',', cast(float as string)))
    # — injective for distinct float values, so byte-grouping matches
    key = {tuple(reps[i]): i for i in range(len(rep_idx))}
    rep_of = np.array([key[tuple(M[i])] for i in range(len(ids))],
                      dtype=np.int64)

    width = num_planes // num_bands
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, M.shape[1]))
    bits = (reps @ planes.T) > 0
    weights = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)

    def ltr_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math
    thr = 1.0 - eps
    parent = list(range(len(rep_idx)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    norms = [math.sqrt(ltr_dot(reps[i], reps[i]))
             for i in range(len(rep_idx))]
    for b in range(num_bands):
        h = bits[:, b * width:(b + 1) * width].astype(np.int64) @ weights
        buckets: dict[int, list[int]] = {}
        for i, hv in enumerate(h):
            buckets.setdefault(int(hv), []).append(i)
        for members in buckets.values():
            if len(members) < 2:
                continue
            anchor = members[0]  # reps are id-sorted: first = min id
            for m in members[1:]:
                if norms[anchor] > 0 and norms[m] > 0:
                    cos = ltr_dot(reps[anchor], reps[m]) / (
                        norms[anchor] * norms[m])
                    if cos >= thr:
                        union(anchor, m)

    comp_min = {}
    for i in range(len(rep_idx)):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, rep_ids[r]), rep_ids[i])
    survive = {i for i in range(len(rep_idx))
               if rep_ids[i] == comp_min[find(i)]}
    return (["vec_id"],
            [(int(ids[j]),) for j in range(len(ids))
             if rep_of[j] in survive and ids[j] == rep_ids[rep_of[j]]])


def parquet_diff(name: str, sf_dir: str, oracle_sql: str, sdf):
    """Engine output -> parquet, then a DuckDB EXCEPT ALL multiset diff
    against the contract oracle run over the same sf tables. Exact (no
    float formatting, binary doubles compare bitwise) and streaming —
    for rows where the sweep's collect-and-normalize COMPARE is the
    bottleneck, not either engine."""
    import duckdb
    import shutil
    import tempfile

    base = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".bench_data")
    os.makedirs(base, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"diff_{name}_", dir=base)
    try:
        out_dir = os.path.join(tmp, "engine")
        sdf.write.mode("overwrite").parquet(out_dir)
        cols = ", ".join(sdf.columns)
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.isdir(p):
                p = os.path.join(p, "*.parquet")
            if os.path.exists(os.path.dirname(p)) or os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        con.execute(
            f"CREATE VIEW _engine AS SELECT {cols} FROM "
            f"'{out_dir}/*.parquet'")
        con.execute(f"CREATE VIEW _oracle AS SELECT {cols} FROM "
                    f"({oracle_sql})")
        n_eng, n_ora = con.execute(
            "SELECT (SELECT count(*) FROM _engine), "
            "(SELECT count(*) FROM _oracle)").fetchone()
        n_diff = con.execute(
            "SELECT count(*) FROM ("
            "  (SELECT * FROM _engine EXCEPT ALL SELECT * FROM _oracle)"
            "  UNION ALL "
            "  (SELECT * FROM _oracle EXCEPT ALL SELECT * FROM _engine))"
        ).fetchone()[0]
        con.close()
        return n_eng, n_ora, n_diff
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def quotient_oracle(name: str, sf_dir: str, oracle_sql: str):
    """Run the contract oracle verbatim over the distinct-(text, flags)
    quotient of documents, then fan results back out to all doc_ids."""
    import duckdb

    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    keys = ["text"] + QUOTIENT_KEYS[name]
    out_cols = QUOTIENT_OUT_COLS[name]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_all AS SELECT * FROM '{p}'")
    # one representative doc per quotient class; the oracle may read
    # doc_id ONLY through the listed flags, which the rep shares with
    # every class member by construction
    con.execute(
        "CREATE VIEW documents AS SELECT min(doc_id) AS doc_id, text "
        f"FROM docs_all GROUP BY {', '.join(keys)}")
    con.execute(f"CREATE TABLE rep_out AS {oracle_sql}")
    sel_extra = "".join(f", o.{c}" for c in out_cols)
    res = con.execute(f"""
        SELECT d.doc_id{sel_extra}
        FROM docs_all d
        JOIN documents r
          ON r.text IS NOT DISTINCT FROM d.text
         {' '.join(f'AND ({k.replace("doc_id", "r.doc_id")})'
                   f' = ({k.replace("doc_id", "d.doc_id")})'
                   for k in QUOTIENT_KEYS[name])}
        JOIN rep_out o ON o.doc_id = r.doc_id
    """)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".bench_data/sf10")
    ap.add_argument("--query", default=",".join(
        sorted(PY_QUERIES | NUMPY_QUERIES | DIFF_QUERIES
               | set(QUOTIENT_KEYS))))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    spark = get_spark("brute-text-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    docs = None
    ok = True
    for name in args.query.split(","):
        t0 = time.time()
        if name in DIFF_QUERIES:
            sdf = qs[name](spark, args.sf)
            n_eng, n_ora, n_diff = parquet_diff(
                name, args.sf, oracles[name], sdf)
            dt = time.time() - t0
            if n_diff == 0 and n_eng == n_ora:
                print(f"PASS  {name}: {n_eng} rows exact "
                      f"(parquet multiset diff, {dt:.1f}s)")
            else:
                print(f"FAIL  {name}: engine {n_eng} vs oracle {n_ora} "
                      f"rows, {n_diff} multiset-diff rows ({dt:.1f}s)")
                ok = False
            continue
        if name == "q_pipeline_corpus_curation":
            want_cols, want_rows = brute_corpus_curation(args.sf)
        elif name in PY_QUERIES:
            if docs is None:
                docs = _load_docs(args.sf)
            want_rows = brute_rows(name, docs)
            want_cols = (["doc_id", "cluster_id"]
                         if name == "d_minhash_clusters" else ["doc_id"])
        elif name == "e_vendi_diversity":
            want_cols, want_rows = numpy_vendi(args.sf)
        elif name == "x_kcenter_coreset":
            want_cols, want_rows = numpy_kcenter(args.sf)
        elif name == "d_semantic":
            want_cols, want_rows = numpy_semantic(args.sf)
        elif name in NUMPY_QUERIES:
            want_cols, want_rows = numpy_most_similar(args.sf)
        elif name in QUOTIENT_KEYS:
            want_cols, want_rows = quotient_oracle(
                name, args.sf, oracles[name])
        else:
            raise SystemExit(f"unknown query {name}")
        t_brute = time.time() - t0
        t0 = time.time()
        sdf = qs[name](spark, args.sf)
        got_cols = sdf.columns
        got_rows = [tuple(r) for r in sdf.collect()]
        t_engine = time.time() - t0
        gc, grows = to_rows(got_cols, got_rows)
        wc, wrows = to_rows(want_cols, [tuple(r) for r in want_rows])
        if gc != wc:
            print(f"FAIL  {name}: cols {gc} vs {wc}")
            ok = False
        elif grows != wrows:
            bad = [i for i, (a, b) in enumerate(zip(grows, wrows))
                   if a != b][:3]
            print(f"FAIL  {name}: {len(grows)} vs {len(wrows)} rows; "
                  f"first diffs {[(grows[i], wrows[i]) for i in bad]}")
            ok = False
        else:
            print(f"PASS  {name}: {len(grows)} rows exact "
                  f"(oracle {t_brute:.1f}s, engine {t_engine:.1f}s)")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
