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

PY_QUERIES = {"d_minhash_lsh", "d_simhash", "d_minhash_clusters"}
NUMPY_QUERIES = {"s_most_similar"}
# quotient rep keys beyond text: doc_id-derived flags the oracle reads
QUOTIENT_KEYS: dict[str, list[str]] = {
    "t_langid": [],
    "f_stop_word": [],
    "t_language_filter": [],
    "x_reasoning_ngram_filter": [],
    "q_pipeline_text_filter": ["doc_id % 31 = 0", "doc_id % 37 = 0",
                               "doc_id % 41 = 0", "doc_id % 43 = 0"],
}
# which columns beyond doc_id the query outputs (joined back by rep id)
QUOTIENT_OUT_COLS: dict[str, list[str]] = {
    "t_langid": ["pred_lang"],
    "f_stop_word": [],
    "t_language_filter": [],
    "x_reasoning_ngram_filter": ["repetition_score"],
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
    raise SystemExit(f"no python oracle for {name}")


def numpy_most_similar(sf_dir: str):
    """Chunked float64 GEMM top-1 oracle for s_most_similar: every
    vector's highest-cosine neighbor, ties to the smaller id (the
    contract's ORDER BY cos DESC, id ASC), cosine rounded to 4. Exact
    ties (the replicated corpus has byte-identical vectors) produce
    bitwise-equal cosines in any correct implementation, so the id
    tie-break is implementation-independent."""
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
    blk = 4096
    for lo in range(0, n, blk):
        q = M[lo:lo + blk]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = (q @ M.T) / (norms[lo:lo + blk, None] * norms[None, :])
        cos[:, zero] = -np.inf
        for i in range(cos.shape[0]):
            cos[i, lo + i] = -np.inf  # self excluded
        # argmax with tie -> smallest id: ids are sorted ascending, and
        # np.argmax returns the FIRST maximal index
        j = np.argmax(cos, axis=1)
        best_id[lo:lo + blk] = ids[j]
        best_cos[lo:lo + blk] = cos[np.arange(cos.shape[0]), j]
    return (["query_id", "neighbor_id", "cosine_sim"],
            [(int(ids[i]), int(best_id[i]), round(float(best_cos[i]), 4))
             for i in range(n) if not zero[i] and best_cos[i] != -np.inf])


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
        sorted(PY_QUERIES | NUMPY_QUERIES | set(QUOTIENT_KEYS))))
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
        if name in PY_QUERIES:
            if docs is None:
                docs = _load_docs(args.sf)
            want_rows = brute_rows(name, docs)
            want_cols = (["doc_id", "cluster_id"]
                         if name == "d_minhash_clusters" else ["doc_id"])
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
