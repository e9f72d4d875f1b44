"""Fourth-decade (sf100) value-exact oracle for ``d_ngram_hash``.

The contract oracle (DuckDB: md5 over the sorted distinct 5-gram set
per doc, keep-first) is infeasible at 5M documents — shingling 5M
~3KB texts inside one SQL expression was measured unrunnable at r8.
But the sf100 replica is ALGEBRAIC: ``text_r = base_text + " #r{r}"``
for replica r>=1 (r=0 keeps the base; tools/make_scaled_data.py), so
the shingle set factors:

    shingles(B + S) = shingles(B)  ∪  shingles(B[-4:] + S)

(every 5-gram window either lies entirely inside B or overlaps the
suffix, and the overlapping windows are exactly the windows of the
4-char base tail plus S). The oracle therefore shingles each of the
5,000 BASE texts once, and per replica touches only the ~|S|+4
boundary windows — a quotient evaluation in the style of
tools/brute_text_oracle.py, single-threaded, no Spark, no shared code
path with the engine (which computes per-row Column expressions).

Keep-first replay order: doc_id = base_id + r*STRIDE with base_id <<
STRIDE, so ascending doc_id is (r asc, base_id asc).

Usage: python tools/sf100_ngram_hash_oracle.py
           [--src /root/testdata/sf0.1] [--sf .bench_data/sf100]
           [--factor 1000] [--n 5]
Exits 0 iff the engine survivor set matches the replay exactly.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
from bisect import insort

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 100_000_000


def shingles(text: str, n: int) -> list[str]:
    if len(text) < n:
        return [text]
    return [text[i:i + n] for i in range(len(text) - n + 1)]


def replay_survivors(src: str, factor: int, n: int) -> set[int]:
    import duckdb

    p = os.path.join(src, "documents.parquet")
    if os.path.isdir(p):
        p = os.path.join(p, "*.parquet")
    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text FROM '{p}' ORDER BY doc_id").fetchall()
    con.close()

    # per base text: sorted distinct shingle list + membership set,
    # computed ONCE (the quotient step)
    prepped = []
    for doc_id, text in base:
        s0 = sorted(set(shingles(text, n)))
        prepped.append((int(doc_id), text, s0, set(s0)))

    seen: set[bytes] = set()
    survivors: set[int] = set()
    t0 = time.time()
    for r in range(factor):
        suffix = "" if r == 0 else f" #r{r}"
        for doc_id, text, s0, s0set in prepped:
            if not suffix:
                merged = s0
            elif len(text) < n:
                # tiny base: the contract's whole-string fallback zone
                # may be LEFT by the suffixed text — recompute exactly
                merged = sorted(set(shingles(text + suffix, n)))
            else:
                new = [g for g in set(shingles(text[-(n - 1):] + suffix,
                                               n))
                       if g not in s0set]
                if new:
                    merged = list(s0)
                    for g in new:
                        insort(merged, g)
                else:
                    merged = s0
            sig = hashlib.md5("".join(merged).encode()).digest()
            if sig not in seen:
                seen.add(sig)
                survivors.add(doc_id + r * STRIDE)
        if r % 100 == 0:
            print(f"  replay r={r}: {len(survivors)} survivors "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return survivors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--sf", default=".bench_data/sf100")
    ap.add_argument("--factor", type=int, default=1000)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--cache", default="",
                    help="path to save/load the replay survivor set "
                         "(lets the 1-core replay run while Spark "
                         "work occupies the box)")
    ap.add_argument("--replay-only", action="store_true")
    args = ap.parse_args()

    if args.cache and os.path.exists(args.cache):
        import pickle
        with open(args.cache, "rb") as f:
            want, t_oracle = pickle.load(f)
        print(f"replay oracle (cached): {len(want)} survivors "
              f"({t_oracle:.1f}s recorded)", flush=True)
    else:
        t0 = time.time()
        want = replay_survivors(args.src, args.factor, args.n)
        t_oracle = time.time() - t0
        print(f"replay oracle: {len(want)} survivors in {t_oracle:.1f}s",
              flush=True)
        if args.cache:
            import pickle
            with open(args.cache, "wb") as f:
                pickle.dump((want, t_oracle), f)
    if args.replay_only:
        return 0

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    spark = get_spark("sf100-ngram-hash", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    got = {int(r[0]) for r in
           entrymod.queries()["d_ngram_hash"](spark, args.sf).collect()}
    t_engine = time.time() - t0
    spark.stop()

    missing = sorted(want - got)[:5]
    extra = sorted(got - want)[:5]
    if got == want:
        print(f"PASS  d_ngram_hash sf100: {len(got)} survivors exact "
              f"(engine {t_engine:.1f}s, replay oracle {t_oracle:.1f}s)")
        return 0
    print(f"FAIL  d_ngram_hash sf100: engine {len(got)} vs oracle "
          f"{len(want)}; missing={missing} extra={extra}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
