"""r9 evidence run for ``on_budget_exceeded='minhash'`` (judge ask #2).

The refusal trio (q_fuzzy_join, q_containment_join, d_ngram_jaccard)
refuses the exact path at sf10 by design (the replica corpus is
degenerate: ~quadratic candidate sets). The opt-in MinHash fallback
had pytest-scale recall evidence only. This tool records:

1. **sf10 completion**: each operator with on_budget_exceeded='minhash'
   on the sf10 replica — wall + output counts (the exact path refuses
   here, so completion itself is the claim);
2. **sf1 recall**: the same fallback FORCED (budgets shrunk to 1 so the
   exact path refuses at a scale the brute oracle handles), pair sets
   compared against tools/brute_fuzzy_oracle's independent BLAS
   cross-join — recall = |fallback ∩ brute| / |brute|; precision must
   be 1.0 (the fallback verifies candidates with the exact metric).
   For the dedup filter, survivor-set agreement vs the brute
   keep-first-of-component replay.

Usage: python tools/fallback_recall_sweep.py [--sf10 .bench_data/sf10]
           [--sf1 .bench_data/sf1] [--skip-sf10] [--skip-sf1]
One JSON line per measurement, ledger-compatible (src=r9-fallback).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.brute_fuzzy_oracle import (brute_dedup_survivors, brute_pairs,
                                      load_documents, shingle_set)  # noqa: E402

#: budget overrides that force BudgetExceededError on any corpus, so
#: the sf1 recall run exercises the SAME fallback code path sf10 takes
FORCE = {"max_candidate_pairs": 1, "dense_flop_budget": 1,
         "on_budget_exceeded": "minhash"}


def _ops(get_operator, force: bool):
    ov = FORCE if force else {"on_budget_exceeded": "minhash"}
    return {
        "q_fuzzy_join": get_operator("FuzzyJoinOperator", {
            "threshold": 0.8, "mode": "char", "shingle_n": 5, **ov}),
        "q_containment_join": get_operator("FuzzyJoinOperator", {
            "threshold": 0.9, "mode": "char", "shingle_n": 5,
            "metric": "containment", **ov}),
        "d_ngram_jaccard": get_operator("NgramJaccardDeduplicateFilter", {
            "input_key": "text", "threshold": 0.8, "order_key": "doc_id",
            **ov}),
    }


def _inputs(spark, sf_dir: str, name: str):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if name == "q_fuzzy_join":
        return (docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1))
    if name == "q_containment_join":
        left = (docs.filter(F.col("doc_id") % 10 == 0)
                .select("doc_id", F.substring("text", 1, 40).alias("text")))
        return (left, docs)
    return (docs, None)


def run_sf10(spark, get_operator, sf10: str):
    ops = _ops(get_operator, force=False)
    for name, op in ops.items():
        left, right = _inputs(spark, sf10, name)
        t0 = time.time()
        if right is not None:
            n = op.run(left, right=right).count()
        else:
            n = op.run(left).select("doc_id").count()
        print(json.dumps({
            "name": name, "status": "PASS",
            "detail": f"{n} rows via minhash fallback (exact path "
                      "refuses at this scale)",
            "sec": round(time.time() - t0, 1), "src": "r9-fallback"}),
            flush=True)


def run_sf1_recall(spark, get_operator, sf1: str):
    docs = load_documents(sf1)
    ops = _ops(get_operator, force=True)

    for name in ("q_fuzzy_join", "q_containment_join"):
        left_df, right_df = _inputs(spark, sf1, name)
        t0 = time.time()
        eng = {(int(r[0]), int(r[1]))
               for r in ops[name].run(left_df, right=right_df).collect()}
        wall = time.time() - t0
        if name == "q_fuzzy_join":
            left = [(i, shingle_set(t)) for i, t in docs if i % 2 == 0]
            right = [(i, shingle_set(t)) for i, t in docs if i % 2 == 1]
            thr, metric = 0.8, "jaccard"
        else:
            left = [(i, shingle_set(t[:40])) for i, t in docs if i % 10 == 0]
            right = [(i, shingle_set(t)) for i, t in docs]
            thr, metric = 0.9, "containment"
        brute = {(a, b) for a, b, _ in
                 brute_pairs(left, right, thr, metric, 300_000)}
        inter = len(eng & brute)
        print(json.dumps({
            "name": name, "status": "RECALL",
            "recall": round(inter / len(brute), 4) if brute else None,
            "precision": round(inter / len(eng), 4) if eng else None,
            "fallback_pairs": len(eng), "brute_pairs": len(brute),
            "sec": round(wall, 1), "src": "r9-fallback"}), flush=True)

    t0 = time.time()
    docs_df, _ = _inputs(spark, sf1, "d_ngram_jaccard")
    eng_surv = {int(r[0]) for r in
                ops["d_ngram_jaccard"].run(docs_df)
                .select("doc_id").collect()}
    wall = time.time() - t0
    brute_surv = brute_dedup_survivors(docs, 0.8, 300_000)
    print(json.dumps({
        "name": "d_ngram_jaccard", "status": "RECALL",
        "survivor_agreement": round(
            len(eng_surv & brute_surv) / len(eng_surv | brute_surv), 4),
        "fallback_survivors": len(eng_surv),
        "brute_survivors": len(brute_surv),
        "extra_kept": len(eng_surv - brute_surv),
        "wrongly_dropped": len(brute_surv - eng_surv),
        "sec": round(wall, 1), "src": "r9-fallback"}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default=".bench_data/sf10")
    ap.add_argument("--sf1", default=".bench_data/sf1")
    ap.add_argument("--skip-sf10", action="store_true")
    ap.add_argument("--skip-sf1", action="store_true")
    args = ap.parse_args()

    from dataflow_spark import get_spark
    from dataflow_spark.core.registry import get_operator

    spark = get_spark("fallback-sweep", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_sf10:
        run_sf10(spark, get_operator, args.sf10)
    if not args.skip_sf1:
        run_sf1_recall(spark, get_operator, args.sf1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
