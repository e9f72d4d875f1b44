"""NgramJaccardDeduplicateFilter: exact PPJoin self-join dedup, both
execution paths (sparse prefix-filter join / dense bitset matmul)
against a quadratic brute-force reference with the same keep-first-of-
connected-component semantics."""

import itertools

import pytest

from dataflow_spark.core.registry import get_operator


def _shingles(t, n=4):
    return ({t[i:i + n] for i in range(len(t) - n + 1)}
            if len(t) >= n else {t})


def _brute_survivors(rows, t, n=4):
    """Keep-first over connected components of the >=t Jaccard graph."""
    ids = [i for i, _ in rows]
    sets = {i: _shingles(txt, n) for i, txt in rows}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        sa, sb = sets[a], sets[b]
        if len(sa & sb) / len(sa | sb) >= t:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i for i in ids if find(i) == i}


@pytest.mark.parametrize("dense", [8192, 0], ids=["dense", "sparse"])
@pytest.mark.parametrize("t", [0.5, 0.8])
def test_matches_bruteforce_components(spark, dense, t):
    import random

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    base = [" ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9)))
            for _ in range(20)]
    # plant near-duplicates: copies and light edits of the bases
    rows = []
    i = 0
    for b in base:
        rows.append((i, b)); i += 1
        if rng.random() < 0.6:
            rows.append((i, b)); i += 1
        if rng.random() < 0.4:
            rows.append((i, b + " " + rng.choice(vocab))); i += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    op = get_operator("NgramJaccardDeduplicateFilter", {
        "input_key": "text", "threshold": t, "shingle_n": 4,
        "order_key": "doc_id", "dense_vocab_max": dense})
    got = {r["doc_id"] for r in op.run(df).collect()}
    assert got == _brute_survivors(rows, t)


def test_dense_path_engages(spark):
    """Tiny vocab -> _dense_edges returns a MapInPandas edge plan (the
    final operator plan hides it: connected_components resolves small
    edge sets eagerly via the driver union-find)."""
    from pyspark.sql import functions as F

    from dataflow_spark.functions import hashing as H

    rows = [(i, f"alpha beta gamma {i % 3}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with_sh = df.select(
        F.col("doc_id").alias("_nd_id"),
        F.array_sort(F.array_distinct(F.transform(
            H.char_shingles(F.col("text"), 4),
            lambda s: F.xxhash64(s)))).alias("_sh"))
    op = get_operator("NgramJaccardDeduplicateFilter", {
        "input_key": "text", "threshold": 0.8, "shingle_n": 4,
        "order_key": "doc_id"})
    edges = op._dense_edges(with_sh)
    assert edges is not None
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    # and the guard: a vocab cap below the corpus vocab falls back
    op_sparse = get_operator("NgramJaccardDeduplicateFilter", {
        "input_key": "text", "threshold": 0.8, "shingle_n": 4,
        "order_key": "doc_id", "dense_vocab_max": 2})
    assert op_sparse._dense_edges(with_sh) is None


def test_candidate_pair_guard_refuses_degenerate_corpus(spark):
    import pytest

    # every doc shares one long template -> every prefix bucket holds
    # ~all docs; with the guard tightened the operator must refuse with
    # an actionable error instead of attempting the quadratic join
    rows = [(i, "the same template text repeated " * 4 + str(i % 3))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    op = get_operator("NgramJaccardDeduplicateFilter",
                      {"input_key": "text", "order_key": "doc_id",
                       "dense_vocab_max": 0,       # force sparse path
                       "max_candidate_pairs": 1000})
    with pytest.raises(ValueError, match="low-entropy"):
        op.run(df).count()
    # guard off -> same corpus completes on the sparse path
    op2 = get_operator("NgramJaccardDeduplicateFilter",
                       {"input_key": "text", "order_key": "doc_id",
                        "dense_vocab_max": 0, "max_candidate_pairs": 0})
    assert op2.run(df).count() > 0


def test_flop_budget_refuses_and_minhash_fallback_matches_exact(spark):
    """r8: dense byte-feasible but compute-infeasible corpora refuse
    fast (BudgetExceededError) by default; on_budget_exceeded='minhash'
    completes with exact-verified edges, so survivors match the exact
    path on a size both handle."""
    import pytest

    rows = [(i, "the same template text repeated " * 4 + str(i % 3))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    common = {"input_key": "text", "order_key": "doc_id",
              "dense_flop_budget": 1e4}  # 200^2 * vocab >> 1e4
    with pytest.raises(ValueError, match="on_budget_exceeded"):
        get_operator("NgramJaccardDeduplicateFilter", common).run(df).count()
    fb = get_operator("NgramJaccardDeduplicateFilter",
                      {**common, "on_budget_exceeded": "minhash"})
    got = sorted(r["doc_id"] for r in fb.run(df).collect())
    exact = get_operator("NgramJaccardDeduplicateFilter",
                         {"input_key": "text", "order_key": "doc_id"})
    want = sorted(r["doc_id"] for r in exact.run(df).collect())
    assert got == want


def test_sparse_guard_routes_to_minhash_fallback(spark):
    """The candidate-pair guard (sparse path) also honors the fallback
    policy instead of raising."""
    rows = [(i, "the same template text repeated " * 4 + str(i % 3))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fb = get_operator("NgramJaccardDeduplicateFilter",
                      {"input_key": "text", "order_key": "doc_id",
                       "dense_vocab_max": 0, "max_candidate_pairs": 1000,
                       "on_budget_exceeded": "minhash"})
    got = sorted(r["doc_id"] for r in fb.run(df).collect())
    exact = get_operator("NgramJaccardDeduplicateFilter",
                         {"input_key": "text", "order_key": "doc_id",
                          "dense_vocab_max": 0, "max_candidate_pairs": 0})
    want = sorted(r["doc_id"] for r in exact.run(df).collect())
    assert got == want
