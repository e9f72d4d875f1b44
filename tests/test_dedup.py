"""Dedup semantics: first-occurrence-wins, near-dup clustering."""

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(10, "same text"), (5, "same text"), (7, "other")], ["id", "text"])
    out = get_operator("HashDeduplicateFilter",
                       {"input_keys": "text", "order_key": "id"}).run(df)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [5, 7]  # min id of each duplicate group survives


def test_exact_dedup_multi_column(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y")], ["id", "t1", "t2"])
    out = get_operator("HashDeduplicateFilter",
                       {"input_keys": ["t1", "t2"], "order_key": "id"}).run(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_ccnet_dedup_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World 123!"), (2, "hello world"), (3, "different")],
        ["id", "text"])
    out = get_operator("CCNetDeduplicateFilter",
                       {"input_key": "text", "order_key": "id"}).run(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_minhash_removes_near_dups(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find some food for its cubs " * 3)
    near = base.replace("green", "blue")
    rows = [(1, base), (2, near), (3, "a completely different text about "
            "spark engines and distributed computation at large scale " * 4)]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = get_operator("MinHashDeduplicateFilter",
                       {"input_key": "text", "order_key": "id",
                        "threshold": 0.7}).run(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_simhash_removes_near_dups(spark):
    # long, varied text: a one-token edit flips only a few of the 64
    # simhash bits (simhash is coarse on short texts by construction)
    base = " ".join(f"alpha{i} beta{i*7%97} gamma{i*13%83}" for i in range(120))
    near = base.replace("alpha57", "alphaXX")
    other = " ".join(f"delta{i*3%71} epsilon{i*11%89}" for i in range(120))
    rows = [(1, base), (2, near), (3, other)]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = get_operator("SimHashDeduplicateFilter",
                       {"input_key": "text", "order_key": "id"}).run(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_sem_dedup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-identical direction
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["id", "embedding"])
    df = df.withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = get_operator("SemDeduplicateFilter",
                       {"embedding_key": "embedding", "order_key": "id",
                        "eps": 0.01, "num_planes": 8, "num_bands": 4}).run(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_connected_components(spark):
    from dataflow_spark.operators.filters.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (10, 11)], ["src", "dst"])
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[8] == comp[9] == comp[10] == comp[11] == 8


def test_near_dup_bucket_cap_degenerate_corpus(spark):
    """10k identical docs land in one LSH bucket; the bucket-size cap
    switches to chain expansion (N-1 edges, not N^2/2) and still
    collapses the cluster to its first row in bounded time."""
    import time

    from dataflow_spark.operators.filters.dedup import MinHashDeduplicateFilter

    n = 10_000
    df = spark.range(n).selectExpr(
        "id AS doc_id",
        "'the same exact document body repeated verbatim for every row' AS text")
    op = MinHashDeduplicateFilter(order_key="doc_id", pair_expansion="all")
    op.max_bucket_size = 100  # force the chain fallback inside 'all' mode
    t0 = time.time()
    out = op.run(df)
    kept = out.select("doc_id").collect()
    assert [r.doc_id for r in kept] == [0]
    assert time.time() - t0 < 120


def test_pair_expansion_modes_agree(spark):
    """Star and all-pairs expansion find the same duplicate clusters on
    a well-separated corpus."""
    from dataflow_spark.operators.filters.dedup import MinHashDeduplicateFilter

    rows = []
    for g in range(20):
        base = f"group {g} document about topic {g} with shared content body {'x' * g}"
        for r in range(5):
            rows.append((g * 10 + r, base + f" tail{r}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2)
    kept_star = {r.doc_id for r in MinHashDeduplicateFilter(
        order_key="doc_id", threshold=0.5).run(df).collect()}
    kept_all = {r.doc_id for r in MinHashDeduplicateFilter(
        order_key="doc_id", threshold=0.5,
        pair_expansion="all").run(df).collect()}
    assert kept_star == kept_all


def test_simhash_pair_expansion_modes_agree(spark):
    """Star and all-pairs expansion agree for SimHash under the r10
    carried-signature verify (the Hamming filter is fused into both
    expansion forms, including the oversized-bucket chain fallback)."""
    from dataflow_spark.operators.filters.dedup import SimHashDeduplicateFilter

    rows = []
    for g in range(12):
        base = " ".join(
            f"tok{g}_{i} word{(g * 31 + i) % 97}" for i in range(150))
        rows.append((g * 10, base))
        rows.append((g * 10 + 1, base.replace(f"tok{g}_7", "tokXX")))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2)
    kept_star = {r.doc_id for r in SimHashDeduplicateFilter(
        order_key="doc_id").run(df).collect()}
    op_all = SimHashDeduplicateFilter(order_key="doc_id",
                                      pair_expansion="all")
    kept_all = {r.doc_id for r in op_all.run(df).collect()}
    assert kept_star == kept_all
    # oversized-bucket chain fallback: chain edges verify pairwise, so
    # it is a recall-bounded fallback (documented) — but identical docs
    # still collapse through the exact-signature edges regardless of
    # the expansion form
    dup_rows = [(i, "the very same document body for every row")
                for i in range(6)]
    ddf = spark.createDataFrame(dup_rows, ["doc_id", "text"])
    op_chain = SimHashDeduplicateFilter(order_key="doc_id",
                                        pair_expansion="all")
    op_chain.max_bucket_size = 1
    assert [r.doc_id for r in
            op_chain.run(ddf).select("doc_id").collect()] == [0]


def test_star_contraction_matches_union_find(spark):
    """Distributed large-star/small-star path (forced via
    driver_max_edges=0) agrees with the driver union-find on chains
    (the high-diameter shape min-label propagation struggles with),
    cliques, stars, and a seeded random graph."""
    import random

    from dataflow_spark.operators.filters.dedup import connected_components

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(100, 400)]          # diameter 300
    clique = [(a, b) for a in range(500, 510) for b in range(a + 1, 510)]
    star = [(600, v) for v in range(601, 640)]
    rand = [(rng.randrange(0, 80), rng.randrange(0, 80)) for _ in range(120)]
    edges = [(a, b) for a, b in chain + clique + star + rand if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])

    want = {r["id"]: r["component"]
            for r in connected_components(df).collect()}          # driver path
    got = {r["id"]: r["component"]
           for r in connected_components(df, driver_max_edges=0).collect()}
    assert got == want
    # chain label is its min despite diameter >> round count
    assert got[400] == 100


def test_minhash_md5_mode_matches_fast_semantics(spark):
    """hash_impl='md5' (the oracle-replicable family) finds the same
    obvious near-dup clusters as the production splitmix64 family."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find some food for its cubs " * 3)
    # near-dup with jaccard ~0.99 (one char dropped): solidly above the
    # 0.9 LSH threshold for ANY hash family (at j~=0.9 band collision is
    # a coin flip, so a word-swap pair would be family-dependent)
    rows = [(1, base), (2, base[:-1]),
            (3, "a completely different text about spark engines and "
                "distributed computation at large scale " * 4)]
    df = spark.createDataFrame(rows, ["id", "text"])
    for impl in ("fast", "md5"):
        out = get_operator("MinHashDeduplicateFilter",
                           {"input_key": "text", "order_key": "id",
                            "hash_impl": impl}).run(df)
        assert sorted(r["id"] for r in out.collect()) == [1, 3], impl


def test_simhash_md5_mode_matches_fast_semantics(spark):
    base = ("large scale distributed data processing with apache spark "
            "query optimization and columnar storage " * 5)
    rows = [(1, base), (2, base + "x"), (3, "entirely unrelated content "
            "about cooking pasta with tomato sauce and fresh basil " * 5)]
    df = spark.createDataFrame(rows, ["id", "text"])
    for impl in ("fast", "md5"):
        out = get_operator("SimHashDeduplicateFilter",
                           {"input_key": "text", "order_key": "id",
                            "hash_impl": impl}).run(df)
        assert sorted(r["id"] for r in out.collect()) == [1, 3], impl


def test_minhash_md5_handles_empty_and_short(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab"), (4, "ab")], ["id", "text"])
    out = get_operator("MinHashDeduplicateFilter",
                       {"input_key": "text", "order_key": "id",
                        "hash_impl": "md5"}).run(df)
    # "" and None hash identically ([0]*perm) -> first (id 1) survives;
    # "ab" dupes collapse to id 3
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_minhash_md5_udf_matches_kernel(spark):
    """The memoized iterator-form UDF (r9) must be bit-identical to the
    module-level ``minhash_md5_one`` oracle kernel — duplicates in the
    batch exercise the text memo, shared grams the gram memo, and the
    short/empty rows the edge paths."""
    from dataflow_spark.functions import hashing as H

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "the quick brown fox jumps over the lazy dog",  # text-memo hit
             "ab", "", "xyzzy plugh"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    got = {r["id"]: list(r["sig"]) for r in df.select(
        "id", H.minhash_md5_udf(64, 5)(F.col("text")).alias("sig")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == H.minhash_md5_one(t, num_perm=64, n=5), t


def test_simhash_md5_udf_matches_kernel(spark):
    """Same bit-identity pin for the memoized simhash md5 UDF."""
    from dataflow_spark.functions import hashing as H

    texts = ["large scale distributed data processing with spark",
             "large scale distributed data processing with sparc",
             "large scale distributed data processing with spark",
             "ab", "", "xyzzy plugh"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    got = {r["id"]: r["sh"] for r in df.select(
        "id", H.simhash_md5_udf(4)(F.col("text")).alias("sh")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == H.simhash_md5_one(t, n=4), t


def test_near_dup_degenerate_mass_duplicates(spark):
    """5000 byte-identical docs + 2 distinct: exact-signature collapse
    keeps every LSH bucket at distinct-signature size (no giant
    collect_list task) and survivors are the 3 true representatives."""
    rows = [(i, "exactly the same spam document body repeated verbatim " * 5)
            for i in range(5000)]
    rows += [(5000, "a unique document about distributed query engines " * 5),
             (5001, "another unique document about columnar storage " * 5)]
    df = spark.createDataFrame(rows, ["id", "text"])
    for op_name in ("MinHashDeduplicateFilter", "SimHashDeduplicateFilter"):
        out = get_operator(op_name, {"input_key": "text",
                                     "order_key": "id"}).run(df)
        ids = sorted(r["id"] for r in out.collect())
        assert ids == [0, 5000, 5001], op_name


def test_sem_dedup_degenerate_mass_duplicates(spark):
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(3000)]
    rows += [(3000, [-4.0, 3.0, -2.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = get_operator("SemDeduplicateFilter",
                       {"embedding_key": "embedding", "order_key": "id",
                        "eps": 0.01}).run(df)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [0, 3000]


class TestClusterAssignment:
    def test_assign_mode_consistent_with_filter_mode(self, spark):
        from dataflow_spark.core.registry import get_operator

        base = "the quick brown fox jumps over the lazy dog " * 8
        rows = [
            (1, base + "tail one"),
            (2, base + "tail two"),     # near-dup of 1
            (3, "a completely different document about spark " * 10),
            (4, base + "tail one"),     # exact dup of 1
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        common = {"input_key": "text", "order_key": "doc_id",
                  "threshold": 0.7}
        assigned = get_operator("MinHashDeduplicateFilter",
                                {**common, "assign_key": "cluster_id"}).run(df)
        out = {r["doc_id"]: r["cluster_id"] for r in assigned.collect()}
        # all rows kept, near/exact dups share doc 1's cluster
        assert set(out) == {1, 2, 3, 4}
        assert out[1] == out[2] == out[4] == 1
        assert out[3] == 3
        # survivors of filter mode == rows whose cluster_id == doc_id
        kept = sorted(r["doc_id"] for r in
                      get_operator("MinHashDeduplicateFilter", common)
                      .run(df).collect())
        assert kept == sorted(d for d, c in out.items() if d == c)


def test_incremental_minhash(spark):
    from dataflow_spark.core.registry import get_operator

    base_text = ("the quick brown fox jumps over the lazy dog again and "
                 "again until everyone is thoroughly bored of it")
    existing = spark.createDataFrame(
        [(100, base_text), (101, "completely unrelated archive entry "
                                 "about database compaction strategy")],
        ["doc_id", "text"])
    new = spark.createDataFrame([
        (1, base_text + "!"),                       # near-dup of existing 100
        (2, "a genuinely fresh document about distributed minhash"),
        (3, "a genuinely fresh document about distributed minhash."),  # near-dup of 2
        (4, "another novel row mentioning watermarks and state stores"),
    ], ["doc_id", "text"])
    op = get_operator("IncrementalMinHashDedupFilter", {
        "input_key": "text", "order_key": "doc_id", "threshold": 0.7})
    kept = sorted(r["doc_id"] for r in
                  op.run(new, existing=existing).collect())
    # 1 dies against the archive; 3 dies against 2 in-batch
    assert kept == [2, 4]
    import pytest as _pt
    with _pt.raises(ValueError):
        op.run(new)


def test_minhash_auto_banding(spark):
    """num_bands='auto' picks the S-curve-optimal (b, r) (datasketch-
    canonical values) and the filter still deduplicates correctly."""
    from dataflow_spark.core.registry import get_operator
    from dataflow_spark.functions.hashing import optimal_bands

    assert optimal_bands(0.9, 128) == (5, 25)   # datasketch's answer
    assert optimal_bands(0.5, 64) == (14, 4)
    # cases where the full (b, r) search beats restricting r to
    # num_perm // b (regression for the exhaustive search)
    assert optimal_bands(0.8, 64) == (5, 11)
    assert optimal_bands(0.1, 64) == (15, 1)

    op = get_operator("MinHashDeduplicateFilter", {
        "input_key": "text", "order_key": "doc_id",
        "threshold": 0.9, "num_bands": "auto"})
    assert (op.num_bands, op.rows_per_band) == optimal_bands(0.9, 64)
    assert op.num_bands * op.rows_per_band <= 64

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again in the summer meadow ") * 3
    rows = [(0, base), (1, base + "tail!"), (2, "completely different "
            "content about distributed query engines and shuffles " * 3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(r.doc_id for r in op.run(df).collect())
    assert kept == [0, 2]


def test_keep_first_tied_order_key_returns_coherent_row(spark):
    # Non-unique caller order_key: ADVICE r6 — independent per-column
    # min_by could stitch columns from DIFFERENT tied rows into a row
    # that never existed. With the engine row-id tie-breaker, the
    # survivor must be exactly one input row (earliest ingest order
    # among the tied minimum-order rows).
    rows = [(1, "dup", "alpha", 100), (1, "dup", "beta", 200),
            (2, "dup", "gamma", 300), (5, "solo", "delta", 400)]
    df = spark.createDataFrame(rows, ["ok", "text", "tag", "val"])
    out = get_operator("HashDeduplicateFilter",
                       {"input_keys": "text", "order_key": "ok"}).run(df)
    got = {(r["ok"], r["text"], r["tag"], r["val"]) for r in out.collect()}
    assert (5, "solo", "delta", 400) in got
    dup_winner = next(t for t in got if t[1] == "dup")
    # coherence: the winner is one of the two ok=1 INPUT rows, never a
    # (1, 'dup', 'alpha', 200)-style mix
    assert dup_winner in {(1, "dup", "alpha", 100), (1, "dup", "beta", 200)}
    assert len(got) == 2
    # no engine column leaks
    assert out.columns == ["ok", "text", "tag", "val"]


def test_ngram_dedup_drops_engine_row_id(spark):
    # regression: NgramHashDeduplicateFilter returned without _finish,
    # leaking _row_id once the tie-breaker attach landed (r7)
    df = spark.createDataFrame([(1, "abcdefgh"), (2, "abcdefgh"),
                                (3, "zzzzyyyy")], ["id", "text"])
    out = get_operator("NgramHashDeduplicateFilter",
                       {"input_key": "text", "order_key": "id"}).run(df)
    assert out.columns == ["id", "text"]
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_user_row_id_survives_explicit_order_key(spark):
    """ADVICE r7: an input legitimately carrying a user _row_id column
    alongside an explicit order_key must keep that column — only an
    ENGINE-added _row_id is dropped by _finish."""
    df = spark.createDataFrame([(1, "a", 10), (2, "a", 20), (3, "b", 30)],
                               ["doc_id", "text", "_row_id"])
    out = get_operator("HashDeduplicateFilter",
                       {"input_keys": "text", "order_key": "doc_id"}).run(df)
    assert "_row_id" in out.columns
    assert {(r["doc_id"], r["_row_id"]) for r in out.collect()} == \
        {(1, 10), (3, 30)}


def test_sql_band_twins_match_column_forms(spark):
    """r9: the *_sql single-parse twins must stay value-identical to
    the Column-API band builders they replaced on the hot paths."""
    from pyspark.sql import functions as F

    from dataflow_spark.functions import hashing as H

    sig = [[i * 7 + j for j in range(8)] for i in range(5)]
    df = spark.createDataFrame([(s,) for s in sig], ["_sig"])
    for col_form, sql_form in [
        (H.band_hashes(F.col("_sig"), 4, 2), H.band_hashes_sql("_sig", 4, 2)),
        (H.band_keys_plain(F.col("_sig"), 4, 2),
         H.band_keys_plain_sql("_sig", 4, 2)),
    ]:
        a = df.select(col_form.alias("b")).collect()
        b = df.select(F.expr(sql_form).alias("b")).collect()
        assert a == b
    sim = spark.createDataFrame([(x,) for x in [0, 1, -1, (1 << 62) + 5]],
                                "s long")
    a = sim.select(H.simhash_bands(F.col("s")).alias("b")).collect()
    b = sim.select(F.expr(H.simhash_bands_sql("s")).alias("b")).collect()
    assert a == b
