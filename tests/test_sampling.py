"""Deterministic hash sampling + token-budget shard packing."""

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator


def test_hash_sample_deterministic_and_monotone(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    keep10 = get_operator("HashSampleFilter", {"rate": 0.10}).run(df)
    keep20 = get_operator("HashSampleFilter", {"rate": 0.20}).run(df)
    s10 = {r.doc_id for r in keep10.collect()}
    s10_again = {r.doc_id for r in keep10.collect()}
    s20 = {r.doc_id for r in keep20.collect()}
    assert s10 == s10_again                      # run-to-run stable
    assert s10 <= s20                            # monotone rates
    assert 0.05 < len(s10) / 2000 < 0.15         # roughly the asked rate
    assert 0.14 < len(s20) / 2000 < 0.26


def test_hash_sample_md5_matches_python(spark):
    import hashlib

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = get_operator("HashSampleFilter",
                       {"rate": 0.1, "hash_impl": "md5"}).run(df)
    got = sorted(r.doc_id for r in out.collect())
    want = sorted(
        i for i in range(500)
        if int(hashlib.md5(f"sample{i}".encode()).hexdigest()[:15], 16)
        % 10000 < 1000)
    assert got == want


def test_sequence_packing_bins_respect_budget_offsets(spark):
    rows = [(i, 100) for i in range(10)]         # 10 docs x 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = get_operator("SequencePackingOperator",
                       {"budget": 300, "num_shards": 1}).run(df)
    packs = {r.doc_id: r.pack_id for r in out.collect()}
    # single shard, ordered by doc_id: start offsets 0,100,...,900 ->
    # bins 0,0,0,1,1,1,2,2,2,3
    assert [packs[i] for i in range(10)] == [
        "0-0", "0-0", "0-0", "0-1", "0-1", "0-1",
        "0-2", "0-2", "0-2", "0-3"]


def test_sequence_packing_sharded_no_global_sort(spark):
    df = spark.createDataFrame([(i, 50) for i in range(400)],
                               "doc_id long, n_tokens long")
    out = get_operator("SequencePackingOperator",
                       {"budget": 500, "num_shards": 4}).run(df)
    rows = out.collect()
    shards = {r.pack_id.split("-")[0] for r in rows}
    assert shards == {"0", "1", "2", "3"}
    # within any pack, token sum never exceeds budget + one row's tokens
    from collections import Counter

    per_pack = Counter(r.pack_id for r in rows)
    assert all(n * 50 <= 500 + 50 for n in per_pack.values())


def test_weighted_hash_sample(spark):
    from pyspark.sql import functions as F

    from dataflow_spark.core.registry import get_operator

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        # two weight classes: heavy rows weigh 9x the light ones
        F.when(F.col("id") % 2 == 0, 90).otherwise(10).alias("w"))
    op = get_operator("WeightedHashSampleFilter", {
        "key": "doc_id", "weight_key": "w", "rate": 0.1})
    kept = op.run(df).collect()
    frac = len(kept) / 20000
    assert 0.08 < frac < 0.12  # expected fraction ~ rate
    heavy = sum(1 for r in kept if r["w"] == 90)
    light = len(kept) - heavy
    # heavy rows should be sampled ~9x as often
    assert heavy > 5 * max(light, 1)
    # deterministic across runs
    again = op.run(df).collect()
    assert sorted(r["doc_id"] for r in kept) == \
        sorted(r["doc_id"] for r in again)
