"""Caches must not outlive one operator invocation.

Spark's CacheManager substitutes a cached plan into ANY later query
whose analyzed plan ``sameResult``-matches it. An operator that persists
a deterministic intermediate and never unpersists it therefore makes
every subsequent invocation over the same input silently read the first
invocation's rows instead of recomputing — re-executions must compute
from source (the bench and the oracle both rely on that), and the cache
must not accumulate across a long session.

Guard: after a near-dup run() returns, the session holds zero cached
RDDs and the CacheManager is empty; a mixture-sampler ``cache_input``
run leaves no CacheManager entry either (it materializes via
localCheckpoint, which is invocation-local by construction).
"""

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator


def _n_cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def docs(spark):
    rows = [(i, f"some shared boilerplate text piece number {i % 7} "
                f"with a distinct tail {i}") for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_run_leaves_no_cache(spark, docs):
    spark.catalog.clearCache()  # isolate from other tests' cache state
    base = _n_cached_rdds(spark)  # lingering checkpoint blocks allowed
    op = get_operator("MinHashDeduplicateFilter",
                      {"input_key": "text", "order_key": "doc_id"})
    out1 = op.run(docs)
    assert _n_cached_rdds(spark) <= base
    assert _cache_manager_empty(spark)
    n1 = out1.count()
    # second invocation recomputes and agrees (nothing cached to serve it)
    out2 = op.run(docs)
    assert _n_cached_rdds(spark) <= base
    assert out2.count() == n1


def test_simhash_run_leaves_no_cache(spark, docs):
    spark.catalog.clearCache()  # isolate from other tests' cache state
    base = _n_cached_rdds(spark)  # lingering checkpoint blocks allowed
    op = get_operator("SimHashDeduplicateFilter",
                      {"input_key": "text", "order_key": "doc_id"})
    out = op.run(docs)
    assert _n_cached_rdds(spark) <= base
    assert _cache_manager_empty(spark)
    out.count()
    assert _n_cached_rdds(spark) <= base


def test_incremental_minhash_run_leaves_no_cache(spark, docs):
    spark.catalog.clearCache()  # isolate from other tests' cache state
    op = get_operator("IncrementalMinHashDedupFilter",
                      {"input_key": "text", "order_key": "doc_id"})
    existing = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    out1 = op.run(new, existing=existing)
    # the signature persists are released inside run() (the eager
    # matched checkpoint is their last consumer); only checkpoint
    # blocks may remain, and those are never CacheManager-matched
    assert _cache_manager_empty(spark)
    n1 = out1.count()
    out2 = op.run(new, existing=existing)
    assert _cache_manager_empty(spark)
    assert out2.count() == n1


def test_mixture_sampler_cache_input_no_cache_manager_entry(spark):
    spark.catalog.clearCache()  # isolate from other tests' cache state
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    op = get_operator("DomainMixtureSampler", {
        "weights": {"a": 0.5, "b": 0.3, "c": 0.2}, "cache_input": True})
    out_cached = op.run(df.withColumn("doc_id", F.col("doc_id")))
    assert _cache_manager_empty(spark)
    op_plain = get_operator("DomainMixtureSampler", {
        "weights": {"a": 0.5, "b": 0.3, "c": 0.2}})
    out_plain = op_plain.run(df)
    # cache_input changes materialization, never results
    a = sorted(r.doc_id for r in out_cached.collect())
    b = sorted(r.doc_id for r in out_plain.collect())
    assert a == b
