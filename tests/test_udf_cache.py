"""The session-keyed UDF memo (functions/udf_cache.py, r9): reusing one
UserDefinedFunction object per (session, key) skips the per-plan-build
JVM registration. These tests pin its contract: identity within a
session, behavior identical to a fresh build, key discrimination, and
the no-session / unhashable-key fallbacks."""

import pytest

from dataflow_spark.functions import hashing as H
from dataflow_spark.functions import vector as V
from dataflow_spark.functions.udf_cache import _UDFS, session_udf


def test_same_key_same_object_within_session(spark):
    u1 = H.minhash64_udf(64, 5, 42)
    u2 = H.minhash64_udf(64, 5, 42)
    assert u1 is u2
    s1 = H.simhash64_udf(4)
    assert s1 is H.simhash64_udf(4)
    b1 = V.hyperplane_bands_udf(16, 4, 42)
    assert b1 is V.hyperplane_bands_udf(16, 4, 42)


def test_different_key_different_object(spark):
    assert H.minhash64_udf(64, 5, 42) is not H.minhash64_udf(64, 4, 42)
    assert H.minhash64_udf(64, 5, 42) is not H.minhash64_udf(32, 5, 42)
    assert H.simhash_md5_udf(4) is not H.simhash_md5_udf(5)


def test_memoized_udf_matches_fresh_build(spark):
    """Same signatures bit-for-bit from the cached object and a fresh
    (unmemoized) build — the memo may never change results."""
    df = spark.createDataFrame(
        [("the quick brown fox",), ("jumps over",), ("", ), (None,)],
        ["text"])
    memo = df.select(H.minhash64_udf(16, 5, 42)("text").alias("s")).collect()
    fresh = df.select(
        H._minhash64_udf_build(16, 5, 42)("text").alias("s")).collect()
    assert memo == fresh
    memo_md5 = df.select(H.minhash_md5_udf(8, 5)("text").alias("s")).collect()
    fresh_md5 = df.select(
        H._minhash_md5_udf_build(8, 5)("text").alias("s")).collect()
    assert memo_md5 == fresh_md5


def test_cache_is_keyed_by_session_object(spark):
    """Entries live in a per-session dict inside a WeakKeyDictionary, so
    a new session can never see another session's JVM handles."""
    H.minhash64_udf(64, 5, 42)
    assert spark in _UDFS
    assert ("hashing.minhash64_udf", 64, 5, 42) in _UDFS[spark]


def test_no_active_session_builds_fresh(spark, monkeypatch):
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "getActiveSession",
                        classmethod(lambda cls: None))
    calls = []
    out1 = session_udf(("k",), lambda: calls.append(1) or object())
    out2 = session_udf(("k",), lambda: calls.append(1) or object())
    assert out1 is not out2 and len(calls) == 2


def test_unhashable_key_builds_fresh(spark):
    calls = []
    k = (["not", "hashable"],)
    out1 = session_udf(k, lambda: calls.append(1) or object())
    out2 = session_udf(k, lambda: calls.append(1) or object())
    assert out1 is not out2 and len(calls) == 2
