"""Decontamination, domain-mixture sampling, incremental dedup."""

import pytest

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "pack my box with five dozen liquor jugs", "web"),
        (3, "a completely unrelated sentence about spark engines", "books"),
        (4, "the quick brown fox sleeps all day long", "books"),
        (5, "short text", "code"),
        (6, "", "code"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [("what does the quick brown fox do",),
         ("nothing in common here xyzzy",)], ["text"])


class TestContamination:
    def test_scores(self, corpus, bench):
        op = get_operator("ContaminationScoreEvaluator",
                          {"n": 3, "hash_impl": "md5"})
        out = {r["doc_id"]: r for r in op.run(corpus, benchmark=bench).collect()}
        # doc 1: grams "the quick brown", "quick brown fox" match bench
        assert out[1]["matched_ngrams"] == 2
        assert out[1]["total_ngrams"] == 7
        assert out[1]["overlap_frac"] == pytest.approx(2 / 7)
        assert out[2]["matched_ngrams"] == 0
        # doc 4 shares the same two leading grams
        assert out[4]["matched_ngrams"] == 2
        # short text (<n words) -> single whole-text gram, no match
        assert out[5]["total_ngrams"] == 1
        assert out[5]["matched_ngrams"] == 0
        # empty text -> zero grams, zero frac (no NaN/null)
        assert out[6]["total_ngrams"] == 0
        assert out[6]["overlap_frac"] == 0.0

    def test_strict_filter_anti_join_path(self, corpus, bench):
        op = get_operator("BenchmarkDecontaminationFilter", {"n": 3})
        kept = sorted(r["doc_id"] for r in
                      op.run(corpus, benchmark=bench).collect())
        assert kept == [2, 3, 5, 6]
        # strict path keeps the original schema untouched
        assert op.run(corpus, benchmark=bench).columns == corpus.columns

    def test_frac_threshold(self, corpus, bench):
        # doc 1: 2/7 ~ 0.286 <= 0.3 survives; doc 4: 2/6 ~ 0.333 > 0.3 dropped
        op = get_operator("BenchmarkDecontaminationFilter",
                          {"n": 3, "max_matches": 10**9, "max_frac": 0.3,
                           "keep_scores": True})
        out = op.run(corpus, benchmark=bench)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 5, 6]
        assert "overlap_frac" in out.columns
        strict = get_operator("BenchmarkDecontaminationFilter",
                              {"n": 3, "max_matches": 10**9, "max_frac": 0.2})
        assert sorted(r["doc_id"] for r in
                      strict.run(corpus, benchmark=bench).collect()) == [2, 3, 5, 6]

    def test_fast_and_md5_agree(self, corpus, bench):
        a = get_operator("BenchmarkDecontaminationFilter",
                         {"n": 3, "hash_impl": "fast"})
        b = get_operator("BenchmarkDecontaminationFilter",
                         {"n": 3, "hash_impl": "md5"})
        ka = sorted(r["doc_id"] for r in a.run(corpus, benchmark=bench).collect())
        kb = sorted(r["doc_id"] for r in b.run(corpus, benchmark=bench).collect())
        assert ka == kb


class TestDomainMixture:
    def test_rates_match_weights(self, spark):
        rows = [(i, "web" if i < 800 else ("books" if i < 900 else "code"))
                for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        op = get_operator("DomainMixtureSampler", {
            "weights": {"web": 0.5, "books": 0.25, "code": 0.25}})
        got = op.run(df).groupBy("source").count().collect()
        by = {r["source"]: r["count"] for r in got}
        # binding group: books and code (100 rows / 0.25 share -> T=400)
        # web keeps 200/800 = 25%, books+code keep everything
        assert by["books"] == 100
        assert by["code"] == 100
        assert 160 <= by["web"] <= 240  # hash sampling is rate-exact only in expectation

    def test_absent_groups_dropped_and_deterministic(self, spark):
        rows = [(i, ["web", "books", "junk"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        op = get_operator("DomainMixtureSampler",
                          {"weights": {"web": 1.0, "books": 1.0},
                           "hash_impl": "md5"})
        out1 = sorted(r["doc_id"] for r in op.run(df).collect())
        out2 = sorted(r["doc_id"] for r in op.run(df).collect())
        assert out1 == out2
        assert all(i % 3 != 2 for i in out1)

    def test_validation(self):
        with pytest.raises(ValueError):
            get_operator("DomainMixtureSampler", {"weights": {}})
        with pytest.raises(ValueError):
            get_operator("DomainMixtureSampler", {"weights": {"a": -1.0}})


class TestIncrementalDedup:
    def test_drops_existing_then_inbatch(self, spark):
        existing = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], ["doc_id", "text"])
        new = spark.createDataFrame(
            [(10, "alpha"),   # already in corpus -> dropped
             (11, "gamma"), (12, "gamma"),  # in-batch dup -> keep first
             (13, "delta")], ["doc_id", "text"])
        op = get_operator("IncrementalHashDedupFilter",
                          {"order_key": "doc_id"})
        kept = sorted(r["doc_id"] for r in
                      op.run(new, existing=existing).collect())
        assert kept == [11, 13]

    def test_requires_existing(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            get_operator("IncrementalHashDedupFilter", {}).run(df)


class TestNullSafety:
    def test_null_text_rows_survive(self, spark):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        schema = StructType([StructField("doc_id", LongType()),
                             StructField("text", StringType())])
        df = spark.createDataFrame([(1, "alpha beta gamma delta"),
                                    (2, None)], schema)
        bench = spark.createDataFrame([("nothing shared here at all",)],
                                      ["text"])
        scored = get_operator("ContaminationScoreEvaluator",
                              {"n": 3}).run(df, benchmark=bench)
        out = {r["doc_id"]: r for r in scored.collect()}
        assert out[2]["total_ngrams"] == 0
        assert out[2]["overlap_frac"] == 0.0
        kept = get_operator("BenchmarkDecontaminationFilter",
                            {"n": 3}).run(df, benchmark=bench)
        assert kept.count() == 2

    def test_segment_dedup_null_text(self, spark):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        schema = StructType([StructField("doc_id", LongType()),
                             StructField("text", StringType())])
        df = spark.createDataFrame([(1, "keep me"), (2, None)], schema)
        out = {r["doc_id"]: r["text"]
               for r in get_operator("CorpusSegmentDedup",
                                     {"mode": "lines"}).run(df).collect()}
        assert out == {1: "keep me", 2: ""}
