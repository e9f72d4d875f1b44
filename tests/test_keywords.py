"""TF-IDF keywords, unigram KL divergence, word truncation."""

import pytest

from dataflow_spark.core.registry import get_operator


class TestTfIdfKeywords:
    def test_rare_terms_win(self, spark):
        rows = [
            (1, "common common zebra"),
            (2, "common common yak"),
            (3, "common common common"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("TfIdfKeywordsEvaluator", {"k": 1})
        out = {r["doc_id"]: r["keywords"] for r in op.run(df).collect()}
        # 'zebra'/'yak' df=1 -> idf 2.0; 'common' tf=2 df=3 -> 2*1.0
        # zebra: 1*4/2=2.0 == common 2*4/4=2.0 -> tie breaks by term asc
        assert out[1] == ["common"]
        assert out[3] == ["common"]
        op5 = get_operator("TfIdfKeywordsEvaluator", {"k": 5})
        out5 = {r["doc_id"]: r["keywords"] for r in op5.run(df).collect()}
        assert out5[1] == ["common", "zebra"]

    def test_empty_doc_gets_empty_list(self, spark):
        df = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
        out = {r["doc_id"]: r["keywords"]
               for r in get_operator("TfIdfKeywordsEvaluator", {}).run(df).collect()}
        assert out[2] == []
        assert sorted(out[1]) == ["a", "b"]


class TestUnigramKL:
    def test_identical_distributions_zero(self, spark):
        df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        op = get_operator("UnigramKLDivergenceEvaluator", {})
        kl = op.run(df, other=df).collect()[0]["kl_divergence"]
        assert kl == pytest.approx(0.0, abs=1e-12)

    def test_divergent_positive_and_asymmetric(self, spark):
        a = spark.createDataFrame([(1, "alpha alpha alpha beta")], ["i", "text"])
        b = spark.createDataFrame([(1, "gamma gamma delta")], ["i", "text"])
        op = get_operator("UnigramKLDivergenceEvaluator", {})
        kl_ab = op.run(a, other=b).collect()[0]["kl_divergence"]
        kl_ba = op.run(b, other=a).collect()[0]["kl_divergence"]
        assert kl_ab > 0.1
        assert kl_ab != pytest.approx(kl_ba)

    def test_requires_other(self, spark):
        df = spark.createDataFrame([(1, "x")], ["i", "text"])
        with pytest.raises(ValueError):
            get_operator("UnigramKLDivergenceEvaluator", {}).run(df)


class TestTruncateWords:
    def test_caps_and_normalizes(self, spark):
        df = spark.createDataFrame(
            [(1, "one  two\tthree four five"), (2, "short")],
            ["doc_id", "text"])
        op = get_operator("TruncateWordsRefiner", {"max_words": 3})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert out[1] == "one two three"
        assert out[2] == "short"
