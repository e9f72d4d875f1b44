"""Corpus segment dedup, Gopher repetition scores, split assignment."""

import pytest

from dataflow_spark.core.registry import get_operator


class TestCorpusSegmentDedup:
    def test_lines_keep_first(self, spark):
        rows = [
            (1, "intro one\nshared boilerplate line\nunique alpha"),
            (2, "shared boilerplate line\nunique beta"),
            (3, "unique gamma\nshared boilerplate line"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup", {"mode": "lines"})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        # first occurrence (doc 1, pos 1) survives; later ones removed
        assert out[1] == "intro one\nshared boilerplate line\nunique alpha"
        assert out[2] == "unique beta"
        assert out[3] == "unique gamma"

    def test_lines_keep_none(self, spark):
        rows = [(1, "dup line\nkeep a"), (2, "dup line\nkeep b")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup", {"mode": "lines",
                                                 "keep": "none"})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert out == {1: "keep a", 2: "keep b"}

    def test_fully_deduped_doc_becomes_empty(self, spark):
        rows = [(1, "only line"), (2, "only line")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup", {"mode": "lines",
                                                 "keep": "none"})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert out == {1: "", 2: ""}

    def test_blank_segments_normalized(self, spark):
        df = spark.createDataFrame([(1, "a\n\n\nb")], ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup", {"mode": "lines"})
        assert op.run(df).collect()[0]["text"] == "a\nb"

    def test_words_mode(self, spark):
        # 4-word windows: doc 1 and 2 share their first window exactly
        rows = [
            (1, "w1 w2 w3 w4 tail one"),
            (2, "w1 w2 w3 w4 tail two"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup",
                          {"mode": "words", "segment_words": 4})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert out[1] == "w1 w2 w3 w4 tail one"
        assert out[2] == "tail two"

    def test_min_dup_threshold(self, spark):
        rows = [(i, "twice line" if i < 2 else "thrice line")
                for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup",
                          {"mode": "lines", "keep": "none", "min_dup": 3})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert out[0] == "twice line"  # only 2 occurrences: below min_dup
        assert out[2] == ""

    def test_other_columns_preserved(self, spark):
        df = spark.createDataFrame([(1, "x", "src")], ["doc_id", "text", "source"])
        out = get_operator("CorpusSegmentDedup", {"mode": "lines"}).run(df)
        assert set(out.columns) == {"doc_id", "text", "source"}


class TestGopherRepetition:
    def test_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "spam spam spam spam"),
             (2, "all words here are fully distinct tokens"),
             (3, "")],
            ["doc_id", "text"])
        op = get_operator("GopherRepetitionEvaluator",
                          {"n": 2, "segment_words": 2})
        out = {r["doc_id"]: r for r in op.run(df).collect()}
        # doc 1: grams ["spam spam"] x3 -> top = dup = 1.0;
        # segments ["spam spam", "spam spam"] -> dup_segment_frac 0.5
        assert out[1]["top_ngram_char_frac"] == pytest.approx(1.0)
        assert out[1]["dup_ngram_char_frac"] == pytest.approx(1.0)
        assert out[1]["dup_segment_frac"] == pytest.approx(0.5)
        # doc 2: no repeated 2-grams
        assert out[2]["dup_ngram_char_frac"] == 0.0
        assert out[2]["dup_segment_frac"] == 0.0
        assert 0 < out[2]["top_ngram_char_frac"] < 0.5
        # empty text scores 0 across the board
        assert out[3]["top_ngram_char_frac"] == 0.0

    def test_short_doc_single_gram(self, spark):
        df = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
        out = get_operator("GopherRepetitionEvaluator", {"n": 3}).run(df)
        r = out.collect()[0]
        # single whole-text gram: it IS the top gram, not a duplicate
        assert r["top_ngram_char_frac"] == 1.0
        assert r["dup_ngram_char_frac"] == 0.0


class TestSplitAssign:
    def test_fractions_and_determinism(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
        op = get_operator("SplitAssignOperator", {"hash_impl": "md5"})
        out = op.run(df)
        by = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
        assert by["train"] + by.get("val", 0) + by.get("test", 0) == 2000
        assert 1700 <= by["train"] <= 1890
        again = {r["doc_id"]: r["split"] for r in op.run(df).collect()}
        first = {r["doc_id"]: r["split"] for r in out.collect()}
        assert again == first

    def test_every_row_labeled(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
        op = get_operator("SplitAssignOperator",
                          {"splits": {"a": 1.0, "b": 1.0, "c": 1.0}})
        out = op.run(df)
        assert out.filter(out["split"].isNull()).count() == 0
        assert out.select("split").distinct().count() == 3

    def test_validation(self):
        with pytest.raises(ValueError):
            get_operator("SplitAssignOperator", {"splits": {"only": 1.0}})


class TestDegenerateCorpus:
    def test_all_identical_docs(self, spark):
        # 500 byte-identical docs: every segment is a corpus-wide dup;
        # keep-first leaves exactly one doc's text intact
        rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(500)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup",
                          {"mode": "words", "segment_words": 3})
        out = {r["doc_id"]: r["text"] for r in op.run(df).collect()}
        assert len(out) == 500
        assert out[0] == "alpha beta gamma delta epsilon zeta"
        assert all(t == "" for d, t in out.items() if d != 0)

    def test_idempotent(self, spark):
        rows = [(1, "shared line\nown a"), (2, "shared line\nown b")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        op = get_operator("CorpusSegmentDedup", {"mode": "lines"})
        once = op.run(df)
        twice = op.run(once)
        assert sorted((r["doc_id"], r["text"]) for r in once.collect()) == \
               sorted((r["doc_id"], r["text"]) for r in twice.collect())
