"""LLM judges, pdf2vqa parsers/formatters, readability stats, and the
MyScale data-JSON column contract."""

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator
from dataflow_spark.serving import MockLLMServing
from dataflow_spark.sources.dbjson import pack_data_column, unpack_data_column


def test_single_score_judges(spark):
    df = spark.createDataFrame([("write an essay",)], ["text"])
    s = MockLLMServing(mode="template", template="I rate this 4 out of 5")
    r = get_operator("AlpagasusSampleEvaluator", {"serving": s}).run(df).first()
    assert r["alpagasus_score"] == 4.0
    r = get_operator("CodeQualitySampleEvaluator", {"serving": s}).run(df).first()
    assert r["code_quality_score"] == 4.0


def test_meta_evaluator_multi_dimension(spark):
    df = spark.createDataFrame([("some text",)], ["text"])
    s = MockLLMServing(mode="template",
                       template="clarity: 4\ncoherence: 3.5\naccuracy: 5\nsafety: 2")
    r = get_operator("MetaSampleEvaluator", {"serving": s}).run(df).first()
    assert (r["meta_clarity"], r["meta_coherence"], r["meta_accuracy"],
            r["meta_safety"]) == (4.0, 3.5, 5.0, 2.0)


def test_instag_evaluator(spark):
    df = spark.createDataFrame([("book a flight",)], ["text"])
    s = MockLLMServing(mode="template", template="travel, booking , flights")
    r = get_operator("InstagSampleEvaluator", {"serving": s}).run(df).first()
    assert r["instag_tags"] == ["travel", "booking", "flights"]
    assert r["instag_count"] == 3


def test_llm_output_parser(spark):
    df = spark.createDataFrame(
        [("Question: what is x?\nAnswer: a number",), ("garbage",)], ["llm_output"])
    rows = get_operator("LLMOutputParser", {}).run(df).collect()
    assert rows[0]["question"] == "what is x?" and rows[0]["answer"] == "a number"
    assert rows[1]["question"] is None


def test_vqa_formatter_and_qa_merger(spark):
    df = spark.createDataFrame([("what?", "this", "/img/1.png")],
                               ["question", "answer", "image_path"])
    conv = get_operator("VQAFormatter", {}).run(df).first()["conversations"]
    assert conv[0]["role"] == "user" and "<image>/img/1.png</image>" in conv[0]["content"]
    assert conv[1]["content"] == "this"

    nested = spark.createDataFrame(
        [(0, [{"question": "q1", "answer": "a1"}, {"question": "q2", "answer": "a2"}])],
        "doc_id long, qa_items array<struct<question:string,answer:string>>")
    rows = get_operator("QAMerger", {}).run(nested).collect()
    assert [(r["qa_index"], r["question"], r["answer"]) for r in rows] == [
        (0, "q1", "a1"), (1, "q2", "a2")]


def test_mathbook_question_extract(spark):
    text = "intro\nProblem 1: solve x\nblah\n2. compute y\nExercise 3. prove z"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = get_operator("MathBookQuestionExtract", {}).run(df).collect()
    got = sorted((r["q_number"], r["question"]) for r in rows)
    assert got == [(1, "solve x"), (2, "compute y"), (3, "prove z")]


def test_langkit_readability(spark):
    df = spark.createDataFrame([("The cat sat. The dog ran!",)], ["text"])
    r = get_operator("LangkitSampleEvaluator", {}).run(df).first()
    assert r["langkit_words"] == 6 and r["langkit_sentences"] == 2
    assert r["langkit_syllables"] == 6
    assert abs(r["langkit_flesch"] - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-3


def test_dbjson_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello", 0.5), (2, "world", 1.5)],
                               ["doc_id", "text", "score"])
    packed = pack_data_column(df, pipeline_id="p1", task_id=3)
    assert set(packed.columns) >= {"data", "pipeline_id", "task_id", "raw_data_id"}
    assert packed.first()["pipeline_id"] == "p1"

    back = unpack_data_column(packed)
    got = sorted((r["doc_id"], r["text"], r["score"])
                 for r in back.select("doc_id", "text", "score").collect())
    assert got == [(1, "hello", 0.5), (2, "world", 1.5)]
