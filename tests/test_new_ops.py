"""PDFMerger, CodeCodeToInstruction, question fusion/judges, and the
unified + question-level bench evaluators."""

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator
from dataflow_spark.serving import MockLLMServing


def test_pdf_merger_orders_pages(spark):
    rows = [(1, 2, "second"), (1, 1, "first"), (2, 1, "only")]
    df = spark.createDataFrame(rows, ["doc_id", "page", "text"])
    out = {r["doc_id"]: r for r in
           get_operator("PDFMerger", {}).run(df).collect()}
    assert out[1]["text"] == "first\n\nsecond"
    assert out[1]["n_pages"] == 2
    assert out[2]["text"] == "only"


def test_code_to_instruction(spark):
    df = spark.createDataFrame([("print(1)",)], ["code"])
    s = MockLLMServing(mode="template", template="prints one")
    r = get_operator("CodeCodeToInstructionGenerator", {"serving": s}).run(df).first()
    assert r["back_instruction"] == "prints one"


def test_question_fusion_groups_in_order(spark):
    rows = [(i, f"q{i}") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "question"])
    s = MockLLMServing(mode="echo")
    out = get_operator("ReasoningQuestionFusionGenerator",
                       {"serving": s, "fuse_n": 2}).run(df)
    got = {r["fuse_group"]: r["fused_question"] for r in out.collect()}
    assert got[0].endswith("q0 ||| q1")
    assert got[1].endswith("q2 ||| q3")
    # dense-key bucketing must agree on dense ids
    out2 = get_operator("ReasoningQuestionFusionGenerator",
                        {"serving": s, "fuse_n": 2, "dense_keys": True}).run(df)
    got2 = {r["fuse_group"]: r["fused_question"] for r in out2.collect()}
    assert got == got2


def test_question_difficulty_and_solvable(spark):
    df = spark.createDataFrame([("hard one",)], ["question"])
    s = MockLLMServing(mode="template", template="difficulty: 7")
    r = get_operator("ReasoningQuestionDifficultySampleEvaluator",
                     {"serving": s}).run(df).first()
    assert r["difficulty_score"] == 7.0
    s = MockLLMServing(mode="template", template="Yes, clearly.")
    r = get_operator("ReasoningQuestionSolvableSampleEvaluator",
                     {"serving": s}).run(df).first()
    assert r["solvable"] is True


def test_unified_bench_modes(spark):
    rows = [("The Answer!", "the answer"), ("3.0", "3"), ("nope", "yes")]
    df = spark.createDataFrame(rows, ["answer", "gold"])
    acc = lambda mode: get_operator(
        "UnifiedBenchDatasetEvaluator", {"match_mode": mode}
    ).run(df).first()["accuracy"]
    assert acc("exact") == round(1 / 3, 6)
    assert acc("numeric") == round(1 / 3, 6)
    assert acc("contains") == round(2 / 3, 6)  # '3.0' contains '3'


def test_unified_bench_group_breakdown(spark):
    rows = [("a", "a", "g1"), ("b", "x", "g1"), ("c", "c", "g2")]
    df = spark.createDataFrame(rows, ["answer", "gold", "subject"])
    out = {r["subject"]: r["accuracy"] for r in get_operator(
        "UnifiedBenchDatasetEvaluator", {"group_key": "subject"}).run(df).collect()}
    assert out == {"g1": 0.5, "g2": 1.0}


def test_question_level_accuracy(spark):
    rows = [(1, "a", "a"), (1, "b", "a"), (2, "x", "y")]
    df = spark.createDataFrame(rows, ["question_id", "answer", "gold"])
    r = get_operator("BenchDatasetEvaluatorQuestion", {}).run(df).first()
    assert (r["n_questions"], r["accuracy"]) == (2, 0.5)  # q1 any-correct
    r = get_operator("BenchDatasetEvaluatorQuestion",
                     {"require_all": True}).run(df).first()
    assert (r["n_questions"], r["accuracy"]) == (2, 0.0)


def test_reference_name_aliases():
    from dataflow_spark.core.registry import OPERATOR_REGISTRY, get_operator

    assert type(get_operator("PDF_Merger", {})).__name__ == "PDFMerger"
    assert type(get_operator("KBCChunkGenerator", {})).__name__ == "ChunkGenerator"
    assert "PandasOperator" in OPERATOR_REGISTRY
    # aliases do not pollute the canonical listing
    assert "PDF_Merger" not in OPERATOR_REGISTRY.keys()
