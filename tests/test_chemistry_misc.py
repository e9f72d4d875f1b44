"""Chemistry ops, LLMLanguageFilter, funccall judge, Task2Vec proxy."""

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator
from dataflow_spark.serving import MockLLMServing


def test_extract_smiles(spark):
    df = spark.createDataFrame(
        [(0, "aspirin is CC(=O)OC1=CC=CC=C1C(=O)O in water"),
         (1, "no chemistry words here at all")], ["i", "text"])
    rows = {r["i"]: r["smiles"] for r in
            get_operator("ExtractSmilesFromTextGenerator", {}).run(df).collect()}
    assert rows[0] == "CC(=O)OC1=CC=CC=C1C(=O)O"
    assert rows[1] is None


def test_smiles_equivalence_fallback(spark):
    df = spark.createDataFrame(
        [("CCO", "CCO"), ("C C O", "CCO"), ("CCN", "CCO")],
        ["smiles", "gt_smiles"])
    r = get_operator("SmilesEquivalenceDatasetEvaluator", {}).run(df).first()
    assert r["n"] == 3 and abs(r["smiles_accuracy"] - 2 / 3) < 1e-6


def test_llm_language_filter(spark):
    df = spark.createDataFrame([("hello world",), ("bonjour le monde",)], ["text"])
    keep_all = get_operator("LLMLanguageFilter", {
        "serving": MockLLMServing(mode="template", template="en"),
        "allowed_languages": ["en"]}).run(df)
    assert keep_all.count() == 2
    keep_none = get_operator("LLMLanguageFilter", {
        "serving": MockLLMServing(mode="template", template="fr"),
        "allowed_languages": ["en"]}).run(df)
    assert keep_none.count() == 0


def test_funccall_conversation_judge(spark):
    df = spark.createDataFrame([("user: x assistant: call(f)",)], ["text"])
    r = get_operator("FuncCallConversationSampleEvaluator", {
        "serving": MockLLMServing(mode="template", template="5")}).run(df).first()
    assert r["funccall_quality_score"] == 5.0


def test_task2vec_proxy(spark):
    same = spark.createDataFrame([([1.0, 0.0, 0.0],)] * 9, "embedding: array<double>")
    mixed = spark.createDataFrame(
        [([1.0, 0.0, 0.0],), ([0.0, 1.0, 0.0],), ([0.0, 0.0, 1.0],)] * 3,
        "embedding: array<double>")
    d_same = get_operator("Task2VecDatasetEvaluator", {}).run(same).first()
    d_mixed = get_operator("Task2VecDatasetEvaluator", {}).run(mixed).first()
    assert d_same["task2vec_diversity"] == 0.0
    assert d_mixed["task2vec_diversity"] > 0.0
