"""Ready-made pipeline builders (reference statics/pipelines parity)."""

import pytest

from dataflow_spark import pipelines as P
from dataflow_spark.serving import MockLLMServing


def test_all_builders_construct():
    mock = MockLLMServing(mode="echo")
    no_args = {"text_pt_filter", "reasoning_cpu", "code_pt_filter",
               "chemistry_smiles"}
    for name, builder in P.PIPELINES.items():
        if name in no_args:
            builder()
        elif name == "text_sft_filter":
            builder(serving=mock)
        elif name == "prompted_core_text":
            for kind in ("eval", "filter", "refine"):
                builder(kind, mock)
        else:
            builder(mock)


def test_text_pt_filter_pipeline_runs(spark, docs):
    pipe = P.text_pt_filter_pipeline()
    out = pipe.forward(docs)
    n = out.count()
    assert 0 <= n <= docs.count()
    assert "text" in out.columns


def test_reasoning_cpu_pipeline_runs(spark):
    rows = [
        (1, "so the answer is \\boxed{4}", "4"),
        (2, "so the answer is \\boxed{9}", "8"),
        (3, "no final marker here", "1"),
    ]
    df = spark.createDataFrame(rows, ["id", "output", "golden_answer"])
    out = P.reasoning_cpu_pipeline().forward(df)
    assert [r.id for r in out.collect()] == [1]


def test_text2sql_pipeline_runs(spark):
    mock = MockLLMServing(
        mode="template",
        template="```sql\nSELECT 1 AS one\n```")
    df = spark.createDataFrame(
        [("db1", "CREATE TABLE t(a INT);")], ["db_id", "schema_ddl"])
    out = P.text2sql_pipeline(mock).forward(df)
    rows = out.collect()
    assert rows and all(r.SQL == "SELECT 1 AS one" for r in rows)
    assert {"sql_hardness", "question", "prompt", "cot"} <= set(out.columns)


def test_kbc_pipeline_runs(spark):
    mock = MockLLMServing(
        mode="template", template="Q: What? A: This.")
    df = spark.createDataFrame(
        [("doc body " * 40,)], ["text"])
    out = P.kbc_pipeline(mock, chunk_size=120).forward(df)
    rows = out.collect()
    assert rows and all(r.question == "What?" for r in rows)


def test_agentic_rag_pipeline_runs(spark):
    mock = MockLLMServing(mode="template", template="task text")
    df = spark.createDataFrame([("source passage",)], ["text"])
    out = P.agentic_rag_pipeline(mock).forward(df)
    assert out.count() >= 1


def test_text_sft_filter_pipeline_runs(spark, docs):
    out = P.text_sft_filter_pipeline().forward(docs.limit(50))
    assert "superfiltering_score" in out.columns
    assert out.count() <= 50


def test_code_pt_filter_pipeline_runs(spark):
    rows = [
        (1, "def add(a, b):\n    \"\"\"Add two numbers together and "
            "return their sum as a value.\"\"\"\n    return a + b\n"
            "result = add(1, 2)\nprint(result)\n"),
        (2, "QUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVo=" * 40),  # base64 blob
    ]
    df = spark.createDataFrame(rows, ["id", "code"])
    out = P.code_pt_filter_pipeline().forward(df)
    ids = [r.id for r in out.collect()]
    assert 2 not in ids  # encoded-data blob filtered


def test_bench_eval_pipeline_runs(spark):
    mock = MockLLMServing(mode="template", template="42")
    df = spark.createDataFrame(
        [("What is 6*7?", "42"), ("What is 2+2?", "4")],
        ["question", "gold"])
    out = P.bench_eval_pipeline(mock).forward(df)
    rows = out.collect()
    # UnifiedBenchDatasetEvaluator aggregates: one accuracy row
    assert len(rows) == 1
    assert rows[0]["n"] == 2 and abs(rows[0]["accuracy"] - 0.5) < 1e-9


def test_reasoning_pretrain_pipeline_runs(spark):
    mock = MockLLMServing(
        mode="template",
        template='{{"judgement_test": true}} Solution: fine \\boxed{{4}}')
    df = spark.createDataFrame(
        [("What is 2+2?", "4")], ["question", "golden_answer"])
    out = P.reasoning_pretrain_pipeline(mock).forward(df)
    rows = out.collect()
    assert rows and "text" in out.columns


def test_chemistry_pipeline_runs(spark):
    df = spark.createDataFrame(
        [("The monomer SMILES is C1=CC=CC=C1 here", "C1=CC=CC=C1")],
        ["text", "gt_smiles"])
    out = P.chemistry_pipeline().forward(df)
    assert out.count() >= 0  # structural: chain compiles and executes


def test_prompted_core_text_pipeline_runs(spark, docs):
    mock = MockLLMServing(mode="template", template="4.5")
    out = P.prompted_core_text_pipeline(
        "eval", mock, prompt_template="Rate: {text}").forward(docs.limit(3))
    assert out.count() == 3
    import pytest

    with pytest.raises(ValueError):
        P.prompted_core_text_pipeline("bogus", mock)
