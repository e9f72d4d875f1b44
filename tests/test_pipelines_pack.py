"""Ready-made pipeline builders (reference statics/pipelines parity)."""

import pytest

from dataflow_spark import pipelines as P
from dataflow_spark.serving import MockLLMServing


def test_all_builders_construct():
    mock = MockLLMServing(mode="echo")
    for name, builder in P.PIPELINES.items():
        if name in ("text_pt_filter",):
            builder()
        elif name == "reasoning_cpu":
            builder()
        elif name == "text_sft_filter":
            builder(serving=mock)
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
