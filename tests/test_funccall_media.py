"""Func-call family, VQA/ASR generators, misc LLM generators, and the
unigram perplexity evaluator."""

import math

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator
from dataflow_spark.serving import MockLLMServing


def test_funccall_chain(spark):
    s = MockLLMServing(mode="hash")
    df = spark.createDataFrame([("book a flight",), ("order pizza",)], ["chat"])
    out = get_operator("ScenarioExtractor", {"serving": s}).run(df)
    out = get_operator("ScenarioExpander", {"serving": s, "n": 2}).run(out)
    assert out.count() == 4 and "orig_scenario" in out.columns
    out = get_operator("AtomTaskGenerator", {"serving": s}).run(out)
    out = get_operator("SequentialTaskGenerator", {"serving": s}).run(out)
    out = get_operator("ParaSeqTaskGenerator", {"serving": s}).run(out)
    out = get_operator("FunctionGenerator", {"serving": s}).run(out)
    row = out.first()
    for c in ["scenario", "atom_task", "subsequent_task", "composition_task",
              "parallel_task", "paraseq_task", "functions"]:
        assert row[c], c


def test_consistent_chat_generator(spark):
    s = MockLLMServing(mode="template", template="say {prompt:.10s}")
    op = get_operator("ConsistentChatGenerator", {"serving": s, "num_per_topic": 1,
                                                  "rounds": 1})
    out = op.run(spark.range(1))
    rows = out.collect()
    assert len(rows) == 8  # one per topic
    conv = rows[0]["conversations"]
    assert [t["role"] for t in conv] == ["user", "assistant"]


def test_vqa_and_speech(spark):
    s = MockLLMServing(mode="hash")
    df = spark.createDataFrame([("what is shown?", bytearray(b"imgbytes"))],
                               ["prompt", "content"])
    r = get_operator("PromptedVQAGenerator", {"serving": s}).run(df).first()
    assert r["vqa_answer"].startswith("resp-")
    r2 = get_operator("Speech2TextGenerator", {"serving": s}).run(df).first()
    assert r2["transcription"].startswith("resp-")
    # determinism: same bytes -> same answer
    r3 = get_operator("Speech2TextGenerator", {"serving": s}).run(df).first()
    assert r2["transcription"] == r3["transcription"]


def test_bench_answer_and_phi4(spark):
    df = spark.createDataFrame([("what is 2+2?",)], ["question"])
    ans = get_operator("BenchAnswerGenerator", {
        "serving": MockLLMServing(mode="template", template="the answer is 4")
    }).run(df).first()
    assert ans["model_answer"] == "4"

    docs = spark.createDataFrame([("spark is fast",)], ["text"])
    qa = get_operator("Phi4QAGenerator", {"serving": MockLLMServing(mode="hash")
                                          }).run(docs).first()
    assert qa["question"].startswith("resp-") and qa["answer"].startswith("resp-")


def test_multihop_and_condor(spark):
    s = MockLLMServing(mode="hash")
    docs = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    mh = get_operator("Text2MultiHopQAGenerator", {"serving": s}).run(docs).first()
    assert mh["mh_question"].startswith("resp-") and mh["mh_answer"].startswith("resp-")

    ans = spark.createDataFrame([("rough answer",)], ["answer"])
    ref = get_operator("CondorRefiner", {"serving": s}).run(ans).first()
    assert ref["answer"].startswith("resp-") and ref["answer"] != "rough answer"


def test_perplexity_unigram(spark):
    # corpus: "a a a b" -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(0, "a a a"), (1, "b")], ["i", "text"])
    out = {r["i"]: r["perplexity"] for r in
           get_operator("PerplexitySampleEvaluator", {"order_key": "i"}
                        ).run(df).collect()}
    assert abs(out[0] - 4 / 3) < 1e-9        # exp(-ln(3/4))
    assert abs(out[1] - 4.0) < 1e-9          # exp(-ln(1/4))

    kept = get_operator("PerplexityFilter", {"max_score": 2.0, "order_key": "i"}
                        ).run(df).collect()
    assert [r["i"] for r in kept] == [0]


def test_image_resizer_plumbing(spark):
    import hashlib

    from pyspark.sql import functions as F

    from dataflow_spark.core.registry import get_operator

    df = spark.createDataFrame([(1, b"imgbytes-a"), (2, b"imgbytes-b"), (3, None)],
                               "id long, content binary")
    out = get_operator("ImageResizer", {"target_w": 32, "target_h": 16}).run(df)
    rows = {r.id: r for r in out.collect()}
    n = 32 * 16 // 8
    assert all(len(rows[i].resized) == n for i in (1, 2, 3))
    assert rows[1].resized_w == 32 and rows[1].resized_h == 16
    seed = hashlib.sha256(b"imgbytes-a" + b"32x16").digest()
    assert bytes(rows[1].resized) == (seed * (n // len(seed) + 1))[:n]
    # null content resizes deterministically too
    seed3 = hashlib.sha256(b"" + b"32x16").digest()
    assert bytes(rows[3].resized) == (seed3 * (n // len(seed3) + 1))[:n]
