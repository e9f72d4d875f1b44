"""Exercise the model scorers' ``backend="hf"`` seam against a stub.

The container has no torch/transformers, so the real weights can't
load — but the seam itself (worker-side lazy import, per-executor model
singleton, Arrow batch -> classifier list call -> score extraction) is
all plain code that a minimal fake ``transformers`` module can drive.
The stub is shipped to the Python workers with ``addPyFile`` (the
worker, not the driver, performs the import inside the pandas UDF), so
these tests run the exact production code path end-to-end; after them
only the weights remain unverified, not any code path.

Pattern follows the repo's mock LLM server (reference:
test/dummy_server/app.py) — substitute the external dependency at its
wire boundary, keep every engine line real.
"""

import os

import pytest

from dataflow_spark.core.registry import get_operator

# deterministic per (model_id, text): lets the tests assert that the
# model id actually reaches the classifier and that batching preserves
# row alignment
_STUB = '''\
"""Minimal fake of the transformers surface model_scorers.py touches."""
import hashlib


def pipeline(task, model=None, truncation=None):
    assert task == "text-classification", task

    def classify(texts):
        assert isinstance(texts, list)
        return [
            {"label": "LABEL_1",
             "score": int.from_bytes(
                 hashlib.md5((str(model) + "|" + t).encode()).digest()[:4],
                 "big") / 0xFFFFFFFF}
            for t in texts
        ]

    return classify
'''


def _expected(model_id: str, text: str) -> float:
    import hashlib

    return int.from_bytes(
        hashlib.md5((model_id + "|" + text).encode()).digest()[:4],
        "big") / 0xFFFFFFFF


@pytest.fixture(scope="module")
def hf_stub(spark, tmp_path_factory):
    """Ship the fake transformers module to the Python workers."""
    d = tmp_path_factory.mktemp("hf_stub")
    p = d / "transformers.py"
    p.write_text(_STUB)
    spark.sparkContext.addPyFile(str(p))
    return str(p)


EVALUATORS = [
    ("QuratingSampleEvaluator", "qurating_score"),
    ("FineWebEduSampleEvaluator", "fineweb_edu_score"),
    ("TextbookSampleEvaluator", "textbook_score"),
    ("DebertaV3SampleEvaluator", "debertav3_score"),
    ("PairQualSampleEvaluator", "pairqual_score"),
    ("SuperfilteringSampleEvaluator", "superfiltering_score"),
    ("DeitaQualitySampleEvaluator", "deita_quality_score"),
    ("DeitaComplexitySampleEvaluator", "deita_complexity_score"),
    ("RMSampleEvaluator", "rm_score"),
]


@pytest.mark.parametrize("cls_name,out_col", EVALUATORS)
def test_evaluator_hf_backend_end_to_end(spark, hf_stub, cls_name, out_col):
    from dataflow_spark.operators.eval import model_scorers

    op = get_operator(cls_name, {"backend": "hf"})
    df = spark.createDataFrame(
        [("alpha text",), ("beta text",), ("alpha text",), (None,)],
        "text string")
    rows = op.run(df).collect()
    model_id = getattr(model_scorers, cls_name).MODEL_ID
    scores = [r[out_col] for r in rows]
    # row alignment through the Arrow batch: each text scored under THIS
    # scorer's model id (None passes through fillna("") worker-side)
    assert scores[0] == pytest.approx(_expected(model_id, "alpha text"))
    assert scores[1] == pytest.approx(_expected(model_id, "beta text"))
    assert scores[2] == scores[0]
    assert scores[3] == pytest.approx(_expected(model_id, ""))
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_hf_backend_model_ids_differentiate(spark, hf_stub):
    """Two scorers over the same text must hit DIFFERENT model ids —
    catches a cache-key collision in the per-executor singleton."""
    df = spark.createDataFrame([("same text",)], "text string")
    a = get_operator("QuratingSampleEvaluator", {"backend": "hf"}).run(df).collect()
    b = get_operator("FineWebEduSampleEvaluator", {"backend": "hf"}).run(df).collect()
    assert a[0]["qurating_score"] != b[0]["fineweb_edu_score"]


FILTERS = [
    "QuratingFilter", "FineWebEduFilter", "TextbookFilter",
    "SuperfilteringFilter", "DeitaQualityFilter", "DeitaComplexityFilter",
    "RMFilter", "PairQualFilter",
]


@pytest.mark.parametrize("cls_name", FILTERS)
def test_filter_hf_backend_thresholds(spark, hf_stub, cls_name):
    from dataflow_spark.operators.eval import model_scorers

    fcls = getattr(model_scorers, cls_name)
    model_id = getattr(model_scorers, fcls.EVALUATOR).MODEL_ID
    texts = [f"doc number {i}" for i in range(12)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = get_operator(cls_name, {"backend": "hf", "min_score": 0.5}).run(df)
    kept = {r["text"] for r in out.collect()}
    expected = {t for t in texts if _expected(model_id, t) >= 0.5}
    assert kept == expected
    assert out.columns == ["text"]  # helper score column dropped


_ST_STUB = '''\
"""Minimal fake of the sentence-transformers surface the Bert scorer
touches: deterministic 8-dim embeddings derived from md5(model|text)."""
import hashlib


class SentenceTransformer:
    def __init__(self, model_id):
        self.model_id = model_id

    def encode(self, texts):
        out = []
        for t in texts:
            h = hashlib.md5((self.model_id + "|" + t).encode()).digest()
            out.append([b / 255.0 for b in h[:8]])
        return out
'''


def _stub_vec(model_id: str, text: str):
    import hashlib

    h = hashlib.md5((model_id + "|" + text).encode()).digest()
    return [b / 255.0 for b in h[:8]]


@pytest.fixture(scope="module")
def st_stub(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("st_stub")
    p = d / "sentence_transformers.py"
    p.write_text(_ST_STUB)
    spark.sparkContext.addPyFile(str(p))
    return str(p)


def test_bert_hf_backend_cosine(spark, st_stub):
    import math

    from dataflow_spark.operators.eval import model_scorers

    df = spark.createDataFrame(
        [("same words", "same words"), ("alpha one", "beta two")],
        "generated string, reference string")
    op = get_operator("BertSampleEvaluator", {"backend": "hf"})
    rows = op.run(df).collect()
    # identical pair -> cosine exactly 1 under any encoder
    assert rows[0]["bert_score"] == pytest.approx(1.0)
    mid = model_scorers.BertSampleEvaluator.MODEL_ID
    a, b = _stub_vec(mid, "alpha one"), _stub_vec(mid, "beta two")
    want = (sum(x * y for x, y in zip(a, b))
            / (math.hypot(*a) * math.hypot(*b)))
    assert rows[1]["bert_score"] == pytest.approx(want)


def test_custom_model_id_reaches_worker(spark, hf_stub):
    df = spark.createDataFrame([("hello",)], "text string")
    op = get_operator("QuratingSampleEvaluator",
                      {"backend": "hf", "model_id": "org/custom-model"})
    r = op.run(df).collect()[0]
    assert r["qurating_score"] == pytest.approx(
        _expected("org/custom-model", "hello"))
