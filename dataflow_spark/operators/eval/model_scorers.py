"""Classic-model quality scorers (reference: SURVEY.md §2.7 "classic-model
scorers" — Qurating, FineWebEdu, Textbook, DebertaV3, PairQual,
Superfiltering, DeitaQuality/Complexity, RM, BERTScore; each a broadcast
HF model + per-row score, with a paired threshold filter).

Execution seam: one Arrow-batched pandas_udf per scorer whose model is a
per-executor lazy singleton. Backends:

  backend="hf"   — real HuggingFace weights (gated import; this container
                   has no transformers/torch, so it raises a clear error)
  backend="hash" — deterministic md5-derived pseudo-score in [0, 1];
                   the engine's testable stand-in: identical text ->
                   identical score, so dedup/filter plumbing and the
                   paired threshold filters are exercised end-to-end.

The Spark plan is identical under both backends — swapping in weights
changes no operator code.
"""

from __future__ import annotations

import hashlib
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY

_EXECUTOR_MODELS: dict = {}  # per-executor lazy singleton cache


def _hash_score(text: str, salt: str) -> float:
    h = hashlib.md5((salt + (text or "")).encode("utf-8")).digest()
    return int.from_bytes(h[:4], "big") / 0xFFFFFFFF


class _ModelScoreEvaluator(Operator):
    """Base: add ``output_key`` = model score of ``input_key``."""

    MODEL_ID = ""          # HF hub id used by the hf backend
    OUTPUT_KEY = "score"

    def __init__(self, input_key: str = "text", output_key: str | None = None,
                 backend: str = "hash", model_id: str | None = None):
        self.input_key = input_key
        self.output_key = output_key or self.OUTPUT_KEY
        self.backend = backend
        self.model_id = model_id or self.MODEL_ID
        self.input_keys = (input_key,)
        self.output_keys = (self.output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        backend, model_id = self.backend, self.model_id
        salt = type(self).__name__

        @pandas_udf("double")
        def score(s: pd.Series) -> pd.Series:
            if backend == "hash":
                return s.map(lambda t: _hash_score(t, salt))
            try:  # pragma: no cover — weights absent in the test container
                from transformers import pipeline as hf_pipeline
            except ImportError as e:
                raise ImportError(
                    f"{salt} backend='hf' needs the transformers package; "
                    "use backend='hash' for the deterministic stand-in") from e
            key = (salt, model_id)
            if key not in _EXECUTOR_MODELS:
                _EXECUTOR_MODELS[key] = hf_pipeline(
                    "text-classification", model=model_id, truncation=True)
            clf = _EXECUTOR_MODELS[key]
            return pd.Series([float(r["score"]) for r in clf(s.fillna("").tolist())])

        return df.withColumn(self.output_key, score(F.col(self.input_key)))


_SCORERS = [
    # (class name, reference file, HF model id, output column)
    ("QuratingSampleEvaluator", "text_pt/eval/qurating_sample_evaluator.py",
     "princeton-nlp/QuRater-1.3B", "qurating_score"),
    ("FineWebEduSampleEvaluator", "text_pt/eval/fineweb_edu_sample_evaluator.py",
     "HuggingFaceFW/fineweb-edu-classifier", "fineweb_edu_score"),
    ("TextbookSampleEvaluator", "text_pt/eval/textbook_sample_evaluator.py",
     "kenhktsui/llm-data-textbook-quality-fasttext-classifier-v2", "textbook_score"),
    ("DebertaV3SampleEvaluator", "text_pt/eval/debertav3_sample_evaluator.py",
     "nvidia/quality-classifier-deberta", "debertav3_score"),
    ("PairQualSampleEvaluator", "text_pt/eval/pairqual_sample_evaluator.py",
     "zks2856/PairQual-Scorer-en", "pairqual_score"),
    ("SuperfilteringSampleEvaluator", "text_sft/eval/superfiltering_sample_evaluator.py",
     "gpt2", "superfiltering_score"),
    ("DeitaQualitySampleEvaluator", "text_sft/eval/deita_quality_sample_evaluator.py",
     "hkust-nlp/deita-quality-scorer", "deita_quality_score"),
    ("DeitaComplexitySampleEvaluator", "text_sft/eval/deita_complexity_sample_evaluator.py",
     "hkust-nlp/deita-complexity-scorer", "deita_complexity_score"),
    ("RMSampleEvaluator", "text_sft/eval/rm_sample_evaluator.py",
     "OpenAssistant/reward-model-deberta-v3-large-v2", "rm_score"),
]

for _name, _ref, _model, _out in _SCORERS:
    _cls = type(_name, (_ModelScoreEvaluator,), {
        "__doc__": (
            f"Model quality scorer (reference: dataflow/operators/{_ref}). "
            f"backend='hash' (default): deterministic md5 proxy score — "
            f"plumbing contract only; backend='hf': real weights "
            f"({_model}) as a broadcast-model pandas UDF (needs "
            f"transformers/torch)."),
        "MODEL_ID": _model,
        "OUTPUT_KEY": _out,
    })
    OPERATOR_REGISTRY.register()(_cls)
    globals()[_name] = _cls


class _ModelScoreFilter(Operator):
    """Paired threshold filter: score with the evaluator, keep rows in
    [min_score, max_score] (reference composition, e.g.
    text_pt/filter/qurating_filter.py)."""

    EVALUATOR: str = ""

    def __init__(self, min_score: float = 0.5, max_score: float = float("inf"),
                 input_key: str = "text", backend: str = "hash"):
        self.min_score, self.max_score = min_score, max_score
        self.input_key = input_key
        self.backend = backend
        self.input_keys = (input_key,)
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        ev_cls = globals()[self.EVALUATOR]
        ev = ev_cls(input_key=self.input_key, output_key="_ms_score",
                    backend=self.backend)
        return (ev.run(df)
                .filter(F.col("_ms_score").between(self.min_score, self.max_score))
                .drop("_ms_score"))


for _ev_name, _filter_name in [
    ("QuratingSampleEvaluator", "QuratingFilter"),
    ("FineWebEduSampleEvaluator", "FineWebEduFilter"),
    ("TextbookSampleEvaluator", "TextbookFilter"),
    ("SuperfilteringSampleEvaluator", "SuperfilteringFilter"),
    ("DeitaQualitySampleEvaluator", "DeitaQualityFilter"),
    ("DeitaComplexitySampleEvaluator", "DeitaComplexityFilter"),
    ("RMSampleEvaluator", "RMFilter"),
    ("PairQualSampleEvaluator", "PairQualFilter"),
]:
    _fcls = type(_filter_name, (_ModelScoreFilter,), {
        "__doc__": f"Threshold filter over {_ev_name}'s score.",
        "EVALUATOR": _ev_name,
    })
    OPERATOR_REGISTRY.register()(_fcls)
    globals()[_filter_name] = _fcls


@OPERATOR_REGISTRY.register()
class BertSampleEvaluator(Operator):
    """BERTScore-style generated-vs-reference similarity
    (general_text/eval/bert_sample_evaluator.py:75).

    backend='hash' falls back to token-F1 (deterministic, model-free) so
    the pairwise plumbing is testable; backend='hf' encodes both columns
    with a sentence-transformers model (per-executor singleton, Arrow
    batches) and scores cosine similarity — the optional dependency is
    gated at the worker-side import like the classifier scorers.
    """

    MODEL_ID = "sentence-transformers/all-MiniLM-L6-v2"

    def __init__(self, input_key: str = "generated", reference_key: str = "reference",
                 output_key: str = "bert_score", backend: str = "hash",
                 model_id: str | None = None):
        self.input_key, self.reference_key = input_key, reference_key
        self.output_key = output_key
        self.backend = backend
        self.model_id = model_id or self.MODEL_ID
        self.input_keys = (input_key, reference_key)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        if self.backend == "hash":
            from dataflow_spark.operators.eval.reference_metrics import TokenF1SampleEvaluator

            return TokenF1SampleEvaluator(
                self.input_key, self.reference_key, self.output_key).run(df)
        model_id = self.model_id

        @pandas_udf("double")
        def cos(gen: pd.Series, ref: pd.Series) -> pd.Series:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:
                raise ImportError(
                    "BertSampleEvaluator backend='hf' needs the "
                    "sentence-transformers package; use backend='hash' "
                    "for the deterministic token-F1 stand-in") from e
            import numpy as np

            key = ("BertSampleEvaluator", model_id)
            if key not in _EXECUTOR_MODELS:
                _EXECUTOR_MODELS[key] = SentenceTransformer(model_id)
            model = _EXECUTOR_MODELS[key]
            a = np.asarray(model.encode(gen.fillna("").tolist()), dtype="float64")
            b = np.asarray(model.encode(ref.fillna("").tolist()), dtype="float64")
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                sim = np.where(den > 0, (a * b).sum(axis=1) / den, 0.0)
            return pd.Series(sim)

        return df.withColumn(
            self.output_key,
            cos(F.col(self.input_key), F.col(self.reference_key)))
