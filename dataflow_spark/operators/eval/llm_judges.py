"""LLM-as-judge sample evaluators (reference: SURVEY.md §2.7 LLM-judge
scorers — Alpagasus, Treeinstruct, Instag, Meta, Text2QA quality,
CodeQuality, Perspective). All are one LLM-map + regex extraction over
the response; multi-dimension judges extract several named scores from
one response (meta_sample_evaluator.py:214)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.serving.base import LLMServing


def _first_float(col):
    s = F.regexp_extract(col, r"(-?[0-9]+(\.[0-9]+)?)", 1)
    return F.when(s != "", s.cast(DoubleType()))


class _SingleScoreJudge(Operator):
    """One prompt, one numeric score extracted from the reply."""

    PROMPT = "Rate 1-5: {x}"
    OUTPUT_KEY = "judge_score"

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 output_key: str | None = None):
        self.serving = serving
        self.input_key = input_key
        self.output_key = output_key or self.OUTPUT_KEY
        self.input_keys = (input_key,)
        self.output_keys = (self.output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        out = llm_map(df, self.serving, self.PROMPT.replace("{x}", "{%s}" % self.input_key),
                      self.input_key, "_judge_raw")
        return out.withColumn(self.output_key,
                              _first_float(F.col("_judge_raw"))).drop("_judge_raw")


@OPERATOR_REGISTRY.register()
class AlpagasusSampleEvaluator(_SingleScoreJudge):
    """Alpagasus instruction-quality 1-5 rating
    (text_sft/eval/alpagasus_sample_evaluator.py:90)."""

    PROMPT = "Score the quality of this instruction-response pair from 1 to 5: {x}"
    OUTPUT_KEY = "alpagasus_score"


@OPERATOR_REGISTRY.register()
class TreeinstructSampleEvaluator(_SingleScoreJudge):
    """Instruction complexity as semantic-tree node count
    (text_sft/eval/treeinstruct_sample_evaluator.py:83)."""

    PROMPT = "How many nodes would the semantic parse tree of this instruction have? Reply with a number: {x}"
    OUTPUT_KEY = "treeinstruct_nodes"


@OPERATOR_REGISTRY.register()
class Text2QASampleEvaluator(_SingleScoreJudge):
    """Generated-QA quality judge (core_text/eval, Text2QASampleEvaluator)."""

    PROMPT = "Rate this question-answer pair 0-1 for faithfulness: {x}"
    OUTPUT_KEY = "qa_quality_score"


@OPERATOR_REGISTRY.register()
class CodeQualitySampleEvaluator(_SingleScoreJudge):
    """LLM code-quality rating (code/eval/code_quality_sample_evaluator.py:194)."""

    PROMPT = "Rate this code 1-10 for correctness and style: {x}"
    OUTPUT_KEY = "code_quality_score"


@OPERATOR_REGISTRY.register()
class PerspectiveSampleEvaluator(_SingleScoreJudge):
    """Toxicity probability via an external moderation backend
    (general_text/eval/perspective_sample_evaluator.py:73) — the
    Perspective API client is just another LLMServing implementation."""

    PROMPT = "Return the toxicity probability in [0,1] of: {x}"
    OUTPUT_KEY = "toxicity_score"


@OPERATOR_REGISTRY.register()
class MetaSampleEvaluator(Operator):
    """Multi-dimension rating in one call: the judge replies with one
    line per dimension; each 'name: score' is regex-extracted into its
    own column (text_pt/eval/meta_sample_evaluator.py:214)."""

    DIMENSIONS = ["clarity", "coherence", "accuracy", "safety"]

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 dimensions: list[str] | None = None, prefix: str = "meta_"):
        self.serving = serving
        self.input_key = input_key
        self.dimensions = dimensions or self.DIMENSIONS
        self.prefix = prefix
        self.input_keys = (input_key,)
        self.output_keys = tuple(prefix + d for d in self.dimensions)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        dims = ", ".join(self.dimensions)
        out = llm_map(
            df, self.serving,
            "Rate 1-5 on each of [" + dims + "], one 'name: score' per line: "
            + "{%s}" % self.input_key,
            self.input_key, "_meta_raw")
        for d in self.dimensions:
            s = F.regexp_extract(F.col("_meta_raw"),
                                 r"(?i)" + d + r"\s*[:=]\s*(-?[0-9]+(\.[0-9]+)?)", 1)
            out = out.withColumn(self.prefix + d,
                                 F.when(s != "", s.cast(DoubleType())))
        return out.drop("_meta_raw")


@OPERATOR_REGISTRY.register()
class InstagSampleEvaluator(Operator):
    """Instruction tagging: the judge lists comma-separated tags; output
    is an array<string> column + tag count
    (text_sft/eval/instag_sample_evaluator.py:132)."""

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 tags_key: str = "instag_tags", count_key: str = "instag_count"):
        self.serving = serving
        self.input_key = input_key
        self.tags_key, self.count_key = tags_key, count_key
        self.input_keys = (input_key,)
        self.output_keys = (tags_key, count_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        out = llm_map(df, self.serving,
                      "List comma-separated intent tags for: {%s}" % self.input_key,
                      self.input_key, "_tags_raw")
        tags = F.filter(
            F.transform(F.split(F.col("_tags_raw"), ","), lambda t: F.trim(t)),
            lambda t: t != "",
        )
        return (out.withColumn(self.tags_key, tags)
                .withColumn(self.count_key, F.size(self.tags_key))
                .drop("_tags_raw"))


@OPERATOR_REGISTRY.register()
class FuncCallConversationSampleEvaluator(_SingleScoreJudge):
    """LLM-judged function-call conversation quality
    (conversations/eval/func_call_conversation_sample_evaluator.py:99)."""

    PROMPT = "Rate 1-5 how well this conversation uses tool calls: {x}"
    OUTPUT_KEY = "funccall_quality_score"
