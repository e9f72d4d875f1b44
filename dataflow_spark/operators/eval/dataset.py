"""Dataset-level evaluators: aggregate metrics over the whole table.

Reference: BenchDatasetEvaluator (accuracy over per-row matches,
core_text/eval/bench_dataset_evaluator.py:24-60) and the distribution
statistics evaluators (reasoning/eval/*_dataset_evaluator.py). Spark
shape: per-row expression + groupBy/agg — partial aggregation map-side,
single reduce.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.functions import text as T


@OPERATOR_REGISTRY.register()
class AccuracyDatasetEvaluator(Operator):
    """Exact-match accuracy: avg(model == golden) after trim/lower
    normalization. Returns a 1-row DataFrame [n_rows, n_correct, accuracy]."""

    def __init__(self, answer_key: str = "model_answer",
                 golden_key: str = "golden_answer"):
        self.answer_key, self.golden_key = answer_key, golden_key
        self.input_keys = (answer_key, golden_key)
        self.output_keys = ("n_rows", "n_correct", "accuracy")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        match = (
            F.lower(F.trim(F.col(self.answer_key)))
            == F.lower(F.trim(F.col(self.golden_key)))
        ).cast("int")
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(match).alias("n_correct"),
            F.avg(match).alias("accuracy"),
        )


@OPERATOR_REGISTRY.register()
class DistributionDatasetEvaluator(Operator):
    """Category distribution + text-length stats per group.

    Reference: ReasoningCategory/Difficulty/TokenDatasetEvaluator — all
    are groupBy(col).count() / avg(len) shapes.
    """

    def __init__(self, group_key: str, text_key: str | None = "text"):
        self.group_key, self.text_key = group_key, text_key
        self.input_keys = (group_key,) + ((text_key,) if text_key else ())
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        if self.text_key:
            aggs += [
                F.avg(F.length(F.col(self.text_key))).alias("avg_chars"),
                F.avg(T.word_count(F.col(self.text_key))).alias("avg_words"),
            ]
        return df.groupBy(self.group_key).agg(*aggs)
