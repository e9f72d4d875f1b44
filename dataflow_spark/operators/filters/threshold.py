"""Paired threshold filters: run a sample evaluator, keep rows whose
score lies in [min_score, max_score], keep the score column.

This is the reference's most-used composition (e.g.
general_text/filter/ngram_filter.py:45-52,
general_text/filter/presidio_filter.py:51-61,
general_text/filter/lexical_diversity_filter.py:48-64,
general_text/filter/langkit_filter.py:97-112,
general_text/filter/perspective_filter.py:42-58,
text_pt/filter/debertav3_filter.py:53-59,
text_sft/filter/alpagasus_filter.py:52-63,
text_sft/filter/instag_filter.py:31-40,
text_sft/filter/treeinstruct_filter.py:51-64,
conversations/filter/composition_task_filter.py:61).

Spark shape: the evaluator appends its score column(s) (Column
expressions or Arrow-batched pandas_udfs); the filter is a plain
``between`` predicate on top, so Catalyst fuses score + filter into one
stage — no extra shuffle, no materialization between "score" and
"filter" (the reference pays a full dataframe write between the two).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


class _EvaluatorThresholdFilter(Operator):
    """Base: score with ``_evaluator()``, keep rows with every watched
    score column inside its [min, max] band. The score column(s) stay in
    the output, matching the reference (it writes them to the step file).
    """

    def _evaluator(self) -> Operator:  # pragma: no cover — abstract
        raise NotImplementedError

    def _bands(self) -> dict[str, tuple[float, float]]:
        """score column -> (min, max)."""
        raise NotImplementedError  # pragma: no cover

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = self._evaluator().run(df)
        pred = None
        for col, (lo, hi) in self._bands().items():
            p = F.col(col).between(F.lit(lo), F.lit(hi))
            pred = p if pred is None else (pred & p)
        return out.filter(pred)


@OPERATOR_REGISTRY.register()
class PercentileThresholdFilter(Operator):
    """Keep rows by their score's CORPUS percentile rather than an
    absolute band: ``keep='top'`` with ``q=0.7`` keeps rows scoring at
    or above the exact 70th percentile ("keep the best 30%") — the
    data-dependent selection step of a curation pipeline, where absolute
    score scales drift between corpora but quantile targets don't.

    Scale: the threshold is one exact ``percentile`` aggregate over the
    score column alone (column-pruned scan, sort-based single-column
    agg), broadcast back via a 1-row cross join; the filter itself stays
    a pure Column predicate. ``approx=True`` swaps in
    ``approx_percentile`` (t-digest, no global sort) for the 100 TB
    path where an exact quantile is an unnecessary luxury.
    """

    def __init__(self, score_key: str, q: float = 0.7, keep: str = "top",
                 approx: bool = False, accuracy: int = 10_000):
        if not 0.0 < q < 1.0:
            raise ValueError("q must be in (0, 1)")
        if keep not in ("top", "bottom"):
            raise ValueError("keep must be 'top' or 'bottom'")
        self.score_key, self.q, self.keep = score_key, q, keep
        self.approx, self.accuracy = approx, accuracy
        self.input_keys = (score_key,)
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        fn = (f"approx_percentile({self.score_key}, {self.q}, {self.accuracy})"
              if self.approx else f"percentile({self.score_key}, {self.q})")
        th = df.select(F.expr(fn).cast("double").alias("_pth"))
        out = df.crossJoin(F.broadcast(th))
        pred = (F.col(self.score_key) >= F.col("_pth") if self.keep == "top"
                else F.col(self.score_key) <= F.col("_pth"))
        return out.filter(pred).drop("_pth")


@OPERATOR_REGISTRY.register()
class NgramFilter(_EvaluatorThresholdFilter):
    """Keep text whose n-gram uniqueness ratio is in range — higher
    score = less repetition (general_text/filter/ngram_filter.py:45)."""

    def __init__(self, min_score: float = 0.8, max_score: float = 1.0,
                 ngrams: int = 5, input_key: str = "text",
                 output_key: str = "NgramScore"):
        self.min_score, self.max_score = min_score, max_score
        self.ngrams = ngrams
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.text_analysis import NgramRepetitionEvaluator

        return NgramRepetitionEvaluator(self.input_key, self.output_key,
                                        n=self.ngrams)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class PresidioFilter(_EvaluatorThresholdFilter):
    """Keep rows with a PII-entity count in [min, max]
    (general_text/filter/presidio_filter.py:51-61)."""

    def __init__(self, min_score: float = 0, max_score: float = 5,
                 input_key: str = "text", output_key: str = "PresidioScore"):
        self.min_score, self.max_score = min_score, max_score
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.text_analysis import PIICountEvaluator

        return PIICountEvaluator(self.input_key, self.output_key)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class LexicalDiversityFilter(_EvaluatorThresholdFilter):
    """Band filter on the lexical-diversity metrics (general_text/filter/
    lexical_diversity_filter.py:48-64; the reference bands mtld/hdd, the
    engine's deterministic metrics are ttr/rttr — same composition)."""

    def __init__(self, min_scores: dict[str, float] | None = None,
                 max_scores: dict[str, float] | None = None,
                 input_key: str = "text"):
        self.min_scores = dict(min_scores or {"ttr": 0.2, "rttr": 0.0})
        self.max_scores = dict(max_scores or {"ttr": 1.0, "rttr": 1e9})
        if self.min_scores.keys() != self.max_scores.keys():
            raise ValueError("min_scores and max_scores must have the same keys")
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = tuple(self.min_scores)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.text_stats import LexicalDiversityEvaluator

        return LexicalDiversityEvaluator(self.input_key)

    def _bands(self):
        return {k: (self.min_scores[k], self.max_scores[k])
                for k in self.min_scores}


@OPERATOR_REGISTRY.register()
class LangkitFilter(_EvaluatorThresholdFilter):
    """Band filter over the langkit readability/statistics bundle
    (general_text/filter/langkit_filter.py:97-112). Keys are the engine's
    langkit_* metric columns."""

    def __init__(self, min_scores: dict[str, float] | None = None,
                 max_scores: dict[str, float] | None = None,
                 input_key: str = "text"):
        self.min_scores = dict(min_scores or {"langkit_words": 1,
                                              "langkit_flesch": -1e9})
        self.max_scores = dict(max_scores or {"langkit_words": 1e9,
                                              "langkit_flesch": 206.835})
        if self.min_scores.keys() != self.max_scores.keys():
            raise ValueError("min_scores and max_scores must have the same keys")
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = tuple(self.min_scores)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.text_stats import LangkitSampleEvaluator

        return LangkitSampleEvaluator(self.input_key)

    def _bands(self):
        return {k: (self.min_scores[k], self.max_scores[k])
                for k in self.min_scores}


@OPERATOR_REGISTRY.register()
class PerspectiveFilter(_EvaluatorThresholdFilter):
    """Keep rows under a toxicity-probability ceiling
    (general_text/filter/perspective_filter.py:42-58)."""

    def __init__(self, serving=None, min_score: float = 0.0,
                 max_score: float = 0.5, input_key: str = "text",
                 output_key: str = "PerspectiveScore"):
        self.serving = serving
        self.min_score, self.max_score = min_score, max_score
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.llm_judges import PerspectiveSampleEvaluator

        return PerspectiveSampleEvaluator(self.serving, self.input_key,
                                          self.output_key)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class AlpagasusFilter(_EvaluatorThresholdFilter):
    """Keep rows whose Alpagasus LLM quality rating is in [min, max]
    (text_sft/filter/alpagasus_filter.py:52-63)."""

    def __init__(self, serving=None, min_score: float = 3, max_score: float = 5,
                 input_key: str = "text", output_key: str = "AlpagasusScore"):
        self.serving = serving
        self.min_score, self.max_score = min_score, max_score
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.llm_judges import AlpagasusSampleEvaluator

        return AlpagasusSampleEvaluator(self.serving, self.input_key,
                                        self.output_key)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class InstagFilter(_EvaluatorThresholdFilter):
    """Keep rows by Instag intent-tag count
    (text_sft/filter/instag_filter.py:31-40)."""

    def __init__(self, serving=None, min_score: float = 1, max_score: float = 10,
                 input_key: str = "text", output_key: str = "InstagScore"):
        self.serving = serving
        self.min_score, self.max_score = min_score, max_score
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.llm_judges import InstagSampleEvaluator

        return InstagSampleEvaluator(self.serving, self.input_key,
                                     tags_key="instag_tags",
                                     count_key=self.output_key)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class TreeinstructFilter(_EvaluatorThresholdFilter):
    """Keep rows by Treeinstruct semantic-tree node count
    (text_sft/filter/treeinstruct_filter.py:51-64)."""

    def __init__(self, serving=None, min_score: float = 7, max_score: float = 100,
                 input_key: str = "text", output_key: str = "TreeinstructScore"):
        self.serving = serving
        self.min_score, self.max_score = min_score, max_score
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def _evaluator(self) -> Operator:
        from dataflow_spark.operators.eval.llm_judges import TreeinstructSampleEvaluator

        return TreeinstructSampleEvaluator(self.serving, self.input_key,
                                           self.output_key)

    def _bands(self):
        return {self.output_key: (self.min_score, self.max_score)}


@OPERATOR_REGISTRY.register()
class DebertaV3Filter(Operator):
    """Quality-class filter: score with DebertaV3SampleEvaluator, map the
    [0,1] score to Low/Medium/High tertiles, keep rows whose label is in
    ``allowed_scores`` (text_pt/filter/debertav3_filter.py:53-60 keeps
    classifier labels in an allowed list)."""

    def __init__(self, allowed_scores: list[str] | None = None,
                 input_key: str = "text", output_key: str = "Debertav3Score",
                 backend: str = "hash"):
        self.allowed_scores = list(allowed_scores or ["Medium", "High"])
        self.input_key, self.output_key = input_key, output_key
        self.backend = backend
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.eval import model_scorers as ms

        ev = ms.DebertaV3SampleEvaluator(input_key=self.input_key,
                                         output_key="_dv3", backend=self.backend)
        s = F.col("_dv3")
        label = (F.when(s < 1 / 3, "Low")
                 .when(s < 2 / 3, "Medium")
                 .otherwise("High"))
        return (ev.run(df)
                .withColumn(self.output_key, label)
                .filter(F.col(self.output_key).isin(self.allowed_scores))
                .drop("_dv3"))


@OPERATOR_REGISTRY.register()
class CompositionTaskFilter(Operator):
    """LLM-judged runnability of a composition task given its sub-tasks;
    keeps runnable rows and the 0/1 ``runable_label``
    (conversations/filter/composition_task_filter.py:61)."""

    def __init__(self, serving=None, output_key: str = "runable_label"):
        self.serving = serving
        self.output_key = output_key
        self.input_keys = ()
        self.output_keys = (output_key,)

    def run(self, df: DataFrame,
            input_composition_task_key: str = "composition_task",
            input_sub_tasks_keys: list[str] | None = None,
            **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        subs = list(input_sub_tasks_keys or [])
        parts = [F.lit("Task: "), F.col(input_composition_task_key)]
        for k in subs:
            parts += [F.lit(f"\n{k}: "), F.col(k).cast("string")]
        tmp = df.withColumn("_ct_prompt", F.concat(*parts))
        out = llm_map(tmp, self.serving,
                      "Can this composed task be executed with the sub-tasks "
                      "shown? Reply yes or no. {_ct_prompt}",
                      "_ct_prompt", "_ct_raw")
        label = F.lower(F.col("_ct_raw")).rlike(r"\byes\b|\btrue\b").cast("int")
        return (out.withColumn(self.output_key, label)
                .filter(F.col(self.output_key) == 1)
                .drop("_ct_prompt", "_ct_raw"))
