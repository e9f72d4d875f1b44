"""Text generators beyond the core PromptedGenerator (SURVEY.md §2.9).

All are thin shapes over the llm_map primitive:
- FormatStrPromptedGenerator: prompt = format-string over N columns
  (format_str_prompted_generator.py).
- Text2QAGenerator: doc -> (question, answer) pairs; LLM emits
  'Q: ... A: ...' blocks which are parsed and exploded
  (text2qa_generator.py).
- RandomDomainKnowledgeRowGenerator: rows from nothing — spark.range
  fan-out + LLM-map (random_domain_knowledge_row_generator.py).
- SFTGeneratorSeed: seed doc -> (instruction, output) SFT pair
  (sft_generator_from_seed.py).
- CondorGenerator: 2-stage seed-free SFT synthesis — topic fan-out,
  question LLM-map, then answer LLM-map (condor_generator.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.operators.generate.llm_map import llm_map
from dataflow_spark.serving.base import LLMServing


def _seed_range(spark: SparkSession, n: int) -> DataFrame:
    """Row-generator seed sized so LLM micro-batches stay full: one
    partition per ~64 rows (capped at the cluster's parallelism) instead
    of defaultParallelism mostly-empty slices for small n."""
    parts = max(1, min(spark.sparkContext.defaultParallelism, (n + 63) // 64))
    return spark.range(0, n, 1, numPartitions=parts)


@OPERATOR_REGISTRY.register()
class FormatStrPromptedGenerator(Operator):
    """Prompt built by format_string over several columns, then LLM-map."""

    def __init__(self, serving: LLMServing, format_str: str,
                 input_keys: list[str], output_key: str = "generated"):
        self.serving = serving
        self.format_str = format_str
        self.cols = list(input_keys)
        self.output_key = output_key
        self.input_keys = tuple(self.cols)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        prompted = df.withColumn(
            "_prompt", F.format_string(self.format_str, *[F.col(c) for c in self.cols]))
        out = llm_map(prompted, self.serving, "{_prompt}", "_prompt", self.output_key)
        return out.drop("_prompt")


@OPERATOR_REGISTRY.register()
class Text2QAGenerator(Operator):
    """Document -> exploded (question, answer) rows.

    The LLM response is expected to contain 'Q: ... A: ...' pairs; they
    are regex-split and exploded, one output row per QA pair, with
    q_index preserving order (explode shape: qa_merger.py:64).
    """

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 prompt_template: str = "Generate QA pairs for:\n{text}"):
        self.serving = serving
        self.input_key = input_key
        self.prompt_template = prompt_template
        self.input_keys = (input_key,)
        self.output_keys = ("question", "answer", "q_index")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        raw = llm_map(df, self.serving, self.prompt_template, self.input_key, "_qa_raw")
        # split into 'Q:...A:...' blocks, then regex out the two parts
        blocks = F.filter(
            F.split(F.col("_qa_raw"), r"(?=Q:)"),
            lambda b: F.trim(b).startswith("Q:"),
        )
        exploded = raw.select(
            "*", F.posexplode(blocks).alias("q_index", "_block")
        )
        question = F.trim(F.regexp_extract(F.col("_block"), r"Q:\s*([\s\S]*?)\s*A:", 1))
        answer = F.trim(F.regexp_extract(F.col("_block"), r"A:\s*([\s\S]*)$", 1))
        return (
            exploded.withColumn("question", question)
            .withColumn("answer", answer)
            .filter((F.col("question") != "") & (F.col("answer") != ""))
            .drop("_qa_raw", "_block")
        )


@OPERATOR_REGISTRY.register()
class RandomDomainKnowledgeRowGenerator(Operator):
    """Synthesize n rows from nothing: spark.range fan-out + LLM-map.

    The source-style generator shape — no input table required.
    """

    def __init__(self, serving: LLMServing, num_rows: int = 100,
                 domains: list[str] | None = None, output_key: str = "text"):
        self.serving = serving
        self.num_rows = num_rows
        self.domains = domains or ["science", "history", "technology", "art"]
        self.output_key = output_key
        self.input_keys = ()
        self.output_keys = (output_key, "domain", "row_id")

    def generate(self, spark: SparkSession) -> DataFrame:
        doms = F.array(*[F.lit(d) for d in self.domains])
        seed = (
            _seed_range(spark, self.num_rows)
            .withColumnRenamed("id", "row_id")
            .withColumn("domain", F.element_at(doms, (F.col("row_id") % len(self.domains) + 1).cast("int")))
            .withColumn("_prompt", F.concat_ws(" ",
                F.lit("Write a knowledge paragraph about"), F.col("domain"),
                F.lit("variant"), F.col("row_id").cast("string")))
        )
        return llm_map(seed, self.serving, "{_prompt}", "_prompt", self.output_key).drop("_prompt")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return self.generate(df.sparkSession)


@OPERATOR_REGISTRY.register()
class SFTGeneratorSeed(Operator):
    """Seed document -> (instruction, output) SFT pair via two LLM-maps."""

    def __init__(self, serving: LLMServing, input_key: str = "text"):
        self.serving = serving
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = ("instruction", "output")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        with_inst = llm_map(
            df, self.serving,
            "Write an instruction for: {" + self.input_key + "}",
            self.input_key, "instruction")
        return llm_map(with_inst, self.serving, "Answer: {instruction}",
                       "instruction", "output")


@OPERATOR_REGISTRY.register()
class CondorGenerator(Operator):
    """2-stage seed-free SFT synthesis: topic fan-out -> question
    LLM-map -> answer LLM-map (condor_generator.py)."""

    def __init__(self, serving: LLMServing, num_pairs: int = 50,
                 topics: list[str] | None = None):
        self.serving = serving
        self.num_pairs = num_pairs
        self.topics = topics or ["math", "coding", "writing", "reasoning"]
        self.input_keys = ()
        self.output_keys = ("topic", "question", "answer")

    def generate(self, spark: SparkSession) -> DataFrame:
        tops = F.array(*[F.lit(t) for t in self.topics])
        seed = (
            _seed_range(spark, self.num_pairs)
            .withColumnRenamed("id", "pair_id")
            .withColumn("topic", F.element_at(tops, (F.col("pair_id") % len(self.topics) + 1).cast("int")))
            .withColumn("_p", F.concat_ws(" ", F.lit("Pose a"), F.col("topic"),
                                          F.lit("question, variant"),
                                          F.col("pair_id").cast("string")))
        )
        with_q = llm_map(seed, self.serving, "{_p}", "_p", "question").drop("_p")
        return llm_map(with_q, self.serving, "Answer this: {question}",
                       "question", "answer")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return self.generate(df.sparkSession)


@OPERATOR_REGISTRY.register()
class BenchAnswerGenerator(Operator):
    """Answer benchmark questions (core_text/generate/
    bench_answer_generator.py:332) — one LLM-map + final-answer extract."""

    def __init__(self, serving: LLMServing, input_key: str = "question",
                 output_key: str = "model_answer"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.reasoning import ReasoningAnswerExtractionGenerator

        out = llm_map(df, self.serving, "Answer: {%s}" % self.input_key,
                      self.input_key, "_raw_ans")
        out = ReasoningAnswerExtractionGenerator("_raw_ans", self.output_key).run(out)
        return out.drop("_raw_ans")


@OPERATOR_REGISTRY.register()
class Phi4QAGenerator(Operator):
    """Pretrain text -> (question, answer) pair (text_pt/generate/
    phi4qa_generator.py:86): one LLM-map per side."""

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 question_key: str = "question", answer_key: str = "answer"):
        self.serving = serving
        self.input_key = input_key
        self.question_key, self.answer_key = question_key, answer_key
        self.input_keys = (input_key,)
        self.output_keys = (question_key, answer_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = llm_map(df, self.serving,
                      "Write one exam question about: {%s}" % self.input_key,
                      self.input_key, self.question_key)
        return llm_map(out, self.serving, "Answer precisely: {%s}" % self.question_key,
                       self.question_key, self.answer_key)


@OPERATOR_REGISTRY.register()
class Text2MultiHopQAGenerator(Operator):
    """Doc -> multi-hop QA: extract two facts, bridge them, compose the
    multi-hop question + answer (core_text/generate/
    text2multihopqa_generator.py:23,217 — a fixed chain of LLM-maps)."""

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 question_key: str = "mh_question", answer_key: str = "mh_answer"):
        self.serving = serving
        self.input_key = input_key
        self.question_key, self.answer_key = question_key, answer_key
        self.input_keys = (input_key,)
        self.output_keys = (question_key, answer_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = llm_map(df, self.serving, "State two related facts from: {%s}" % self.input_key,
                      self.input_key, "_facts")
        out = llm_map(out, self.serving,
                      "Write a question whose answer needs BOTH facts: {_facts}",
                      "_facts", self.question_key)
        out = out.withColumn("_qa_ctx", F.concat(
            F.col("_facts"), F.lit(" || "), F.col(self.question_key)))
        out = llm_map(out, self.serving, "Answer using the facts: {_qa_ctx}",
                      "_qa_ctx", self.answer_key)
        return out.drop("_facts", "_qa_ctx")


@OPERATOR_REGISTRY.register()
class CondorRefiner(Operator):
    """Two-stage Condor refine: critique then rewrite the answer column
    (text_sft/refine/condor_refiner.py:87)."""

    def __init__(self, serving: LLMServing, input_key: str = "answer"):
        self.serving = serving
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = (input_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = llm_map(df, self.serving, "Critique this answer: {%s}" % self.input_key,
                      self.input_key, "_critique")
        out = out.withColumn("_ctx", F.concat(
            F.col(self.input_key), F.lit(" || critique: "), F.col("_critique")))
        out = llm_map(out, self.serving, "Rewrite the answer per the critique: {_ctx}",
                      "_ctx", "_refined")
        return (out.withColumn(self.input_key, F.col("_refined"))
                .drop("_critique", "_ctx", "_refined"))
