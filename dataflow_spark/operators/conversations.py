"""Conversation operators: assemble/explode list-of-struct transcripts.

Reference: func_call_generators.py:479-546 groups rows of the same task
and iterates them to build conversations; qa_merger explodes nested QA
lists. Spark shapes: groupBy + sorted collect_list(struct) for assembly,
posexplode for the inverse — both shuffle once on the conversation key.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.operators.generate.llm_map import llm_map
from dataflow_spark.serving.base import LLMServing


@OPERATOR_REGISTRY.register()
class ConversationAssembler(Operator):
    """(conv_id, turn_idx, role, content) rows -> one row per conv with
    conversations: array<struct<role,content>> ordered by turn_idx."""

    def __init__(self, conv_key: str = "conv_id", turn_key: str = "turn_idx",
                 role_key: str = "role", content_key: str = "content",
                 output_key: str = "conversations"):
        self.conv_key, self.turn_key = conv_key, turn_key
        self.role_key, self.content_key = role_key, content_key
        self.output_key = output_key
        self.input_keys = (conv_key, turn_key, role_key, content_key)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        turn = F.struct(
            F.col(self.turn_key).alias("_t"),
            F.col(self.role_key).alias("role"),
            F.col(self.content_key).alias("content"),
        )
        return (
            df.groupBy(self.conv_key)
            .agg(F.array_sort(F.collect_list(turn)).alias("_turns"))
            .withColumn(
                self.output_key,
                F.transform(F.col("_turns"),
                            lambda s: F.struct(s["role"].alias("role"),
                                               s["content"].alias("content"))),
            )
            .drop("_turns")
        )


@OPERATOR_REGISTRY.register()
class ConversationExploder(Operator):
    """Inverse: conversations array -> one row per turn with turn_idx."""

    def __init__(self, input_key: str = "conversations"):
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = ("turn_idx", "role", "content")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        keep = [c for c in df.columns if c != self.input_key]
        return df.select(
            *keep, F.posexplode(self.input_key).alias("turn_idx", "_turn")
        ).select(*keep, "turn_idx", F.col("_turn.role").alias("role"),
                 F.col("_turn.content").alias("content"))


@OPERATOR_REGISTRY.register()
class MultiTurnConversationGenerator(Operator):
    """Simulated multi-turn dialogue: alternate user/assistant LLM-maps
    for n rounds, assembling array<struct<role,content>> per seed row.

    Reference: MultiTurnConversationGenerator's 3-agent loop
    (func_call_generators.py:479-546); ours alternates two serving
    prompts — the loop count is a plan-time constant so the whole
    conversation is one lazy column pipeline, no driver iteration over
    rows.
    """

    def __init__(self, serving: LLMServing, seed_key: str = "chat",
                 rounds: int = 2, output_key: str = "conversations"):
        self.serving = serving
        self.seed_key = seed_key
        self.rounds = rounds
        self.output_key = output_key
        self.input_keys = (seed_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        turns = [F.struct(F.lit("user").alias("role"),
                          F.col(self.seed_key).alias("content"))]
        cur_key = self.seed_key
        for r in range(self.rounds):
            a_key = f"_asst_{r}"
            df = llm_map(df, self.serving, "Reply to: {" + cur_key + "}", cur_key, a_key)
            turns.append(F.struct(F.lit("assistant").alias("role"),
                                  F.col(a_key).alias("content")))
            if r < self.rounds - 1:
                u_key = f"_user_{r}"
                df = llm_map(df, self.serving, "Follow up on: {" + a_key + "}", a_key, u_key)
                turns.append(F.struct(F.lit("user").alias("role"),
                                      F.col(u_key).alias("content")))
                cur_key = u_key
        out = df.withColumn(self.output_key, F.array(*turns))
        return out.drop(*[c for c in out.columns if c.startswith(("_asst_", "_user_"))])


# ---------------------------------------------------------------------------
# func-call task-synthesis family (reference:
# conversations/generate/func_call_generators.py:27-546 — seven chained
# LLM-map operators over a scenario -> task -> function -> conversation
# progression; each stage is one distributed LLM-map, fan-out stages are
# explode + LLM-map)
# ---------------------------------------------------------------------------

@OPERATOR_REGISTRY.register()
class ScenarioExtractor(Operator):
    """Extract the scenario behind a chat/text row
    (func_call_generators.py ScenarioExtractor)."""

    def __init__(self, serving: LLMServing, input_key: str = "chat",
                 output_key: str = "scenario"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return llm_map(df, self.serving,
                       "Name the real-world scenario of: {%s}" % self.input_key,
                       self.input_key, self.output_key)


@OPERATOR_REGISTRY.register()
class ScenarioExpander(Operator):
    """Expand each scenario into n alternatives (fan-out explode +
    LLM-map); keeps the source scenario as ``orig_scenario``."""

    def __init__(self, serving: LLMServing, input_key: str = "scenario",
                 n: int = 2):
        self.serving = serving
        self.input_key = input_key
        self.n = n
        self.input_keys = (input_key,)
        self.output_keys = (input_key, "orig_scenario")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        fanned = (
            df.withColumn("orig_scenario", F.col(self.input_key))
            .withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(self.n))))
            .withColumn("_p", F.concat(
                F.lit("Propose alternative scenario #"), F.col("_i").cast("string"),
                F.lit(" similar to: "), F.col("orig_scenario")))
        )
        out = llm_map(fanned, self.serving, "{_p}", "_p", self.input_key)
        return out.drop("_i", "_p")


@OPERATOR_REGISTRY.register()
class AtomTaskGenerator(Operator):
    """Scenario -> atomic task (func_call_generators.py AtomTaskGenerator)."""

    def __init__(self, serving: LLMServing, input_key: str = "scenario",
                 output_key: str = "atom_task"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return llm_map(df, self.serving,
                       "Write one atomic user task for scenario: {%s}" % self.input_key,
                       self.input_key, self.output_key)


@OPERATOR_REGISTRY.register()
class SequentialTaskGenerator(Operator):
    """Atomic task -> subsequent task + composed two-step task
    (SequentialTaskGenerator): two LLM-maps, no fan-out."""

    def __init__(self, serving: LLMServing, input_key: str = "atom_task",
                 next_key: str = "subsequent_task", composed_key: str = "composition_task"):
        self.serving = serving
        self.input_key = input_key
        self.next_key, self.composed_key = next_key, composed_key
        self.input_keys = (input_key,)
        self.output_keys = (next_key, composed_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = llm_map(df, self.serving,
                      "Write the task a user would naturally do after: {%s}" % self.input_key,
                      self.input_key, self.next_key)
        out = out.withColumn("_pair", F.concat(
            F.col(self.input_key), F.lit(" THEN "), F.col(self.next_key)))
        out = llm_map(out, self.serving,
                      "Combine into one sequential task: {_pair}", "_pair", self.composed_key)
        return out.drop("_pair")


@OPERATOR_REGISTRY.register()
class ParaSeqTaskGenerator(Operator):
    """Atomic task -> parallel companion + combined parallel-then-
    sequential composition (ParaSeqTaskGenerator)."""

    def __init__(self, serving: LLMServing, input_key: str = "atom_task",
                 parallel_key: str = "parallel_task", composed_key: str = "paraseq_task"):
        self.serving = serving
        self.input_key = input_key
        self.parallel_key, self.composed_key = parallel_key, composed_key
        self.input_keys = (input_key,)
        self.output_keys = (parallel_key, composed_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = llm_map(df, self.serving,
                      "Write a task doable in parallel with: {%s}" % self.input_key,
                      self.input_key, self.parallel_key)
        out = out.withColumn("_pair", F.concat(
            F.col(self.input_key), F.lit(" AND "), F.col(self.parallel_key)))
        out = llm_map(out, self.serving,
                      "Combine into one multi-part task: {_pair}", "_pair", self.composed_key)
        return out.drop("_pair")


@OPERATOR_REGISTRY.register()
class FunctionGenerator(Operator):
    """Task -> JSON list of callable function signatures the assistant
    would need (FuncGenerator); output kept as a JSON string column
    (open schema), parse with from_json downstream."""

    def __init__(self, serving: LLMServing, input_key: str = "atom_task",
                 output_key: str = "functions"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return llm_map(df, self.serving,
                       "List JSON function signatures needed for task: {%s}" % self.input_key,
                       self.input_key, self.output_key)


@OPERATOR_REGISTRY.register()
class ConsistentChatGenerator(Operator):
    """Synthesize multi-turn chats from nothing: distributed row
    generation (spark.range cross topics) + the multi-turn loop.

    Reference: conversations/generate/consistent_chat_generator.py:58 —
    topic-seeded from-scratch synthesis.
    """

    TOPICS = ["travel", "cooking", "finance", "health", "coding",
              "music", "sports", "history"]

    def __init__(self, serving: LLMServing, num_per_topic: int = 2,
                 rounds: int = 2, output_key: str = "conversations"):
        self.serving = serving
        self.num_per_topic = num_per_topic
        self.rounds = rounds
        self.output_key = output_key
        self.input_keys = ()
        self.output_keys = ("topic", output_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        spark = df.sparkSession
        # tiny fan-out: createDataFrame spreads rows over defaultParallelism
        # slices, so every downstream LLM-map stage would launch ~32 mostly
        # empty python workers; a handful of partitions is the right width
        topics = spark.createDataFrame(
            [(t,) for t in self.TOPICS], ["topic"]).coalesce(4)
        seeds = (
            topics.withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(self.num_per_topic))))
            .withColumn("_seed", F.concat(
                F.lit("Ask an interesting question #"), F.col("_i").cast("string"),
                F.lit(" about "), F.col("topic")))
        )
        seeded = llm_map(seeds, self.serving, "{_seed}", "_seed", "chat")
        conv = MultiTurnConversationGenerator(
            self.serving, "chat", self.rounds, self.output_key).run(seeded)
        return conv.drop("_i", "_seed")
