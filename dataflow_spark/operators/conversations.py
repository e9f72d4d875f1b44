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
