"""Knowledge-cleaning + agentic-RAG pack (reference:
dataflow/operators/knowledge_cleaning/* and dataflow/operators/agentic_rag/*,
SURVEY.md §2.9).

KBCTextCleaner (knowledge_cleaning/generate/kbc_text_cleaner.py) is a
deterministic markup-scrub chain — pure regexp_replace, oracle-able.
QAExtractor (qa_extractor.py) regex-harvests Q/A pairs and explodes.
The agentic-RAG generators (agenticrag_*_generator.py) are LLM-maps:
atomic task -> depth extension -> width merge (a self-join pairing).
RetrievalGenerator (core_text/generate/retrieval_generator.py) answers
with top-k context retrieved from a corpus DataFrame via brute-force
cosine over embeddings — the reference's async LightRAG call becomes a
broadcast-join retrieval + one LLM-map (async stays inside serving).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator, RefineOperator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.serving.base import EmbeddingServing, LLMServing


@OPERATOR_REGISTRY.register()
class KBCTextCleaner(RefineOperator):
    """Scrub extraction artifacts from knowledge-base text: html tags,
    markdown images/links, repeated headers/dashes, null chars, extra
    blank lines (kbc_text_cleaner.py:208 semantics, regex chain)."""

    RULES = [
        (r"<[^>\n]{1,200}>", ""),               # html tags
        (r"!\[[^\]]*\]\([^)]*\)", ""),           # md images
        (r"\[([^\]]*)\]\([^)]*\)", r"$1"),       # md links -> anchor text
        (r"\x00", ""),                            # nulls
        (r"-{4,}", "---"),                        # dash runs
        (r"={4,}", "==="),                        # equals runs
        (r"[ \t]+\n", "\n"),                      # trailing ws
        (r"\n{3,}", "\n\n"),                      # blank-line runs
    ]

    def refine_expr(self, col: Column) -> Column:
        out = col
        for pat, repl in self.RULES:
            out = F.regexp_replace(out, pat, repl)
        return F.trim(out)


@OPERATOR_REGISTRY.register()
class QAExtractor(Operator):
    """Harvest 'Q: ... A: ...' pairs from text into exploded rows
    (knowledge_cleaning/generate/qa_extractor.py). Pure regexp_extract_all
    + arrays_zip + posexplode — distributed, oracle-able."""

    QA_RE = r"Q:\s*([^\n?]*\??)\s*A:\s*([^\n]*)"

    def __init__(self, input_key: str = "text", question_key: str = "question",
                 answer_key: str = "answer", index_key: str = "q_index"):
        self.input_key = input_key
        self.question_key, self.answer_key = question_key, answer_key
        self.index_key = index_key
        self.input_keys = (input_key,)
        self.output_keys = (question_key, answer_key, index_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        c = F.col(self.input_key)
        qs = F.regexp_extract_all(c, F.lit(self.QA_RE), 1)
        as_ = F.regexp_extract_all(c, F.lit(self.QA_RE), 2)
        pairs = F.arrays_zip(qs.alias("q"), as_.alias("a"))
        out = df.select("*", F.posexplode(pairs).alias(self.index_key, "_qa"))
        return (out.withColumn(self.question_key, F.trim(F.col("_qa.q")))
                .withColumn(self.answer_key, F.trim(F.col("_qa.a")))
                .drop("_qa", self.input_key))


@OPERATOR_REGISTRY.register()
class AgenticRAGAtomicTaskGenerator(Operator):
    """Doc -> atomic task/question (agenticrag atomic_task_generator)."""

    def __init__(self, serving: LLMServing, input_key: str = "text",
                 output_key: str = "atomic_task"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        return llm_map(df, self.serving,
                       "Write one atomic question answerable from: {%s}" % self.input_key,
                       self.input_key, self.output_key)


@OPERATOR_REGISTRY.register()
class AgenticRAGDepthQAGenerator(Operator):
    """Deepen a task n times; each depth level feeds the next prompt
    (agenticrag_depthqa_generator.py). Depth is a sequential chain of
    LLM-maps (bounded, config-time), each fully distributed."""

    def __init__(self, serving: LLMServing, input_key: str = "atomic_task",
                 output_key: str = "depth_task", depth: int = 2):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.depth = depth
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        cur = self.input_key
        out = df
        for level in range(1, self.depth + 1):
            nxt = self.output_key if level == self.depth else f"_depth_{level}"
            out = llm_map(out, self.serving,
                          "Make this question require one more reasoning hop: {%s}" % cur,
                          cur, nxt)
            if cur.startswith("_depth_"):
                out = out.drop(cur)
            cur = nxt
        return out


def dense_index(df: DataFrame, order_key: str, out: str = "_idx") -> DataFrame:
    """Distributed dense 0..n-1 index in ``order_key`` order.

    Range-partition by the key (global order across partitions), then
    ``zipWithIndex`` — a two-pass partition-size scan, no single-reducer
    sort, so it holds at 100 TB where a global ``row_number()`` window
    would funnel through one task.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    sdf = df.repartitionByRange(F.col(order_key)).sortWithinPartitions(order_key)
    schema = StructType(sdf.schema.fields + [StructField(out, LongType())])
    rdd = sdf.rdd.zipWithIndex().map(lambda t: (*t[0], t[1]))
    return sdf.sparkSession.createDataFrame(rdd, schema=schema)


@OPERATOR_REGISTRY.register()
class AgenticRAGWidthQAGenerator(Operator):
    """Merge pairs of tasks into one multi-part question
    (agenticrag_widthqa_generator.py). Pairing = consecutive rows in
    ``id_key`` order via a distributed dense index, then a self-join on
    pair number — no driver loop, no dense-id assumption."""

    def __init__(self, serving: LLMServing, input_key: str = "atomic_task",
                 output_key: str = "width_task", id_key: str = "_row_id"):
        self.serving = serving
        self.input_key, self.output_key = input_key, output_key
        self.id_key = id_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.core.operator import with_row_id
        from dataflow_spark.operators.generate.llm_map import llm_map

        df = with_row_id(df) if self.id_key == "_row_id" else df
        idxed = dense_index(df.select(self.id_key, self.input_key), self.id_key)
        idx = F.col("_idx")
        first = idxed.filter(idx % 2 == 0).select(
            (idx / 2).cast("long").alias("_pair"), F.col(self.input_key).alias("_t1"))
        second = idxed.filter(idx % 2 == 1).select(
            (idx / 2).cast("long").alias("_pair"), F.col(self.input_key).alias("_t2"))
        pairs = first.join(second, "_pair", "inner").withColumn(
            "_p", F.concat(F.lit("Combine into one question: 1) "),
                           F.col("_t1"), F.lit(" 2) "), F.col("_t2")))
        out = llm_map(pairs, self.serving, "{_p}", "_p", self.output_key)
        return out.select("_pair", "_t1", "_t2", self.output_key)


@OPERATOR_REGISTRY.register()
class RetrievalGenerator(Operator):
    """RAG answer: embed query -> top-k corpus chunks by cosine ->
    context-stuffed LLM answer.

    Reference is an async LightRAG call per row
    (retrieval_generator.py:56-84); Spark shape: embedding pandas_udf on
    both sides, broadcast the (small) query side into a cosine top-k
    join, groupBy query to assemble context, one LLM-map. The corpus
    side never collects.
    """

    def __init__(self, serving: LLMServing, embedder: EmbeddingServing,
                 input_key: str = "question", corpus_key: str = "text",
                 output_key: str = "rag_answer", k: int = 3):
        self.serving = serving
        self.embedder = embedder
        self.input_key, self.corpus_key = input_key, corpus_key
        self.output_key = output_key
        self.k = k
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, corpus: DataFrame | None = None, **kw: Any) -> DataFrame:
        assert corpus is not None, "RetrievalGenerator.run(df, corpus=corpus_df)"
        from pyspark.sql.window import Window

        from dataflow_spark.core.operator import with_row_id
        from dataflow_spark.functions.vector import cosine
        from dataflow_spark.operators.generate.embedding import EmbeddingGenerator
        from dataflow_spark.operators.generate.llm_map import llm_map

        df = with_row_id(df)
        q = EmbeddingGenerator(self.embedder, self.input_key, "_q_emb").run(
            df.select("_row_id", self.input_key))
        c = EmbeddingGenerator(self.embedder, "_chunk", "_c_emb").run(
            corpus.select(F.col(self.corpus_key).alias("_chunk")))
        joined = F.broadcast(q).crossJoin(c).withColumn(
            "_sim", cosine(F.col("_q_emb"), F.col("_c_emb")))
        w = Window.partitionBy("_row_id").orderBy(F.desc("_sim"), F.asc("_chunk"))
        topk = joined.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= self.k)
        ctx = (topk.groupBy("_row_id", self.input_key)
               .agg(F.concat_ws("\n", F.collect_list("_chunk")).alias("_ctx"))
               .withColumn("_p", F.concat(F.lit("Context:\n"), F.col("_ctx"),
                                          F.lit("\nQuestion: "), F.col(self.input_key))))
        ans = llm_map(ctx, self.serving, "{_p}", "_p", self.output_key)
        return df.join(ans.select("_row_id", self.output_key), "_row_id", "left").drop("_row_id")
