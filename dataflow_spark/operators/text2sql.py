"""Text2SQL operator suite (reference: dataflow/operators/text2sql/*,
SURVEY.md §2.10) — the reference's only SQL-aware operators.

- SQLGenerator: LLM writes SQL per (database x complexity) — the
  cross-join fan-out shape (sql_generator.py:80-90) expressed as an
  actual cross join + LLM-map.
- SQLExecutionFilter: keep rows whose SQL is a SELECT/WITH (after
  comment stripping, sql_execution_filter.py:38-48) AND executes OK on
  the source database. Execution happens executor-side via mapInPandas
  with a per-task sqlite connection + timeout — the Spark analogue of
  the reference's driver-side batch_execute_queries.
- SQLComponentClassifier: Spider-style hardness from SQL component
  counts (sql_component_classifier.py) as a deterministic expression.
- Text2SQLPromptGenerator: training prompt = format string over schema
  + question (text2sql_prompt_generator.py) — pure projection.
"""

from __future__ import annotations

import re
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.serving.base import LLMServing

COMMENT_RE = re.compile(r"(--[^\n]*)|(/\*.*?\*/)", re.DOTALL)


def strip_sql_comments(sql: str) -> str:
    return COMMENT_RE.sub("", sql or "").strip()


def is_select_like(sql: str) -> bool:
    head = strip_sql_comments(sql).lstrip("(").lstrip().upper()
    return head.startswith("SELECT") or head.startswith("WITH")


@OPERATOR_REGISTRY.register()
class SQLGenerator(Operator):
    """LLM writes SQL for every (db, complexity) pair x generate_num.

    Fan-out: db catalog CROSS JOIN complexity levels CROSS JOIN
    sequence(1, n) — distributed row generation, then one LLM-map.
    Extracts the last ```sql ...``` block like the reference
    (sql_generator.py:107-116).
    """

    COMPLEXITIES = ["simple", "moderate", "complex", "highly complex"]

    def __init__(self, serving: LLMServing, generate_num: int = 2,
                 output_key: str = "SQL"):
        self.serving = serving
        self.generate_num = generate_num
        self.output_key = output_key
        self.input_keys = ("db_id", "schema_ddl")
        self.output_keys = (output_key, "sql_complexity_type")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        levels = F.array(*[F.lit(c) for c in self.COMPLEXITIES])
        fanned = (
            df.withColumn("sql_complexity_type", F.explode(levels))
            .withColumn("_gen_i", F.explode(F.sequence(F.lit(1), F.lit(self.generate_num))))
            .withColumn(
                "_prompt",
                F.concat_ws(
                    "\n",
                    F.lit("Write one SQL query."),
                    F.concat(F.lit("-- complexity: "), F.col("sql_complexity_type")),
                    F.concat(F.lit("-- schema: "), F.col("schema_ddl")),
                    F.concat(F.lit("-- variant: "), F.col("_gen_i").cast("string")),
                ),
            )
        )
        out = llm_map(fanned, self.serving, "{_prompt}", "_prompt", "_raw")
        sql = F.regexp_extract(F.col("_raw"), r"```sql\s*([\s\S]*?)\s*```\s*$", 1)
        return (
            out.withColumn(
                self.output_key,
                F.when(sql != "", F.trim(sql)).otherwise(F.trim(F.col("_raw"))))
            .drop("_prompt", "_raw", "_gen_i")
        )


@OPERATOR_REGISTRY.register()
class SQLExecutionFilter(Operator):
    """Keep SELECT/WITH statements that execute successfully.

    Executor-side sqlite (stdlib) with a per-statement progress-handler
    timeout — no driver bottleneck, one connection per task, same
    semantics as the reference's timeout taxonomy
    (sql_execution_filter.py:57-95).
    """

    def __init__(self, db_path: str | None = None, sql_key: str = "SQL",
                 timeout_ms: int = 2000, keep_label: bool = False,
                 vec: bool = False, embedder=None):
        self.db_path = db_path  # None -> in-memory empty db (syntax gate)
        self.sql_key = sql_key
        self.timeout_ms = timeout_ms
        self.keep_label = keep_label
        # vec=True: VecSQL mode — each executor connection goes through
        # SQLiteVecConnector (native sqlite-vec when installed, the
        # pure-python distance-function fallback + MATCH-KNN lowering
        # otherwise), and lembed(...) rewrites via `embedder` (must be
        # picklable: HashEmbeddingServing or an API embedding serving)
        self.vec = vec
        self.embedder = embedder
        self.input_keys = (sql_key,)
        self.output_keys = ("sql_ok",) if keep_label else ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        schema = StructType(df.schema.fields + [StructField("sql_ok", BooleanType())])
        sql_key, db_path, timeout_ms = self.sql_key, self.db_path, self.timeout_ms
        vec, embedder = self.vec, self.embedder

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import sqlite3

            if vec:
                from dataflow_spark.sources.database_manager import (
                    SQLiteVecConnector)

                vc = SQLiteVecConnector(embedder=embedder)
                con = vc.connect({"path": db_path or ":memory:"})
                prep = vc.preprocess_sql
            else:
                con = sqlite3.connect(db_path or ":memory:")
                prep = lambda s: s  # noqa: E731
            # abort long-running statements (reference timeout semantics)
            budget = {"n": 0}

            def handler():
                budget["n"] += 1
                return 1 if budget["n"] > timeout_ms else 0

            con.set_progress_handler(handler, 10_000)
            for pdf in batches:
                oks = []
                for sql in pdf[sql_key]:
                    if not is_select_like(sql or ""):
                        oks.append(False)
                        continue
                    budget["n"] = 0
                    try:
                        con.execute(prep(strip_sql_comments(sql))).fetchmany(10)
                        oks.append(True)
                    except Exception:
                        oks.append(False)
                pdf = pdf.copy()
                pdf["sql_ok"] = oks
                yield pdf
            con.close()

        out = df.mapInPandas(gen, schema=schema)
        out = out.filter(F.col("sql_ok"))
        return out if self.keep_label else out.drop("sql_ok")


@OPERATOR_REGISTRY.register()
class SQLComponentClassifier(Operator):
    """Spider-style hardness label from SQL component counts.

    Deterministic keyword census (JOIN/GROUP/ORDER/nested/agg), mapped
    to easy/medium/hard/extra like the reference's EvalHardness
    (sql_component_classifier.py). Pure Column expressions.
    """

    def __init__(self, sql_key: str = "SQL", output_key: str = "sql_hardness"):
        self.sql_key, self.output_key = sql_key, output_key
        self.input_keys = (sql_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        up = F.upper(F.col(self.sql_key))

        def count_kw(kw_re: str):
            return F.coalesce(F.regexp_count(up, F.lit(kw_re)), F.lit(0))

        components = (
            count_kw(r"\bJOIN\b") + count_kw(r"\bGROUP BY\b")
            + count_kw(r"\bORDER BY\b") + count_kw(r"\bHAVING\b")
            + count_kw(r"\b(UNION|INTERSECT|EXCEPT)\b")
            + count_kw(r"\b(SUM|AVG|MIN|MAX|COUNT)\s*\(")
        )
        nested = count_kw(r"\(\s*SELECT\b")
        score = components + 2 * nested
        label = (
            F.when(score <= 1, "easy")
            .when(score <= 3, "medium")
            .when(score <= 6, "hard")
            .otherwise("extra")
        )
        return df.withColumn(self.output_key, label)


@OPERATOR_REGISTRY.register()
class Text2SQLPromptGenerator(Operator):
    """Build the training prompt from schema DDL + NL question — a pure
    format_string projection (text2sql_prompt_generator.py)."""

    TEMPLATE = ("You are a SQL expert.\nSchema:\n%s\nQuestion: %s\n"
                "Answer with a single SQL query.")

    def __init__(self, schema_key: str = "schema_ddl", question_key: str = "question",
                 output_key: str = "prompt"):
        self.schema_key, self.question_key = schema_key, question_key
        self.output_key = output_key
        self.input_keys = (schema_key, question_key)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return df.withColumn(
            self.output_key,
            F.format_string(self.TEMPLATE, F.col(self.schema_key), F.col(self.question_key)),
        )


@OPERATOR_REGISTRY.register()
class SQLVariationGenerator(Operator):
    """LLM mutates existing SQL into n variants
    (text2sql/generate/sql_variation_generator.py) — explode fan-out +
    one LLM-map; the variant SQL replaces the input column, original kept
    as ``orig_sql``."""

    def __init__(self, serving: LLMServing, sql_key: str = "SQL",
                 num_variations: int = 2):
        self.serving = serving
        self.sql_key = sql_key
        self.num_variations = num_variations
        self.input_keys = (sql_key,)
        self.output_keys = (sql_key, "orig_sql", "variation_id")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        fanned = (
            df.withColumn("orig_sql", F.col(self.sql_key))
            .withColumn("variation_id",
                        F.explode(F.sequence(F.lit(1), F.lit(self.num_variations))))
            .withColumn("_p", F.concat(
                F.lit("Rewrite this SQL differently (variant "),
                F.col("variation_id").cast("string"), F.lit("):\n"),
                F.col("orig_sql")))
        )
        out = llm_map(fanned, self.serving, "{_p}", "_p", "_raw")
        sql = F.regexp_extract(F.col("_raw"), r"```sql\s*([\s\S]*?)\s*```\s*$", 1)
        return (out.withColumn(
            self.sql_key,
            F.when(sql != "", F.trim(sql)).otherwise(F.trim(F.col("_raw"))))
            .drop("_p", "_raw"))


@OPERATOR_REGISTRY.register()
class SQLByColumnGenerator(Operator):
    """Column-driven SQL synthesis: one prompt per (table, column) drawn
    from the schema DDL (text2sql/generate/sql_by_column_generator.py).
    Columns are regex-harvested from the DDL and exploded."""

    def __init__(self, serving: LLMServing, schema_key: str = "schema_ddl",
                 output_key: str = "SQL"):
        self.serving = serving
        self.schema_key = schema_key
        self.output_key = output_key
        self.input_keys = (schema_key,)
        self.output_keys = (output_key, "target_column")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        cols = F.regexp_extract_all(
            F.col(self.schema_key),
            F.lit(r"(?:\(|,)\s*([A-Za-z_][A-Za-z_0-9]*)\s+(?:INT|TEXT|REAL|FLOAT|VARCHAR|BOOL)"),
            1)
        fanned = (df.withColumn("target_column", F.explode(cols))
                  .withColumn("_p", F.concat(
                      F.lit("Write a SQL query centered on column '"),
                      F.col("target_column"), F.lit("' of schema:\n"),
                      F.col(self.schema_key))))
        out = llm_map(fanned, self.serving, "{_p}", "_p", "_raw")
        sql = F.regexp_extract(F.col("_raw"), r"```sql\s*([\s\S]*?)\s*```\s*$", 1)
        return (out.withColumn(
            self.output_key,
            F.when(sql != "", F.trim(sql)).otherwise(F.trim(F.col("_raw"))))
            .drop("_p", "_raw"))


@OPERATOR_REGISTRY.register()
class Text2SQLQuestionGenerator(Operator):
    """LLM writes the natural-language question for a SQL query
    (text2sql/generate/text2sql_question_generator.py)."""

    def __init__(self, serving: LLMServing, sql_key: str = "SQL",
                 output_key: str = "question"):
        self.serving = serving
        self.sql_key, self.output_key = sql_key, output_key
        self.input_keys = (sql_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        return llm_map(df, self.serving,
                       "State the question this SQL answers: {%s}" % self.sql_key,
                       self.sql_key, self.output_key)


@OPERATOR_REGISTRY.register()
class Text2SQLCoTGenerator(Operator):
    """LLM produces a chain-of-thought solution for (question, schema)
    (text2sql/generate/text2sql_cot_generator.py)."""

    def __init__(self, serving: LLMServing, question_key: str = "question",
                 schema_key: str = "schema_ddl", output_key: str = "cot"):
        self.serving = serving
        self.question_key, self.schema_key = question_key, schema_key
        self.output_key = output_key
        self.input_keys = (question_key, schema_key)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        tmp = df.withColumn("_p", F.concat(
            F.lit("Think step by step. Schema:\n"), F.col(self.schema_key),
            F.lit("\nQuestion: "), F.col(self.question_key)))
        return llm_map(tmp, self.serving, "{_p}", "_p", self.output_key).drop("_p")


@OPERATOR_REGISTRY.register()
class SQLCoTVotingGenerator(Operator):
    """k CoT samples -> extract final SQL -> majority vote per row
    (text2sql/generate/text2sql_cot_voting_generator.py). Same
    distributed-mode shape as ReasoningPseudoAnswerGenerator."""

    def __init__(self, serving: LLMServing, question_key: str = "question",
                 output_key: str = "voted_sql", k: int = 3, id_key: str = "_row_id"):
        self.serving = serving
        self.question_key, self.output_key = question_key, output_key
        self.k = k
        self.id_key = id_key
        self.input_keys = (question_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from pyspark.sql.window import Window

        from dataflow_spark.core.operator import with_row_id
        from dataflow_spark.operators.generate.llm_map import llm_map

        df = with_row_id(df) if self.id_key == "_row_id" else df
        fanned = (df.select(self.id_key, self.question_key)
                  .withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(self.k))))
                  .withColumn("_p", F.concat(
                      F.lit("Answer with SQL (attempt "), F.col("_i").cast("string"),
                      F.lit("): "), F.col(self.question_key))))
        gen = llm_map(fanned, self.serving, "{_p}", "_p", "_raw")
        sql = F.regexp_extract(F.col("_raw"), r"```sql\s*([\s\S]*?)\s*```\s*$", 1)
        ex = gen.withColumn("_sql", F.when(sql != "", F.trim(sql))
                            .otherwise(F.trim(F.col("_raw"))))
        votes = ex.groupBy(self.id_key, "_sql").agg(F.count("*").alias("_v"))
        w = Window.partitionBy(self.id_key).orderBy(F.desc("_v"), F.asc("_sql"))
        winner = (votes.withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("_rk") == 1)
                  .select(self.id_key, F.col("_sql").alias(self.output_key)))
        out = df.join(winner, self.id_key, "left")
        return out.drop("_row_id") if self.id_key == "_row_id" else out


@OPERATOR_REGISTRY.register()
class SQLExecutabilityFilter(Operator):
    """Plan-only executability gate: EXPLAIN (sqlite) instead of running
    the query (text2sql/filter/sql_executability_filter.py) — cheaper
    than SQLExecutionFilter, same executor-side connection pattern."""

    def __init__(self, db_path: str | None = None, sql_key: str = "SQL",
                 keep_label: bool = False, vec: bool = False,
                 embedder=None):
        self.db_path = db_path
        self.sql_key = sql_key
        self.keep_label = keep_label
        self.vec = vec  # VecSQL mode — see SQLExecutionFilter
        self.embedder = embedder
        self.input_keys = (sql_key,)
        self.output_keys = ("sql_explain_ok",) if keep_label else ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        schema = StructType(df.schema.fields
                            + [StructField("sql_explain_ok", BooleanType())])
        sql_key, db_path = self.sql_key, self.db_path
        vec, embedder = self.vec, self.embedder

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import sqlite3

            if vec:
                from dataflow_spark.sources.database_manager import (
                    SQLiteVecConnector)

                vc = SQLiteVecConnector(embedder=embedder)
                con = vc.connect({"path": db_path or ":memory:"})
                prep = vc.preprocess_sql
            else:
                con = sqlite3.connect(db_path or ":memory:")
                prep = lambda s: s  # noqa: E731
            for pdf in batches:
                oks = []
                for sql in pdf[sql_key]:
                    if not is_select_like(sql or ""):
                        oks.append(False)
                        continue
                    try:
                        con.execute("EXPLAIN " + prep(strip_sql_comments(sql)))
                        oks.append(True)
                    except Exception:
                        oks.append(False)
                pdf = pdf.copy()
                pdf["sql_explain_ok"] = oks
                yield pdf
            con.close()

        out = df.mapInPandas(gen, schema=schema).filter(F.col("sql_explain_ok"))
        return out if self.keep_label else out.drop("sql_explain_ok")


@OPERATOR_REGISTRY.register()
class SQLExecutionClassifier(Operator):
    """Label (not filter) each SQL by execution outcome:
    ok / error / not_select (text2sql/eval/sql_execution_classifier.py)."""

    def __init__(self, db_path: str | None = None, sql_key: str = "SQL",
                 output_key: str = "exec_status", timeout_ms: int = 2000,
                 vec: bool = False, embedder=None):
        self.db_path = db_path
        self.sql_key, self.output_key = sql_key, output_key
        self.timeout_ms = timeout_ms
        self.vec = vec  # VecSQL mode — see SQLExecutionFilter
        self.embedder = embedder
        self.input_keys = (sql_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        schema = StructType(df.schema.fields
                            + [StructField(self.output_key, StringType())])
        sql_key, db_path, out_key = self.sql_key, self.db_path, self.output_key
        timeout_ms, vec, embedder = self.timeout_ms, self.vec, self.embedder

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import sqlite3

            if vec:
                from dataflow_spark.sources.database_manager import (
                    SQLiteVecConnector)

                vc = SQLiteVecConnector(embedder=embedder)
                con = vc.connect({"path": db_path or ":memory:"})
                prep = vc.preprocess_sql
            else:
                con = sqlite3.connect(db_path or ":memory:")
                prep = lambda s: s  # noqa: E731
            budget = {"n": 0}

            def handler():
                budget["n"] += 1
                return 1 if budget["n"] > timeout_ms else 0

            con.set_progress_handler(handler, 10_000)
            for pdf in batches:
                labels = []
                for sql in pdf[sql_key]:
                    if not is_select_like(sql or ""):
                        labels.append("not_select")
                        continue
                    budget["n"] = 0
                    try:
                        con.execute(prep(strip_sql_comments(sql))).fetchmany(10)
                        labels.append("ok")
                    except Exception:
                        labels.append("error")
                pdf = pdf.copy()
                pdf[out_key] = labels
                yield pdf
            con.close()

        return df.mapInPandas(gen, schema=schema)


@OPERATOR_REGISTRY.register()
class Text2SQLCorrespondenceFilter(Operator):
    """LLM judges question<->SQL consistency; keep 'yes' verdicts
    (text2sql/filter/text2sql_correspondence_filter.py)."""

    def __init__(self, serving: LLMServing, question_key: str = "question",
                 sql_key: str = "SQL"):
        self.serving = serving
        self.question_key, self.sql_key = question_key, sql_key
        self.input_keys = (question_key, sql_key)
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from dataflow_spark.operators.generate.llm_map import llm_map

        tmp = df.withColumn("_p", F.concat(
            F.lit("Does this SQL answer the question? Reply yes/no.\nQ: "),
            F.col(self.question_key), F.lit("\nSQL: "), F.col(self.sql_key)))
        out = llm_map(tmp, self.serving, "{_p}", "_p", "_verdict")
        return (out.filter(F.lower(F.col("_verdict")).rlike(r"\byes\b"))
                .drop("_p", "_verdict"))
