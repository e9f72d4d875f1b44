"""pdf2vqa / structured-output operators (reference:
dataflow/operators/pdf2vqa/generate/{llm_output_parser,vqa_formatter,
qa_merger}.py and knowledge_cleaning's MathBookQuestionExtract).

LLMOutputParser turns a raw structured LLM reply into typed columns
(regex field extraction — pure expressions). VQAFormatter is a
projection building the VQA training record. QAMerger explodes a
list-of-struct QA column (qa_merger.py:40-64 — the reference's only
explode). MathBookQuestionExtract regex-harvests numbered exercise
blocks from book text.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class LLMOutputParser(Operator):
    """Extract named fields from a structured LLM reply.

    ``fields`` maps output column -> regex with one capture group,
    e.g. {"question": r"Q:\\s*(.+)", "answer": r"A:\\s*(.+)"}; empty
    match -> null. Pure regexp_extract — stays in codegen.
    """

    DEFAULT_FIELDS = {
        "question": r"(?i)question[:\s]+([^\n]+)",
        "answer": r"(?i)answer[:\s]+([^\n]+)",
    }

    def __init__(self, input_key: str = "llm_output",
                 fields: dict[str, str] | None = None):
        self.input_key = input_key
        self.fields = fields or dict(self.DEFAULT_FIELDS)
        self.input_keys = (input_key,)
        self.output_keys = tuple(self.fields)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        for out_col, pattern in self.fields.items():
            s = F.regexp_extract(F.col(self.input_key), pattern, 1)
            df = df.withColumn(out_col, F.when(s != "", F.trim(s)))
        return df


@OPERATOR_REGISTRY.register()
class VQAFormatter(Operator):
    """Build the VQA training record: conversations = [user(image tag +
    question), assistant(answer)] (vqa_formatter.py) — pure projection."""

    def __init__(self, question_key: str = "question", answer_key: str = "answer",
                 image_key: str = "image_path", output_key: str = "conversations"):
        self.question_key, self.answer_key = question_key, answer_key
        self.image_key = image_key
        self.output_key = output_key
        self.input_keys = (question_key, answer_key, image_key)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        user = F.struct(
            F.lit("user").alias("role"),
            F.concat(F.lit("<image>"), F.col(self.image_key), F.lit("</image> "),
                     F.col(self.question_key)).alias("content"))
        asst = F.struct(F.lit("assistant").alias("role"),
                        F.col(self.answer_key).alias("content"))
        return df.withColumn(self.output_key, F.array(user, asst))


@OPERATOR_REGISTRY.register()
class QAMerger(Operator):
    """Explode a list-of-struct QA column into one row per item with its
    index (qa_merger.py:64 ``dataframe.explode``)."""

    def __init__(self, input_key: str = "qa_items", index_key: str = "qa_index"):
        self.input_key = input_key
        self.index_key = index_key
        self.input_keys = (input_key,)
        self.output_keys = (index_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        keep = [c for c in df.columns if c != self.input_key]
        out = df.select(*keep,
                        F.posexplode(self.input_key).alias(self.index_key, "_qa"))
        item_fields = df.schema[self.input_key].dataType.elementType.fieldNames()
        for f in item_fields:
            out = out.withColumn(f, F.col("_qa." + f))
        return out.drop("_qa")


@OPERATOR_REGISTRY.register()
class MathBookQuestionExtract(Operator):
    """Harvest numbered exercise blocks ('1. ...', 'Problem 3: ...')
    from book text into exploded (q_number, question) rows
    (knowledge_cleaning/generate/mathbook_question_extract.py)."""

    PATTERN = r"(?:(?:Problem|Exercise)\s+(\d+)[.:]|^(\d+)\.)\s*([^\n]+)"

    def __init__(self, input_key: str = "text", question_key: str = "question",
                 number_key: str = "q_number"):
        self.input_key = input_key
        self.question_key, self.number_key = question_key, number_key
        self.input_keys = (input_key,)
        self.output_keys = (question_key, number_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        c = F.col(self.input_key)
        pat = F.lit(r"(?m)" + self.PATTERN)
        nums1 = F.regexp_extract_all(c, pat, 1)
        nums2 = F.regexp_extract_all(c, pat, 2)
        qs = F.regexp_extract_all(c, pat, 3)
        nums = F.zip_with(nums1, nums2,
                          lambda a, b: F.when(a != "", a).otherwise(b))
        pairs = F.arrays_zip(nums.alias("n"), qs.alias("q"))
        out = df.select("*", F.explode(pairs).alias("_mb"))
        return (out.withColumn(self.number_key,
                               F.col("_mb.n").try_cast("int"))
                .withColumn(self.question_key, F.trim(F.col("_mb.q")))
                .drop("_mb", self.input_key))


@OPERATOR_REGISTRY.register()
class PDFMerger(Operator):
    """Merge per-page rows back into one row per document: pages sorted
    by page number, text concatenated with a page separator
    (pdf2vqa/generate/pdf_merger.py:34-72).

    Spark shape: groupBy(doc) + sort_array over collected (page, text)
    structs — one shuffle on the doc key; page order is explicit in the
    data, not partition order.
    """

    def __init__(self, doc_key: str = "doc_id", page_key: str = "page",
                 text_key: str = "text", separator: str = "\n\n"):
        self.doc_key, self.page_key, self.text_key = doc_key, page_key, text_key
        self.separator = separator
        self.input_keys = (doc_key, page_key, text_key)
        self.output_keys = (text_key, "n_pages")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        pages = F.sort_array(F.collect_list(
            F.struct(F.col(self.page_key).alias("p"),
                     F.col(self.text_key).alias("t"))))
        return (
            df.groupBy(self.doc_key)
            .agg(pages.alias("_pages"))
            .select(
                self.doc_key,
                F.array_join(F.transform(F.col("_pages"), lambda s: s["t"]),
                             self.separator).alias(self.text_key),
                F.size("_pages").alias("n_pages"),
            )
        )
