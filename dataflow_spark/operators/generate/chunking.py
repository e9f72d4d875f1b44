"""Document chunking (knowledge-cleaning surface).

Reference: KBCChunkGenerator — token/sentence/recursive chunking
(knowledge_cleaning/generate/kbc_chunk_generator.py:20-76,107). Spark
shape: build the chunk array as a Column expression, posexplode to one
row per chunk with a stable chunk_idx. Pure JVM expressions, so the
char/sentence modes are DuckDB-oracle-mirrorable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


def char_chunks(col: Column, size: int, overlap: int = 0) -> Column:
    """Fixed-size char windows with overlap; step = size - overlap."""
    step = size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(col) - overlap).cast("double") / step).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(idx, lambda i: col.substr(i * step + 1, F.lit(size)))


def sentence_chunks(col: Column) -> Column:
    """Split at sentence boundaries ([.!?]+), trimmed, empties dropped."""
    return F.filter(
        F.transform(F.split(col, r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


@OPERATOR_REGISTRY.register()
class ChunkGenerator(Operator):
    """text -> one row per chunk with chunk_idx (mode: char|sentence).

    'recursive' (split to target size at sentence boundaries, fall back
    to char windows for oversize sentences) composes the two modes.
    """

    def __init__(self, input_key: str = "text", mode: str = "char",
                 chunk_size: int = 1000, overlap: int = 0,
                 chunk_key: str = "chunk", idx_key: str = "chunk_idx"):
        self.input_key = input_key
        self.mode = mode
        self.chunk_size = chunk_size
        self.overlap = overlap
        self.chunk_key, self.idx_key = chunk_key, idx_key
        self.input_keys = (input_key,)
        self.output_keys = (chunk_key, idx_key)

    def chunks_expr(self) -> Column:
        c = F.col(self.input_key)
        if self.mode == "char":
            return char_chunks(c, self.chunk_size, self.overlap)
        if self.mode == "sentence":
            return sentence_chunks(c)
        if self.mode == "recursive":
            # sentence pieces; oversize sentences re-chunked by chars
            return F.flatten(
                F.transform(
                    sentence_chunks(c),
                    lambda s: F.when(
                        F.length(s) <= self.chunk_size, F.array(s)
                    ).otherwise(char_chunks(s, self.chunk_size, self.overlap)),
                )
            )
        raise ValueError(f"unknown chunk mode {self.mode!r}")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        keep = [c for c in df.columns]
        return df.select(
            *keep, F.posexplode(self.chunks_expr()).alias(self.idx_key, self.chunk_key)
        )
