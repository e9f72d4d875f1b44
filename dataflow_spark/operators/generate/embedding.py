"""EmbeddingGenerator — add an array<float> embedding column.

Reference: core_text/generate/embedding_generator.py:54-72. Spark shape:
mapInPandas with per-executor lazy backend; default backend is the
deterministic HashEmbeddingServing (no model weights in this container),
real backends implement EmbeddingServing.embed_batch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.serving.base import EmbeddingServing
from dataflow_spark.serving.mock import HashEmbeddingServing


@OPERATOR_REGISTRY.register()
class EmbeddingGenerator(Operator):
    def __init__(self, serving: EmbeddingServing | None = None,
                 input_key: str = "text", output_key: str = "embedding"):
        self.serving = serving or HashEmbeddingServing()
        self.input_key, self.output_key = input_key, output_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        schema = StructType(
            df.schema.fields + [StructField(self.output_key, ArrayType(FloatType()))]
        )
        serving, key, out = self.serving, self.input_key, self.output_key

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[out] = serving.embed_batch(pdf[key].fillna("").tolist())
                yield pdf

        return df.mapInPandas(gen, schema=schema)
