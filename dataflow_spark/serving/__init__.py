from dataflow_spark.serving.base import LLMServing
from dataflow_spark.serving.mock import MockLLMServing, HashEmbeddingServing

__all__ = ["LLMServing", "MockLLMServing", "HashEmbeddingServing"]
