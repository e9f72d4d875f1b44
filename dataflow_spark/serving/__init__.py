from dataflow_spark.serving.base import EmbeddingServing, LLMServing
from dataflow_spark.serving.mock import MockLLMServing, HashEmbeddingServing
from dataflow_spark.serving.api import (
    APIEmbeddingServing,
    APILLMServing,
    APILLMServing_request,
)
from dataflow_spark.serving.local_model import (
    LocalModelLLMServing,
    LocalModelLLMServing_sglang,
    LocalModelLLMServing_vllm,
)

__all__ = [
    "LLMServing", "EmbeddingServing",
    "MockLLMServing", "HashEmbeddingServing",
    "APILLMServing", "APILLMServing_request", "APIEmbeddingServing",
    "LocalModelLLMServing", "LocalModelLLMServing_vllm",
    "LocalModelLLMServing_sglang",
]
