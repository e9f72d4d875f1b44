"""OpenAI-compatible HTTP serving backends.

Reference surface: APILLMServing_request
(/root/reference/dataflow/serving/api_llm_serving_request.py:14-60 —
api_url / key_name_of_api_key / model_name / temperature / max_workers,
thread-pool fan-out, retry) and the embeddings variant used by
EmbeddingGenerator.

Spark-first difference: the serving object ships inside the mapInPandas
closure, so the thread pool fans out PER EXECUTOR TASK over that task's
micro-batch — aggregate concurrency scales with the cluster
(tasks x max_workers), not with one driver-side pool. Only stdlib
(urllib) is used so the closure stays dependency-free on executors.
"""

from __future__ import annotations

import json
import os
import urllib.request
from concurrent.futures import ThreadPoolExecutor

from dataflow_spark.serving.base import EmbeddingServing, LLMServing


def _post_json(url: str, payload: dict, headers: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


class APILLMServing(LLMServing):
    """Chat-completions backend for any OpenAI-compatible endpoint.

    The API key is looked up from the environment variable named by
    ``key_name_of_api_key`` lazily AT CALL TIME on the executor (never
    serialized into the closure, mirroring the reference's env-var-only
    policy). An empty/absent key sends no Authorization header, which
    suits local servers (vLLM, llama.cpp, ollama).
    """

    def __init__(self, api_url: str = "https://api.openai.com/v1/chat/completions",
                 key_name_of_api_key: str = "DF_API_KEY",
                 model_name: str = "gpt-4o",
                 temperature: float = 0.0,
                 max_workers: int = 10,
                 read_timeout: float = 120.0,
                 system_prompt: str = "",
                 max_tokens: int | None = None):
        self.api_url = api_url
        self.key_name_of_api_key = key_name_of_api_key
        self.model_name = model_name
        self.temperature = temperature
        self.max_workers = max_workers
        self.read_timeout = read_timeout
        self.system_prompt = system_prompt
        self.max_tokens = max_tokens

    def _headers(self) -> dict:
        key = os.environ.get(self.key_name_of_api_key, "")
        return {"Authorization": f"Bearer {key}"} if key else {}

    def _one(self, prompt: str) -> str:
        messages = []
        if self.system_prompt:
            messages.append({"role": "system", "content": self.system_prompt})
        messages.append({"role": "user", "content": prompt})
        payload: dict = {"model": self.model_name, "messages": messages,
                         "temperature": self.temperature}
        if self.max_tokens is not None:
            payload["max_tokens"] = self.max_tokens
        out = _post_json(self.api_url, payload, self._headers(), self.read_timeout)
        return out["choices"][0]["message"]["content"]

    def generate_batch(self, prompts: list[str]) -> list[str]:
        if not prompts:
            return []
        with ThreadPoolExecutor(max_workers=min(self.max_workers,
                                                len(prompts))) as pool:
            return list(pool.map(self._one, prompts))


class APIEmbeddingServing(EmbeddingServing):
    """Embeddings backend for any OpenAI-compatible /embeddings endpoint."""

    def __init__(self, api_url: str = "https://api.openai.com/v1/embeddings",
                 key_name_of_api_key: str = "DF_API_KEY",
                 model_name: str = "text-embedding-3-small",
                 dim: int = 1536,
                 read_timeout: float = 120.0):
        self.api_url = api_url
        self.key_name_of_api_key = key_name_of_api_key
        self.model_name = model_name
        self.dim = dim
        self.read_timeout = read_timeout

    def _headers(self) -> dict:
        key = os.environ.get(self.key_name_of_api_key, "")
        return {"Authorization": f"Bearer {key}"} if key else {}

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            return []
        out = _post_json(self.api_url,
                         {"model": self.model_name, "input": texts},
                         self._headers(), self.read_timeout)
        data = sorted(out["data"], key=lambda d: d["index"])
        return [d["embedding"] for d in data]


# reference-exact class name
APILLMServing_request = APILLMServing
