"""Local in-process model serving seam (vLLM / SGLang).

Reference: LocalModelLLMServing_vllm / LocalModelLLMServing_sglang
(/root/reference/dataflow/serving/local_model_llm_serving.py:11-42,
230+): load a HF model into the driver/executor process and generate
in-process. This container has no torch/vllm, so these classes are a
DOCUMENTED SEAM: constructors validate and store the full reference
parameter surface, and the backend import happens lazily at first
``generate_batch`` — raising a clear ImportError here, working
unchanged where vllm/sglang is installed.

Spark-first note: on a cluster you usually want ONE engine per
executor, not per task — the lazy per-process singleton pattern below
(module-level cache keyed by the full engine-construction config)
gives exactly that when the serving object ships inside a mapInPandas
closure. For a shared GPU pool behind HTTP (vLLM's OpenAI-compatible
server), prefer ``APILLMServing`` — same operator surface, no local
weights.
"""

from __future__ import annotations

import threading
from typing import Any

from dataflow_spark.serving.base import LLMServing

# per-executor-process engine cache. Keyed by the FULL construction
# config, not just the model path: two instances wanting different
# tensor_parallel_size / max_model_len / gpu fractions must not
# silently share whichever engine was built first. A refcount per key
# makes cleanup() by one instance harmless to identical-config siblings
# still holding the engine.
_ENGINE_CACHE: dict[tuple, Any] = {}
_ENGINE_REFS: dict[tuple, int] = {}
_ENGINE_LOCK = threading.Lock()


def _acquire(key: tuple, build):
    """Return the cached engine for ``key`` (building it on first use)
    and count one reference for the calling instance."""
    with _ENGINE_LOCK:
        if key not in _ENGINE_CACHE:
            _ENGINE_CACHE[key] = build()
            _ENGINE_REFS[key] = 0
        _ENGINE_REFS[key] += 1
        return _ENGINE_CACHE[key]


def _release(key: tuple) -> None:
    """Drop one reference; evict the engine only when none remain."""
    with _ENGINE_LOCK:
        if key not in _ENGINE_REFS:
            return
        _ENGINE_REFS[key] -= 1
        if _ENGINE_REFS[key] <= 0:
            _ENGINE_REFS.pop(key, None)
            _ENGINE_CACHE.pop(key, None)


class LocalModelLLMServing_vllm(LLMServing):
    """vLLM-backed local generation (reference constructor surface)."""

    def __init__(self,
                 hf_model_name_or_path: str = None,
                 hf_cache_dir: str = None,
                 hf_local_dir: str = None,
                 vllm_tensor_parallel_size: int = 1,
                 vllm_temperature: float = 0.7,
                 vllm_top_p: float = 0.9,
                 vllm_max_tokens: int = 1024,
                 vllm_top_k: int = 40,
                 vllm_repetition_penalty: float = 1.0,
                 vllm_seed: int = None,
                 vllm_max_model_len: int = None,
                 vllm_gpu_memory_utilization: float = 0.9):
        if not hf_model_name_or_path:
            raise ValueError("hf_model_name_or_path is required")
        self.hf_model_name_or_path = hf_model_name_or_path
        self.hf_cache_dir = hf_cache_dir
        self.hf_local_dir = hf_local_dir
        self.tensor_parallel_size = vllm_tensor_parallel_size
        self.sampling = {
            "temperature": vllm_temperature,
            "top_p": vllm_top_p,
            "max_tokens": vllm_max_tokens,
            "top_k": vllm_top_k,
            "repetition_penalty": vllm_repetition_penalty,
            "seed": vllm_seed,
        }
        self.max_model_len = vllm_max_model_len
        self.gpu_memory_utilization = vllm_gpu_memory_utilization
        self._held_key = None  # set once this instance holds a ref

    # engine handles live in the module-level _ENGINE_CACHE, never on
    # self, so instances pickle cleanly into closures as-is and each
    # executor process rebuilds its engine lazily on first use
    def _engine_key(self) -> tuple:
        # every parameter that shapes the constructed engine
        return ("vllm", self.hf_model_name_or_path, self.hf_local_dir,
                self.hf_cache_dir, self.tensor_parallel_size,
                self.max_model_len, self.gpu_memory_utilization)

    def _engine(self):
        try:
            from vllm import LLM  # type: ignore
        except ImportError as e:  # documented seam
            raise ImportError(
                "LocalModelLLMServing_vllm needs the 'vllm' package "
                "(not in this container). Install vllm on the "
                "executors, or serve the model behind vLLM's "
                "OpenAI-compatible HTTP server and use "
                "APILLMServing instead.") from e

        key = self._engine_key()

        def build():
            return LLM(
                model=self.hf_local_dir or self.hf_model_name_or_path,
                download_dir=self.hf_cache_dir,
                tensor_parallel_size=self.tensor_parallel_size,
                max_model_len=self.max_model_len,
                gpu_memory_utilization=self.gpu_memory_utilization,
            )

        if self._held_key == key:
            with _ENGINE_LOCK:
                if key in _ENGINE_CACHE:
                    return _ENGINE_CACHE[key]
            self._held_key = None  # engine was evicted; re-acquire
        engine = _acquire(key, build)
        self._held_key = key
        return engine

    def generate_batch(self, prompts: list[str]) -> list[str]:
        engine = self._engine()  # raises the documented seam error first
        from vllm import SamplingParams  # type: ignore

        params = SamplingParams(**{k: v for k, v in self.sampling.items()
                                   if v is not None})
        outs = engine.generate(prompts, params)
        return [o.outputs[0].text for o in outs]

    def cleanup(self) -> None:
        if self._held_key is not None:
            _release(self._held_key)
            self._held_key = None


class LocalModelLLMServing_sglang(LLMServing):
    """SGLang-backed local generation (reference constructor surface,
    local_model_llm_serving.py:230+); same lazy-import seam."""

    def __init__(self,
                 hf_model_name_or_path: str = None,
                 hf_cache_dir: str = None,
                 hf_local_dir: str = None,
                 sgl_tensor_parallel_size: int = 1,
                 sgl_temperature: float = 0.7,
                 sgl_top_p: float = 0.9,
                 sgl_max_new_tokens: int = 1024,
                 sgl_mem_fraction_static: float = 0.9,
                 **sgl_kwargs: Any):
        if not hf_model_name_or_path:
            raise ValueError("hf_model_name_or_path is required")
        self.hf_model_name_or_path = hf_model_name_or_path
        self.hf_cache_dir = hf_cache_dir
        self.hf_local_dir = hf_local_dir
        self.tensor_parallel_size = sgl_tensor_parallel_size
        self.sampling = {"temperature": sgl_temperature,
                         "top_p": sgl_top_p,
                         "max_new_tokens": sgl_max_new_tokens}
        self.mem_fraction_static = sgl_mem_fraction_static
        self.extra = sgl_kwargs
        self._held_key = None

    def _engine_key(self) -> tuple:
        return ("sglang", self.hf_model_name_or_path, self.hf_local_dir,
                self.tensor_parallel_size, self.mem_fraction_static,
                tuple(sorted(self.extra.items())))

    def _engine(self):
        try:
            import sglang  # type: ignore  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LocalModelLLMServing_sglang needs the 'sglang' "
                "package (not in this container); use APILLMServing "
                "against an sglang HTTP server instead.") from e
        from sglang import Engine  # type: ignore

        key = self._engine_key()

        def build():
            return Engine(
                model_path=self.hf_local_dir or self.hf_model_name_or_path,
                tp_size=self.tensor_parallel_size,
                mem_fraction_static=self.mem_fraction_static,
                **self.extra)

        if self._held_key == key:
            with _ENGINE_LOCK:
                if key in _ENGINE_CACHE:
                    return _ENGINE_CACHE[key]
            self._held_key = None
        engine = _acquire(key, build)
        self._held_key = key
        return engine

    def generate_batch(self, prompts: list[str]) -> list[str]:
        outs = self._engine().generate(prompts, self.sampling)
        if isinstance(outs, dict):
            outs = [outs]
        return [o["text"] for o in outs]

    def cleanup(self) -> None:
        if self._held_key is not None:
            _release(self._held_key)
            self._held_key = None


# reference alias: pipelines refer to the vllm variant by the short name
LocalModelLLMServing = LocalModelLLMServing_vllm
