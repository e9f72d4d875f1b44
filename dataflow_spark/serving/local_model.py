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
(module-level cache keyed by model path) gives exactly that when the
serving object ships inside a mapInPandas closure. For a shared GPU
pool behind HTTP (vLLM's OpenAI-compatible server), prefer
``APILLMServing`` — same operator surface, no local weights.
"""

from __future__ import annotations

from typing import Any

from dataflow_spark.serving.base import LLMServing

# per-executor-process engine cache: one engine per model path no
# matter how many tasks run in the process
_ENGINE_CACHE: dict[str, Any] = {}


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

    # engine handles live in the module-level _ENGINE_CACHE, never on
    # self, so instances pickle cleanly into closures as-is and each
    # executor process rebuilds its engine lazily on first use
    def _engine(self):
        key = f"vllm::{self.hf_model_name_or_path}"
        if key not in _ENGINE_CACHE:
            try:
                from vllm import LLM  # type: ignore
            except ImportError as e:  # documented seam
                raise ImportError(
                    "LocalModelLLMServing_vllm needs the 'vllm' package "
                    "(not in this container). Install vllm on the "
                    "executors, or serve the model behind vLLM's "
                    "OpenAI-compatible HTTP server and use "
                    "APILLMServing instead.") from e
            _ENGINE_CACHE[key] = LLM(
                model=self.hf_local_dir or self.hf_model_name_or_path,
                download_dir=self.hf_cache_dir,
                tensor_parallel_size=self.tensor_parallel_size,
                max_model_len=self.max_model_len,
                gpu_memory_utilization=self.gpu_memory_utilization,
            )
        return _ENGINE_CACHE[key]

    def generate_batch(self, prompts: list[str]) -> list[str]:
        engine = self._engine()  # raises the documented seam error first
        from vllm import SamplingParams  # type: ignore

        params = SamplingParams(**{k: v for k, v in self.sampling.items()
                                   if v is not None})
        outs = engine.generate(prompts, params)
        return [o.outputs[0].text for o in outs]

    def cleanup(self) -> None:
        _ENGINE_CACHE.pop(f"vllm::{self.hf_model_name_or_path}", None)


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

    def _engine(self):
        key = f"sglang::{self.hf_model_name_or_path}"
        if key not in _ENGINE_CACHE:
            try:
                import sglang  # type: ignore  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "LocalModelLLMServing_sglang needs the 'sglang' "
                    "package (not in this container); use APILLMServing "
                    "against an sglang HTTP server instead.") from e
            from sglang import Engine  # type: ignore

            _ENGINE_CACHE[key] = Engine(
                model_path=self.hf_local_dir or self.hf_model_name_or_path,
                tp_size=self.tensor_parallel_size,
                mem_fraction_static=self.mem_fraction_static,
                **self.extra)
        return _ENGINE_CACHE[key]

    def generate_batch(self, prompts: list[str]) -> list[str]:
        outs = self._engine().generate(prompts, self.sampling)
        if isinstance(outs, dict):
            outs = [outs]
        return [o["text"] for o in outs]

    def cleanup(self) -> None:
        _ENGINE_CACHE.pop(f"sglang::{self.hf_model_name_or_path}", None)


# reference alias: pipelines refer to the vllm variant by the short name
LocalModelLLMServing = LocalModelLLMServing_vllm
