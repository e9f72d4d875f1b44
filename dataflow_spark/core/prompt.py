"""Prompt-template registry + operator whitelist enforcement.

Reference: PromptABC/DIYPromptABC + PROMPT_REGISTRY
(/root/reference/dataflow/core/prompt.py:6-16, utils/registry.py:259)
and the @prompt_restrict decorator that patches an operator's __init__
to reject prompt templates not whitelisted for it
(core/prompt.py:28-78). Pure driver-side python — ports to the Spark
engine unchanged in shape.
"""

from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from typing import Any, Type

from dataflow_spark.core.registry import Registry

PROMPT_REGISTRY = Registry("prompt")


class PromptABC(ABC):
    """A named prompt template: build_prompt(**kwargs) -> str."""

    @abstractmethod
    def build_prompt(self, **kwargs: Any) -> str: ...

    @classmethod
    def get_desc(cls, lang: str = "en") -> str:
        return (cls.__doc__ or cls.__name__).strip().split("\n")[0]


class DIYPromptABC(PromptABC):
    """User-defined prompt escape hatch: any subclass is accepted by
    every @prompt_restrict operator (reference semantics)."""


def prompt_restrict(*allowed: Type[PromptABC]):
    """Class decorator: wrap __init__ so a ``prompt_template`` argument
    must be an instance of one of ``allowed`` (or any DIYPromptABC).

    Mirrors the reference's decorator-patching approach
    (core/prompt.py:28-78): validation happens at operator construction,
    before any Spark job runs.
    """

    def deco(cls):
        orig_init = cls.__init__

        @functools.wraps(orig_init)
        def init(self, *args: Any, **kwargs: Any) -> None:
            pt = kwargs.get("prompt_template")
            if (pt is not None and isinstance(pt, PromptABC)
                    and not isinstance(pt, DIYPromptABC)
                    and not isinstance(pt, tuple(allowed))):
                names = ", ".join(a.__name__ for a in allowed)
                raise TypeError(
                    f"{cls.__name__} accepts prompt templates [{names}] or any "
                    f"DIYPromptABC, got {type(pt).__name__}")
            orig_init(self, *args, **kwargs)

        cls.__init__ = init
        cls.__allowed_prompts__ = tuple(a.__name__ for a in allowed)
        return cls

    return deco
