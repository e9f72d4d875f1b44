"""Core text prompt: the f-string template wrapper.

Reference: dataflow/prompts/core_text.py:1-31 (FormatStrPrompt). This
is the workhorse template class — FormatStrPromptedGenerator and
BenchAnswerGenerator are whitelisted to it — so the engine version
adds two conveniences the raw reference lacks while keeping the same
surface: the field list is precomputed at construction (``.fields``),
and substitution is slot-by-slot string replacement, so template text
containing stray braces (JSON examples, code snippets) never raises
the way ``str.format`` would.
"""

from __future__ import annotations

import re
from functools import cached_property
from typing import Any, Iterable, Optional

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_FIELD_RE = re.compile(r"\{(\w+)\}")
_MISSING_MODES = ("raise", "empty")


@PROMPT_REGISTRY.register()
class FormatStrPrompt(PromptABC):
    """Template prompt over ``{field}`` slots.

    ``build_prompt(need_fields, **kwargs)`` substitutes the kwargs into
    the template; ``need_fields`` defaults to the fields parsed from
    the template itself. ``on_missing`` selects what a missing field
    does: ``'raise'`` (KeyError listing the gaps) or ``'empty'``
    (substitute empty strings).
    """

    def __init__(self, f_str_template: str = "{input_text}",
                 on_missing: str = "raise"):
        if on_missing not in _MISSING_MODES:
            raise ValueError(f"on_missing must be one of {_MISSING_MODES}")
        self.f_str_template = f_str_template
        self.on_missing = on_missing

    @cached_property
    def fields(self) -> list[str]:
        """Field names parsed from the template, sorted, deduplicated
        (parsed once — build_prompt runs per row inside LLM-map)."""
        return sorted(set(_FIELD_RE.findall(self.f_str_template)))

    def _resolve(self, need_fields: Optional[Iterable[str]],
                 kwargs: dict) -> dict:
        need = list(need_fields) if need_fields is not None else self.fields
        gaps = [f for f in need if f not in kwargs]
        if not gaps:
            return kwargs
        if self.on_missing == "raise":
            raise KeyError(f"Missing fields for prompt: {gaps}")
        return {**kwargs, **{f: "" for f in gaps}}

    def build_prompt(self, need_fields=None, **kwargs: Any) -> str:
        values = self._resolve(need_fields, kwargs)
        out = self.f_str_template
        for key, value in values.items():
            out = out.replace("{" + key + "}", str(value))
        return out
