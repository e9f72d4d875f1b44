"""Core text prompt (reference: dataflow/prompts/core_text.py:1-31)."""

from __future__ import annotations

import re
from typing import Any

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_FIELD_RE = re.compile(r"\{(\w+)\}")


@PROMPT_REGISTRY.register()
class FormatStrPrompt(PromptABC):
    """f-string-style template prompt: fields are parsed from the
    template automatically; ``build_prompt(need_fields, **kwargs)``
    substitutes them. ``on_missing``: 'raise' | 'empty'.
    """

    def __init__(self, f_str_template: str = "{input_text}",
                 on_missing: str = "raise"):
        if on_missing not in ("raise", "empty"):
            raise ValueError("on_missing must be 'raise' or 'empty'")
        self.f_str_template = f_str_template
        self.on_missing = on_missing
        self.fields = sorted(set(_FIELD_RE.findall(f_str_template)))

    def build_prompt(self, need_fields=None, **kwargs: Any) -> str:
        need = list(need_fields) if need_fields is not None else self.fields
        missing = [f for f in need if f not in kwargs]
        if missing:
            if self.on_missing == "raise":
                raise KeyError(f"Missing fields for prompt: {missing}")
            for f in missing:
                kwargs[f] = ""
        out = self.f_str_template
        for key, value in kwargs.items():
            out = out.replace("{" + key + "}", str(value))
        return out
