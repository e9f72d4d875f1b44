"""Named prompt-template library (reference parity by class name).

The reference ships ~7.4k LoC of named prompt classes under
``dataflow/prompts/*`` that pipelines reference by class name through
``PROMPT_REGISTRY`` (reference: dataflow/prompts/__init__.py,
utils/registry.py:259). This package provides the same 98 class names
with the same constructor / ``build_prompt`` / ``build_system_prompt``
signatures and the same OUTPUT CONTRACTS (JSON keys, section markers,
code-fence formats) that downstream parsers key on — the prompt prose
itself is written for this engine, not copied.

Import the package to register everything:

    from dataflow_spark.prompts import PROMPT_REGISTRY, get_prompt
    p = get_prompt("MathQuestionFilterPrompt")
    text = p.build_prompt(question="...")
"""

from dataflow_spark.core.prompt import (DIYPromptABC, PROMPT_REGISTRY,
                                        PromptABC, prompt_restrict)

from dataflow_spark.prompts import (  # noqa: F401  (registration imports)
    agenticrag,
    chemistry,
    code,
    core_text,
    func_call,
    general_text,
    kbcleaning,
    model_evaluation,
    pdf2vqa,
    reasoning,
    text2qa,
    text2sql,
)


def get_prompt(name: str, args: dict | None = None):
    """Instantiate a registered prompt template by name."""
    cls = PROMPT_REGISTRY.get(name)
    return cls(**(args or {}))


# wire the reference's per-operator prompt whitelists onto our classes
from dataflow_spark.prompts.restrictions import apply_restrictions  # noqa: E402

apply_restrictions()


__all__ = ["PROMPT_REGISTRY", "PromptABC", "DIYPromptABC",
           "prompt_restrict", "get_prompt"]
