"""General-reasoning prompts (reference:
dataflow/prompts/reasoning/general.py:1-105).

Output contracts preserved: the answer generator demands a response
starting with "Solution:" with arrow-prefixed steps; the filter demands
a final JSON object with keys ``judgement_test`` / ``error_type``.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class GeneralAnswerGeneratorPrompt(PromptABC):
    """Structured step-by-step solution for an arbitrary reasoning task."""

    def build_prompt(self, question: str) -> str:
        return (
            "You are a careful reasoning assistant. Solve the task below "
            "and output ONLY the solution — no preamble, no commentary "
            "afterwards.\n"
            "Work through these stages in order:\n"
            "1. Identify the key components and premises of the task\n"
            "2. Apply the relevant principles, theorems, or methods with a "
            "step-by-step derivation\n"
            "3. Perform calculations or logical checks, verifying "
            "intermediate results\n"
            "4. State the final conclusion in clear, unambiguous notation\n\n"
            "Formatting rules:\n"
            "- Prefix every derivation step with the arrow symbol →\n"
            "- Use proper markup for symbols (LaTeX for math, code "
            "formatting for code)\n\n"
            "The task to solve:\n" + question +
            "\nYour response must start directly with \"Solution:\" and end "
            "immediately after the solution."
        )


@PROMPT_REGISTRY.register()
class GeneralQuestionSynthesisPrompt(PromptABC):
    """Synthesize a new reasoning task from an original via named
    transformations (``items`` describes which to emphasize)."""

    def build_prompt(self, items: str, question: str) -> str:
        return (
            "Create one new, self-contained, solvable reasoning task "
            "derived from the original below. Apply transformations with "
            f"emphasis on all of: \"{items}\". Options include: changing "
            "quantities or data; switching the task type or domain "
            "(calculation↔proof, derivation↔algorithm design); "
            "reframing in a different real-world context; adding premises "
            "or constraints that require separate or conditional handling; "
            "raising complexity with interdependent steps or branching "
            "cases; or varying the required output form (proof, "
            "pseudocode, annotated explanation, numeric answer).\n\n"
            "Original task:\n" + question + "\n\n"
            "Start your reply directly with the new task statement — no "
            "framing phrases — and stop immediately after it."
        )


@PROMPT_REGISTRY.register()
class GeneralQuestionFilterPrompt(PromptABC):
    """Four-stage validity check on a reasoning task; final output is a
    JSON object with keys judgement_test / error_type."""

    def build_prompt(self, question: str) -> str:
        return (
            "You are given a candidate reasoning task. Run these checks "
            "in order and stop at the first failure:\n"
            "0. The input must contain exactly one clear reasoning task — "
            "no extra instructions (\"rewrite\", \"translate\") and no "
            "bundled answer; otherwise fail.\n"
            "1. Check spelling, grammar, and formatting (code "
            "indentation, LaTeX, Markdown) without judging semantics.\n"
            "2. Check every minimal premise against commonsense, domain "
            "facts, and the task's own requirements (fantastical "
            "operations are fine only if explicitly assumed).\n"
            "3. Check for contradictions among premises or in the implied "
            "reasoning, and for clearly unreasonable or unsolvable "
            "results.\n"
            "4. Check that the information given suffices to complete the "
            "task; missing necessary conditions fail, redundant detail is "
            "acceptable.\n\n"
            "You may show your reasoning, but your FINAL output must be "
            "exactly this JSON object:\n"
            "{\n"
            '    "judgement_test": true/false,\n'
            '    "error_type": "<error description or null>"\n'
            "}\n\n"
            "Content to evaluate:\n"
            "-------------------------------\n"
            f"{question}\n"
            "-------------------------------\n"
        )
