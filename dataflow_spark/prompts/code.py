"""Code-pipeline prompt classes (reference:
dataflow/prompts/code.py:1-187).

Output contracts: quality evaluator → "Score: [1-10]" + "Feedback:";
code→instruction → bare instruction text; instruction generators →
docstring'd Python function template inside a raw ``` fence;
instruction→code → bare code without fences.
"""

from __future__ import annotations

from typing import Any

from dataflow_spark.core.prompt import DIYPromptABC, PROMPT_REGISTRY, PromptABC

_FUNC_TEMPLATE = (
    "Please provide a self-contained Python script that solves the "
    "following problem in a markdown code block\n"
    "```\\n"
    "[optional imports if needed]\\n"
    "\\n\\n"
    "def function_name(...)-> ReturnType:\\n"
    "    \"\"\" Problem description derived from the original "
    "instruction.\\n"
    "    Include input/output description and constraints if any.\\n"
    "    Provide at least one doctest example:\\n"
    "    >>> function_name(example_input)\\n"
    "    expected_output\\n"
    "    \"\"\"\\n"
    "```\\n"
)


@PROMPT_REGISTRY.register()
class CodeQualityEvaluatorPrompt(PromptABC):
    """1-10 code quality review; output 'Score:' then 'Feedback:'."""

    def build_prompt(self, instruction: str, code: str) -> str:
        return (
            "You are a meticulous, critical code reviewer. Rate how "
            "well the Generated Code fulfils the Instruction.\n\n"
            f"Instruction: {instruction}\n\n"
            "Generated Code:\n"
            "```python\n"
            f"{code}\n"
            "```\n\n"
            "Judge: (1) correctness & completeness, including edge "
            "cases and required imports; (2) clarity & conventions "
            "(PEP 8); (3) efficiency for the task.\n"
            "Format your response EXACTLY as follows:\n"
            "Score: [integer score from 1 to 10]\n"
            "Feedback: [your feedback here]"
        )


@PROMPT_REGISTRY.register()
class CodeCodeToInstructionGeneratorPrompt(PromptABC):
    """Reverse-engineer the natural instruction behind a code snippet;
    bare instruction text output."""

    def build_prompt(self, code: str) -> str:
        return (
            "Analyze the code snippet below and write the single, "
            "concise natural-language instruction that could have "
            "produced it — a directive like 'Write a function that…'. "
            "No explanations, comments, or markdown; output only the "
            "instruction text.\n\n"
            "Code Snippet:\n"
            "```\n"
            f"{code}\n"
            "```\n\n"
            "Generated Instruction:"
        )


@PROMPT_REGISTRY.register()
class CodeInstructionGeneratePrompt(PromptABC):
    """Generate a NEW instruction in the standardized function-template
    format, seeded by few-shot examples."""

    def build_prompt(self, few_shot_examples) -> str:
        examples_text = ""
        for i, example in enumerate(few_shot_examples, 1):
            instr = (example.get("instruction", example)
                     if isinstance(example, dict) else example)
            examples_text += f"Example {i}:\n{instr}\n\n"
        return (
            "Generate ONE new programming instruction of similar "
            "difficulty and style to the examples, but genuinely "
            "different in content — clear, specific, and solvable.\n\n"
            "Output MUST follow EXACTLY this format (no extra text "
            "before/after):\n"
            + _FUNC_TEMPLATE +
            "GIVEN EXAMPLES:\n"
            f"{examples_text}"
        )


@PROMPT_REGISTRY.register()
class CodeInstructionEnhancement(PromptABC):
    """Normalize an arbitrary instruction into the standardized Python
    function-template format (raw fence, English docstring with
    doctest, no text outside the specified format)."""

    def build_prompt(self, instruction: str) -> str:
        return (
            "Rewrite the programming instruction below into the "
            "standardized Python-function form. Rules: the output is "
            "about ONE Python function; the code fence uses raw ``` "
            "with no language tag and nothing outside the fence except "
            "the first sentence; the docstring is English, multi-line, "
            "and contains the problem description, input/output "
            "description, constraints if any, and at least one doctest "
            "derived from the instruction; clean formatting artifacts "
            "from the original while preserving its meaning; no extra "
            "explanatory text.\n\n"
            "Output MUST follow EXACTLY this format (no extra text "
            "before/after):\n"
            + _FUNC_TEMPLATE +
            "Original instruction:\n"
            f"{instruction}\n"
        )


@PROMPT_REGISTRY.register()
class CodeInstructionToCodeGeneratorPrompt(PromptABC):
    """Implement an instruction; output bare code only (no fences, no
    prose)."""

    def build_prompt(self, instruction: str) -> str:
        return (
            "Write complete, runnable code implementing the "
            "instruction below. Output ONLY the code — no "
            "explanations, no introductory sentences, and no markdown "
            "fences like ```python.\n\n"
            f"Instruction: {instruction}\n"
        )


@PROMPT_REGISTRY.register()
class DiyCodePrompt(DIYPromptABC):
    """User-supplied code prompt template with arbitrary ``{field}``
    slots."""

    def __init__(self, prompt_template: str = "{instruction}"):
        self.prompt_template = prompt_template

    def build_prompt(self, **kwargs: Any) -> str:
        return self.prompt_template.format(**kwargs)
