"""User-template reasoning prompts (reference:
dataflow/prompts/reasoning/diy.py:1-40). All are DIYPromptABC — the
escape hatch every @prompt_restrict operator accepts.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import DIYPromptABC, PROMPT_REGISTRY


@PROMPT_REGISTRY.register()
class DiyAnswerGeneratorPrompt(DIYPromptABC):
    """Custom answer-generation template; the question is appended and
    the 'Solution:' start contract is enforced like the built-in
    generator."""

    def __init__(self, prompt_template: str = ""):
        self.prompt_template = prompt_template

    def build_prompt(self, question: str) -> str:
        return (self.prompt_template + question +
                "Your response must start directly with \"Solution:\" "
                "without any preamble. Finish your response immediately "
                "after the solution.")


@PROMPT_REGISTRY.register()
class DiyQuestionFilterPrompt(DIYPromptABC):
    """Custom question-filter template with a ``{question}`` slot."""

    def __init__(self, prompt_template: str = "{question}"):
        self.prompt_template = prompt_template

    def build_prompt(self, question: str) -> str:
        return self.prompt_template.format(question=question)


@PROMPT_REGISTRY.register()
class DiyQuestionSynthesisPrompt(DIYPromptABC):
    """Custom question-synthesis template with a ``{question}`` slot."""

    def __init__(self, prompt_template: str = "{question}"):
        self.prompt_template = prompt_template

    def build_prompt(self, question: str) -> str:
        return self.prompt_template.format(question=question)
