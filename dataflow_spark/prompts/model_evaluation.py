"""Answer-judging prompts (reference:
dataflow/prompts/model_evaluation/general.py:1-108).

Output contracts: single-question judges return JSON
``{"judgement_result": true/false}``; the multi-question judge returns
JSON with ``reason`` and a ``judgement_result`` array of "true"/
"false"/"empty" strings, one per sub-question.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_SEMANTIC_RULES = (
    "Judge semantic consistency between the current answer and the "
    "reference answer — compare the answers themselves, not the solution "
    "path, and look past surface wording to the essential content. An "
    "answer that matches the reference in meaning counts as correct even "
    "when phrased differently.\n"
)


@PROMPT_REGISTRY.register()
class AnswerJudgePrompt(PromptABC):
    """Reference-vs-candidate answer equivalence judge (no question
    context); JSON judgement_result output."""

    def build_prompt(self, answer: str, reference_answer: str,
                     question: str = "") -> str:
        return (
            "You are an answer-evaluation expert deciding whether the "
            "answer below is correct.\n"
            f"Reference Answer: {reference_answer}\n"
            f"Current Answer: {answer}\n"
            + _SEMANTIC_RULES +
            "Return your verdict as JSON:\n"
            '{"judgement_result": true} if the answer is correct\n'
            '{"judgement_result": false} if the answer is incorrect\n'
        )


@PROMPT_REGISTRY.register()
class AnswerJudgePromptQuestion(PromptABC):
    """Answer equivalence judge with the question shown; JSON
    judgement_result output."""

    def build_prompt(self, question: str, answer: str,
                     reference_answer: str) -> str:
        return (
            "You are an answer-evaluation expert deciding whether the "
            "answer below is correct for the given question.\n"
            f"Question: {question}\n"
            f"Reference Answer: {reference_answer}\n"
            f"Current Answer: {answer}\n"
            + _SEMANTIC_RULES +
            "Return your verdict as JSON:\n"
            '{"judgement_result": true} if the answer is correct\n'
            '{"judgement_result": false} if the answer is incorrect\n'
        )


@PROMPT_REGISTRY.register()
class AnswerJudgeMultipleQuestionsPrompt(PromptABC):
    """Per-sub-question equivalence judge; JSON output with 'reason' and
    a 'judgement_result' array of "true"/"false"/"empty" strings."""

    def build_prompt(self, answer: str, reference_answer: str,
                     question: str) -> str:
        return (
            "You are an answer-evaluation expert deciding whether the "
            "answer below is correct for the given question.\n"
            f"Question: {question}\n"
            f"Reference Answer: {reference_answer}\n"
            f"Current Answer: {answer}\n"
            + _SEMANTIC_RULES +
            "The question may contain several sub-questions (①②③, "
            "(a)(b), ...). First identify them, then judge the matching "
            "part of the current answer for each, giving a reason per "
            "sub-question. Output JSON whose 'judgement_result' is an "
            "array with one STRING element per sub-question — \"true\", "
            "\"false\", or \"empty\" when the reference answer does not "
            "cover that sub-question; a single question still yields a "
            "one-element array. Example:\n"
            '{"reason": "<per-sub-question reasoning>", '
            '"judgement_result": ["true", "empty"]}\n'
        )
