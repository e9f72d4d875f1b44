"""Text-to-QA prompt classes (reference:
dataflow/prompts/text2qa.py:1-337).

Output contracts: the four scorers emit ``**Grading**: [1-5]`` plus a
``**Feedback**:`` section; the seed-question generator demands
``Q: ... / A: ...`` lines; the multi-hop generator demands a strict
JSON object with question / reasoning_steps / answer /
supporting_facts / type.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class Text2QAAutoPromptGeneratorPrompt(PromptABC):
    """Derive QA-generation prompts from a piece of seed data."""

    def build_prompt(self, seed_data: str) -> str:
        return (
            "You will receive seed data (a paragraph, dialogue, or other "
            "text) containing potential question-answer material. "
            "Produce as many distinct, effective prompts as you can, "
            "each usable to instruct a language model to generate QA "
            "pairs from input like this. Every prompt must: describe "
            "the expected input type and format; require questions that "
            "are clear, focused, and target specific factual content; "
            "require answers that are a few concise, directly "
            "verifiable words (not sentences) to enable automatic "
            "reward computation; and keep both simple enough for "
            "automatic evaluation. Do not add commentary and do not "
            "repeat the seed data. Output the prompts as a list, one "
            "per line, in the form:\n"
            "1. <prompt>\n2. <prompt>\n...\n\n"
            "Seed data:\n" + seed_data
        )


@PROMPT_REGISTRY.register()
class Text2QASeedQuestionGeneratorPrompt(PromptABC):
    """Instruction prefix for generating one QA pair from seed text."""

    def build_prompt(self) -> str:
        return (
            "Generate one factual question-and-answer pair grounded in "
            "the seed data that follows. The question must target a "
            "specific verifiable fact; the answer must be a few concise "
            "words taken from the data.\n"
            "Format:\nQ: ...\nA: ..." + "\nSeed data:\n"
        )


class _RubricScorer(PromptABC):
    """Shared 1-5 rubric scorer shape: **Grading** + **Feedback**."""

    INTRO = ""
    RUBRIC = ""
    FEEDBACK = ""

    def build_prompt(self) -> str:
        return (
            f"{self.INTRO}\n\n"
            "Assign a score from 1 to 5 using this rubric:\n"
            f"{self.RUBRIC}\n"
            "Output format:\n"
            "**Grading**: [1-5]\n\n"
            f"**Feedback**: {self.FEEDBACK}\n\n"
        )


@PROMPT_REGISTRY.register()
class Text2QAQuestionQualityPrompt(_RubricScorer):
    """Question clarity/meaningfulness scorer."""

    INTRO = ("You are an expert question-quality evaluator. Given a "
             "single question from a QA dataset, judge its clarity and "
             "meaningfulness: is it clearly defined, unambiguous, and "
             "worth asking in a real-world or task-specific context?")
    RUBRIC = ("5 = Very clear and meaningful question, well-posed\n"
              "4 = Clear but slightly underspecified or too general\n"
              "3 = Somewhat unclear or poorly scoped, but "
              "understandable\n"
              "2 = Ambiguous, vague, or unnatural\n"
              "1 = Nonsensical or meaningless")
    FEEDBACK = ("Explain the score; note ambiguity, over-breadth, or "
                "missing practical purpose, and suggest improvements.")


@PROMPT_REGISTRY.register()
class Text2QAAnswerAlignmentPrompt(_RubricScorer):
    """Whether an answer directly addresses its question."""

    INTRO = ("You are a response-alignment evaluator. Judge whether the "
             "given answer directly and clearly addresses the given "
             "question.")
    RUBRIC = ("5 = Fully and directly answers the question\n"
              "4 = Mostly addresses it, with minor gaps or irrelevant "
              "additions\n"
              "3 = Partially answers it but omits key aspects\n"
              "2 = Barely addresses it or is off-topic\n"
              "1 = Completely unrelated to the question")
    FEEDBACK = ("Justify the score; flag evasive, incomplete, or "
                "misaligned answers and how to fix them.")


@PROMPT_REGISTRY.register()
class Text2QAAnswerVerifiabilityPrompt(_RubricScorer):
    """How objectively checkable an answer is."""

    INTRO = ("You are an evaluator of answer verifiability. Judge how "
             "easily the correctness of the answer can be checked "
             "against objective evidence.")
    RUBRIC = ("5 = Very easy to verify; objective, concrete, "
              "unambiguous\n"
              "4 = Mostly verifiable with minor interpretation\n"
              "3 = Verifiable in part; mixes fact and judgement\n"
              "2 = Hard to verify; vague, speculative, or "
              "opinion-based\n"
              "1 = Unverifiable")
    FEEDBACK = ("Explain what makes the answer checkable or not, and "
                "how to make it more concrete.")


@PROMPT_REGISTRY.register()
class Text2QADownstreamValuePrompt(_RubricScorer):
    """Usefulness of the QA pair for downstream training/eval."""

    INTRO = ("You are an evaluator of downstream value. Judge how "
             "useful this QA pair is for downstream tasks such as "
             "training or automatic evaluation.")
    RUBRIC = ("5 = Highly valuable; question and answer are precise "
              "and informative\n"
              "4 = Valuable with small limitations\n"
              "3 = Moderately helpful; limited informativeness or "
              "specificity\n"
              "2 = Low value; trivial or redundant\n"
              "1 = No downstream value")
    FEEDBACK = ("Explain the value judgement and what would raise it.")


@PROMPT_REGISTRY.register()
class Text2MultiHopQAGeneratorPrompt(PromptABC):
    """Multi-hop QA synthesis with strict JSON output; ``lang`` selects
    the instruction language ('en'/'zh' — both demand identical JSON
    structure)."""

    def __init__(self, lang: str = "en"):
        if lang not in ("en", "zh"):
            raise ValueError("lang must be 'en' or 'zh'")
        self.lang = lang

    _STRUCTURE = (
        "{\n"
        '  "question": "...",\n'
        '  "reasoning_steps": [\n'
        '    {"step": "Must explicitly use Fact 1"},\n'
        '    {"step": "Must explicitly link Fact 2"}\n'
        "  ],\n"
        '  "answer": "...",\n'
        '  "supporting_facts": ["Verbatim Fact 1", "Verbatim Fact 2"],\n'
        '  "type": "..."\n'
        "}\n"
    )

    def build_system_prompt(self) -> str:
        if self.lang == "zh":
            return (
                "你是多跳问答构造器。从给定文本中提取至少两条独立事实，"
                "设计一个需要跨事实推理的问题；每个推理步骤必须引用一条"
                "事实，最终答案必须综合所有推理结论。输出规范：只允许输"
                "出以下结构的纯JSON，JSON外不得出现任何文本：\n"
                + self._STRUCTURE)
        return (
            "You are a multi-hop QA constructor. Extract at least two "
            "independent facts from the given text and design a complex "
            "question requiring cross-fact reasoning; each reasoning "
            "step must cite one fact, and the final answer must "
            "synthesize all reasoning conclusions. Output "
            "specification: emit ONLY pure JSON in this structure — any "
            "non-JSON content invalidates the output:\n"
            + self._STRUCTURE)

    def build_prompt(self, text: str) -> str:
        if self.lang == "zh":
            return ("请基于以下文本构造一个多跳问答，使用上述精确JSON结构"
                    "（包括所有引号和括号）：\n" + text)
        return (
            "Construct one multi-hop QA from the text below, using the "
            "exact JSON structure above (include all quotes/braces):\n"
            + text)
