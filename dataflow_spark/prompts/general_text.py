"""General-text prompt classes (reference:
dataflow/prompts/general_text.py:1-1412).

Output contracts preserved per class: Phi4 → "Question:"/"Answer:"
tagged dialogue; SFT generators → JSON with instruction/input/output;
MetaPrompt → six analysis paragraphs + final line ``[s1,...,s6]``;
Alpagasus → first line is the numeric score; Treeinstruct → last line
is the bare node count; ConsistentChat query mode → JSON with
category/turns; Condor → tagged sections; LanguageFilter → bare
language name.

The reference embeds multi-hundred-line topic/domain pools in
ConsistentChatPrompt/CondorQuestionPrompt; here the pools are compact
representative defaults, extensible via the constructor — the pool is
DATA, not prompt semantics.
"""

from __future__ import annotations

from typing import Any, List, Optional

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class Phi4QAGeneratorPrompt(PromptABC):
    """Turn a paragraph into Question:/Answer: conversational pairs."""

    def build_prompt(self, content: str) -> str:
        return (
            "Rewrite the paragraph below as a short conversation "
            "consisting of one or more \"Question:\" lines each followed "
            "by an \"Answer:\" line. Ground every answer in the "
            "paragraph's content. Output ONLY lines in exactly this "
            "form:\n"
            "Question: <question about the paragraph>\n"
            "Answer: <answer supported by the paragraph>\n\n"
            "Paragraph:\n" + content
        )


@PROMPT_REGISTRY.register()
class SFTGeneratorSeedPrompt(PromptABC):
    """Generate one SFT sample from raw content, steered by a custom
    instruction; JSON output with keys instruction / output."""

    def __init__(self, custom_prompt: str = ""):
        self.custom_prompt = custom_prompt

    def build_prompt(self, content: str = "") -> str:
        custom = (f"Extra requirements from the user: {self.custom_prompt}\n"
                  if self.custom_prompt else "")
        return (
            "You are creating high-quality supervised fine-tuning data "
            "for LLM training. From the raw content below, write ONE "
            "instruction-following sample: a realistic user instruction "
            "that the content can answer, and a complete, helpful "
            "response.\n"
            + custom +
            "Output MUST be a single JSON object of exactly this shape "
            "and nothing else:\n"
            "{\n"
            '  "instruction": "QUESTION",\n'
            '  "output": "ANSWER"\n'
            "}\n\n"
            "Raw content:\n" + content
        )


@PROMPT_REGISTRY.register()
class MetaPrompt(PromptABC):
    """Six-dimension text quality evaluation; output ends with a final
    line holding a Python-style list of six integer scores."""

    def __init__(self, dimensions: Optional[List[dict]] = None):
        self.raw_dimensions = dimensions or []
        self.dimensions = self._format_dimensions(self.raw_dimensions)

    @staticmethod
    def _format_dimensions(dimensions: List[dict]) -> List[str]:
        out = []
        for i, item in enumerate(dimensions, 1):
            name = item.get("dimension_name", f"dimension_{i}")
            desc = item.get("description", "")
            block = f"{i}. {name}: {desc}"
            examples = item.get("example_list", [])
            for ex in examples:
                block += (f'\nExample (Score: {ex.get("score", "?")}):\n'
                          f'"{ex.get("text", "")}"')
            out.append(block)
        return out

    def build_system_prompt(self) -> str:
        dims = "\n\n".join(self.dimensions) if self.dimensions else (
            "1. Clarity\n2. Coherence\n3. Accuracy\n4. Completeness\n"
            "5. Style\n6. Usefulness")
        return (
            "You are an expert text-quality evaluator. Assess the given "
            "text on the six dimensions listed below (each may include "
            "scored examples — higher is better; use them for "
            "calibration):\n"
            f"{dims}\n\n"
            "Instructions:\n"
            "- Write one short evaluation paragraph per dimension.\n"
            "- Score each dimension with an integer 1-5 "
            "(5=Excellent, 4=Good, 3=Fair, 2=Poor, 1=Very Poor).\n"
            "- End with a SEPARATE final line containing only a "
            "Python-style list of the six integers, e.g.:\n"
            "  [5, 4, 3, 5, 4, 5]\n"
        )

    def build_prompt(self, text: str) -> str:
        return (
            "Analyze and evaluate the following text:\n\n"
            f"Text:\n{text}\n\n"
            "Your output must contain one analysis paragraph per "
            "dimension and a final line of exactly:\n"
            "  [score1, score2, score3, score4, score5, score6]\n"
        )


@PROMPT_REGISTRY.register()
class AlpagasusPrompt(PromptABC):
    """Alpagasus-style 0-5 rating of an (instruction, input, response)
    triple along one dimension; score on the first output line."""

    def __init__(self, dimension: str = "quality"):
        self.dimension = dimension

    def build_system_prompt(self, instruction: str, input_text: str,
                            response: str) -> str:
        return (
            "Assess the AI assistant's performance on the exchange "
            "below.\n"
            f"Instruction: {instruction}\n"
            f"Input: {input_text}\n"
            f"Response: {response}\n"
        )

    def build_prompt(self) -> str:
        return (
            f"Rate the {self.dimension} of the response on a 0 to 5 "
            f"scale, where higher means greater {self.dimension}. Output "
            "a single line containing only the numeric score, then on "
            "the following line give a thorough justification of your "
            "rating."
        )


@PROMPT_REGISTRY.register()
class TreeinstructPrompt(PromptABC):
    """Treeinstruct complexity measure: semantic-parse the instruction
    to a tree and report the node count as the bare last line."""

    def build_system_prompt(self, instruction: str) -> str:
        return (
            "You analyze instruction complexity via semantic parsing. "
            "Parse the instruction below into a semantic tree (each "
            "content word/constraint a node) and count the nodes.\n"
            f"Instruction: {instruction}\n"
            "You may show the tree, but the LAST line of your output "
            "must contain only the node count as a bare number — no "
            "symbols, no backticks."
        )

    def build_prompt(self) -> str:
        return ""


@PROMPT_REGISTRY.register()
class ConsistentChatPrompt(PromptABC):
    """Topic-consistent multi-turn dialogue synthesis (ConsistentChat).

    ``mode='query'`` returns a LIST of prompts (one per intent x
    num_dialogs_per_intent) each demanding JSON
    ``{"category": ..., "turns": [...]}``; ``mode='response'`` returns
    one prompt simulating assistant turns for the given queries.
    """

    QUERY_INTENT_CATEGORIES = {
        "Problem Solving Interaction": [
            "From Problem Diagnosis to Solution Optimization"],
        "Educational Interaction": [
            "From Broad Theory to Specific Scenarios",
            "From Basic Concepts to Cross-Domain Connections"],
        "Health Consultation Interaction": [
            "From Problem Diagnosis to Solution Optimization",
            "From Hypothesis Testing to Substantive Discussion"],
        "Exploratory Interaction": [
            "From Time Sequence Expansion to Explore Causes and Effects",
            "From Hypothesis Testing to Substantive Discussion"],
        "Entertainment Interaction": [
            "From Single Perspective to Multiple Perspectives",
            "From Hypothesis Testing to Substantive Discussion"],
        "Simulation Interaction": [
            "From User Needs to Solutions",
            "From Broad Theory to Specific Scenarios"],
        "Emotional Support Interaction": [
            "From Single Perspective to Multiple Perspectives",
            "From User Needs to Solutions"],
        "Information Retrieval Interaction": [
            "From Basic Concepts to Cross-Domain Connections",
            "From Time Sequence Expansion to Explore Causes and Effects"],
        "Transaction Interaction": [
            "From User Needs to Solutions",
            "From Problem Diagnosis to Solution Optimization"],
    }

    # compact representative topic pools (the reference carries dozens
    # per intent; the pool is data, not semantics — extend via __init__)
    QUERY_TOPIC_DICT = {
        "Problem Solving Interaction": [
            "Troubleshooting Wi-Fi network issues",
            "Fixing a leaking faucet"],
        "Educational Interaction": [
            "Understanding how vaccines work",
            "Learning linear algebra fundamentals"],
        "Health Consultation Interaction": [
            "Managing seasonal allergies",
            "Building a beginner exercise routine"],
        "Exploratory Interaction": [
            "The history of the printing press",
            "Why supply chains fail under shocks"],
        "Entertainment Interaction": [
            "Choosing a board game for a family night",
            "Discussing a classic science-fiction novel"],
        "Simulation Interaction": [
            "Role-playing a job interview",
            "Simulating a customer support call"],
        "Emotional Support Interaction": [
            "Coping with exam stress",
            "Dealing with a difficult coworker"],
        "Information Retrieval Interaction": [
            "Finding official visa requirement information",
            "Looking up nutrition information for meals"],
        "Transaction Interaction": [
            "Booking an international flight",
            "Comparing mobile phone plans"],
    }

    def __init__(self, intent_categories: dict | None = None,
                 topic_dict: dict | None = None):
        self.query_intent_categories = (intent_categories
                                        or self.QUERY_INTENT_CATEGORIES)
        self.query_topic_dict = topic_dict or self.QUERY_TOPIC_DICT

    def _query_prompt(self, info_flow: str, topic: str) -> str:
        return (
            "Generate a multi-turn sequence of USER questions for a "
            "single conversation with high topic consistency.\n"
            "Rules:\n"
            "1. Do not copy the topic's exact wording into the "
            "questions; abstract it into natural conversational "
            "language.\n"
            "2. Follow this dialogue information flow across the turns: "
            f"{info_flow}\n"
            "3. Keep the flow natural and realistically interactive; "
            "avoid polished or templated phrasing.\n"
            "Output Format — JSON only:\n"
            "{\n"
            '  "category": "<Core Topic of the Conversation>",\n'
            '  "turns": ["<turn_1>", "<turn_2>", "<turn_3>", "..."]\n'
            "}\n"
            f"The input core topic for this task is: {topic}\n"
        )

    def build_prompt(self, mode: str, num_dialogs_per_intent: int = None,
                     topic: str = None, queries: list | None = None,
                     **kw: Any):
        if mode == "query":
            if topic is not None or queries is not None:
                raise ValueError(
                    "topic and queries must be None when mode is 'query'")
            if num_dialogs_per_intent is None:
                raise ValueError(
                    "num_dialogs_per_intent is required when mode is "
                    "'query'")
            prompts = []
            for intent, flows in self.query_intent_categories.items():
                topics = self.query_topic_dict.get(intent, ["everyday life"])
                for i in range(num_dialogs_per_intent):
                    # deterministic rotation instead of random.choice:
                    # same inputs -> same prompt set on every engine
                    info_flow = flows[i % len(flows)]
                    t = topics[i % len(topics)]
                    prompts.append(self._query_prompt(info_flow, t))
            return prompts
        if mode == "response":
            if topic is None or queries is None:
                raise ValueError(
                    "topic and queries are required when mode is "
                    "'response'")
            if num_dialogs_per_intent is not None:
                raise ValueError(
                    "num_dialogs_per_intent must be None when mode is "
                    "'response'")
            qlist = ", ".join(f"User query: {q}" for q in queries)
            return (
                "Simulate the assistant side of a multi-turn "
                "conversation, answering each user question below in "
                "order under the topic "
                f"\"{topic}\".\n"
                "Rules:\n"
                "- Answer the current question completely and concisely; "
                "do not pose new questions unless directly relevant to a "
                "later query.\n"
                "- Do not answer future queries early, but leave natural "
                "openings for them where appropriate.\n"
                "- Keep responses informative with minimal filler.\n"
                "queries:\n"
                f"{qlist}\n"
            )
        raise ValueError("mode must be 'query' or 'response'")


@PROMPT_REGISTRY.register()
class CondorQuestionPrompt(PromptABC):
    """Condor two-stage synthesis, question stage: three difficulty-
    graded questions about a (theme, domain) pair, tagged sections."""

    TAG = {
        "Knowledge": {
            "Science": ["Physics Basics", "Biology in Daily Life",
                        "Astronomy Discoveries"],
            "Technology": ["Network Technology", "Cybersecurity",
                           "Blockchain Applications"],
        },
        "Life": {
            "Healthcare": ["Fitness Methods", "Nutrition Planning",
                           "Sleep Hygiene"],
            "Finance": ["Stock Investment Strategies",
                        "Fund Risk Management", "Insurance Planning"],
        },
        "Culture": {
            "Art": ["Painting Techniques", "Sculpture Creation",
                    "Photography Themes"],
            "Literature": ["Literary Works", "Creative Writing Skills",
                           "Literary Criticism"],
        },
    }

    def __init__(self, tag: dict | None = None):
        self.tag = tag or self.TAG

    def build_prompt(self, theme: str, domain: str) -> str:
        return (
            "You are generating diverse training questions. For the "
            f"theme \"{theme}\" in the domain \"{domain}\", write three "
            "distinct questions a real user might ask, one per "
            "difficulty level: easy (factual), medium (applied), hard "
            "(analytical/comparative). Vary phrasing and perspective; "
            "do not reuse the theme's literal wording in every "
            "question.\n"
            "Reply strictly in this format:\n"
            "[Easy][Question]: <question>\n"
            "[Medium][Question]: <question>\n"
            "[Hard][Question]: <question>\n"
        )


@PROMPT_REGISTRY.register()
class CondorRefinePrompt(PromptABC):
    """Condor critique-then-refine loop; ``mode`` selects the stage."""

    def build_prompt(self, mode: str, question: str = None,
                     answer: str = None, critique: str = None) -> str:
        if mode == "critique":
            return (
                "You are a strict reviewer. Critique the answer below "
                "along accuracy, completeness, clarity, and relevance "
                "to the question. Be specific about every weakness.\n"
                f"Question: {question}\n"
                f"Answer: {answer}\n"
                "Your critique must strictly adhere to the following "
                "format:\n"
                "[Critique]: <your detailed critique>\n"
            )
        if mode == "refine":
            return (
                "Improve the answer below by fully addressing the "
                "critique while keeping everything that was already "
                "correct.\n"
                f"Question: {question}\n"
                f"Answer: {answer}\n"
                f"Critique: {critique}\n"
                "Your improved answer must strictly adhere to the "
                "following format:\n"
                "[Refined Answer]: <your improved answer>\n"
            )
        raise ValueError("mode must be 'critique' or 'refine'")


@PROMPT_REGISTRY.register()
class LanguageFilterPrompt(PromptABC):
    """LLM language identification; output is the bare language name."""

    def build_prompt(self, text: str) -> str:
        return (
            "You are a language-identification expert. Identify the "
            "language of the text below. Do not translate or explain — "
            "output only the language name (e.g. English, Chinese, "
            "Spanish).\n"
            f"Text: {text}\n"
        )


@PROMPT_REGISTRY.register()
class SFTFromScratchGeneratorPrompt(PromptABC):
    """Generate one premium SFT sample for given domains as single-line
    JSON with keys instruction / input / output."""

    def build_prompt(self, domain_keys: str) -> str:
        return (
            "Generate ONE premium-quality SFT training sample for the "
            f"domain(s): {domain_keys}.\n"
            "Field requirements:\n"
            "- instruction: a realistic, specific user request in "
            "natural language\n"
            "- input: additional context only when it enhances the "
            "scenario, otherwise an empty string\n"
            "- output: a comprehensive, expert-level response that "
            "fully satisfies the instruction\n"
            "Constraints: vary complexity across simple and advanced "
            "scenarios, respect privacy (no personal data), and emit "
            "VALID JSON on a single line with no surrounding text. "
            "Example shape:\n"
            '{"instruction": "...", "input": "", "output": "..."}\n'
            "Output only the JSON."
        )
