"""Agentic-RAG task-generation prompts (reference:
dataflow/prompts/agenticrag.py:1-1921).

Output contracts preserved per family: identifier extraction → JSON
{"content_identifier"}; conclusions → JSON array of {conclusion, R};
question generation → JSON {"Q"} / {"new_query"}; QA cleaning → JSON
{question, original_answer, refined_answer}; recall scoring → 0/1/2
consistency score as JSON {"answer_score"}; optional answers → JSON
list of strings; answer list → JSON {"answer_list"}; multi-hop checks
→ JSON {valid, error_type, justification}; width-QA merge/verify →
JSON arrays with index/complex_question fields; EssEq judge → 0/1/2
score.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_RECALL_RUBRIC = (
    "Score the consistency of the OTHER answer against the GOLDEN "
    "answer:\n"
    "- 2 points: the information is completely consistent (wording may "
    "differ).\n"
    "- 1 point: the other answer contains ALL of the golden answer's "
    "information plus additional valid information.\n"
    "- 0 points: the other answer is missing key information from the "
    "golden answer, or the two contradict each other.\n"
    "Examples: golden 'Interest rates should be raised and inflation "
    "monitored' vs other 'It is necessary to raise interest rates and "
    "monitor inflation' → 2; golden 'The interest rates should be "
    "raised.' vs other 'The interest rates should be raised and "
    "inflation should be monitored.' → 1; the reverse direction → 0.\n"
)


class _IdentifierPrompt(PromptABC):
    """Extract the content identifier (main subject) from a question;
    JSON {"content_identifier"} output."""

    def build_system_prompt(self) -> str:
        return (
            "Extract the content_identifier from a question: the main "
            "subject or noun phrase the question is about — a series "
            "name, organization, document title, or other unique "
            "identifier, not the asked-for attribute. Examples: "
            "'What is the third movie in the Avatar series?' → "
            "'Avatar series'. Return JSON with the single key "
            "\"content_identifier\"."
        )

    def build_prompt(self, input) -> str:
        return f"Now process this question:{input}"


class _RecallScorePrompt(PromptABC):
    """0/1/2 golden-vs-other answer consistency; JSON
    {"answer_score"} output."""

    def build_system_prompt(self) -> str:
        return (
            _RECALL_RUBRIC +
            "Return JSON with the single integer key "
            "\"answer_score\"."
        )

    def build_prompt(self, golden_answer: str, llm_answer: str) -> str:
        return (f"Golden answer: {golden_answer}\n"
                f"Other answer: {llm_answer}\n")


class _AnswerListPrompt(PromptABC):
    """Concise answering returning JSON {"answer_list": [...]}."""

    def build_prompt(self, input) -> str:
        return (
            "Please solve the following problem, being as concise as "
            "possible and focusing on key information while omitting "
            "redundant details. Return the result in JSON format with "
            "the key 'answer_list': List[str], the list of answers.\n"
            f"The problem is:\n{input}\n"
        )


# ---- AtomicTaskGenerator family -------------------------------------

@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorGetIdentifierPrompt(_IdentifierPrompt):
    pass


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorGetConlcusionPrompt(PromptABC):
    """Split a document into atomic conclusions; JSON array of
    {conclusion, R} output."""

    def build_system_prompt(self) -> str:
        return (
            "Extract atomic factual conclusions from the given "
            "content. Output a JSON array where each element has the "
            "fields `conclusion` and `R`:\n"
            "- each conclusion is ONE indivisible basic fact (never "
            "combine 'A rose 5% and B fell 2%' — split it);\n"
            "- each conclusion must contain at least one definite "
            "identifier and explicitly mark time ranges for "
            "time-sensitive facts;\n"
            "- if a conclusion cites other content ('as stated in "
            "(2)'), embed that content in full;\n"
            "- `R` states the logical relation for extracting the "
            "conclusion from the data (e.g. \"Humpback65B's zero-shot "
            "accuracy\" for the conclusion \"Humpback65B achieved "
            "59.0% zero-shot accuracy in the MMLU evaluation\")."
        )

    def build_prompt(self, input) -> str:
        return f"Now process this content:\n{input}"


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorQuestionPrompt(PromptABC):
    """(identifier, relation, answer) → question; strict JSON
    {"Q"} output."""

    def build_system_prompt(self) -> str:
        return (
            "Generate a question (Q) from a task identifier (ID), a "
            "relationship (R), and a known correct answer (A). The "
            "question must: be one complete natural-language question; "
            "allow deriving A by applying R after locating the "
            "content via ID; be fully based on the original "
            "conclusion, with A its only correct answer; hide "
            "specific sources/data paths (search hints allowed); "
            "include disambiguating detail such as dates so the "
            "answer is unique. Output strict JSON: "
            "{\"Q\": \"generated question\"}."
        )

    def build_prompt(self, identifier, conclusion, relation) -> str:
        return (f"ID: {identifier}\n"
                f"A: {conclusion}\n"
                f"R: {relation}\n")


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorCleanQAPrompt(PromptABC):
    """Distill the exact asked-for information; JSON {question,
    original_answer, refined_answer} output."""

    def build_system_prompt(self) -> str:
        return (
            "Clean a QA pair by extracting ONLY the exact information "
            "the question requests. Rules: never omit essential "
            "information; never add or infer beyond the original "
            "answer; standardize formats (dates YYYY-MM-DD, "
            "percentages like 8%, currency like $1,000, units like "
            "5kg); be extremely concise in refined_answer. Output "
            "JSON: {\"question\": str, \"original_answer\": str, "
            "\"refined_answer\": str}. Example: question 'How many "
            "Raman spectra were organized?', original_answer 'The "
            "Neo4j graph database was used to organize 3,045 Raman "
            "spectra of exosomes.' → refined_answer '3,045'."
        )

    def build_prompt(self, input) -> str:
        return f"Now process this QA pair:\n{input}"


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorAnswerPrompt(PromptABC):
    """Direct concise answering with maximal relevant recall."""

    def build_prompt(self, input) -> str:
        return (
            "Please solve the following problem and return as many "
            "relevant results as possible that meet the query "
            "requirements. Ensure responses are as concise as "
            "possible, focusing only on key information.\n"
            f"The problem is:\n{input}\n"
        )


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorRecallScorePrompt(_RecallScorePrompt):
    pass


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorOptionalAnswerPrompt(PromptABC):
    """All plausible surface forms of an answer; JSON list of strings
    output."""

    def build_system_prompt(self) -> str:
        return (
            "You are an expert in linguistic variation and data "
            "augmentation. Generate every plausible textual "
            "expression that refers to EXACTLY the same entity or "
            "information as the given answer: synonyms, "
            "abbreviations, alternate formats of dates/numbers/units, "
            "nicknames. Never include expressions with different "
            "meaning. Examples: '1977-01-26' → [\"1977-01-26\", "
            "\"January 26, 1977\", \"26 Jan 1977\"]; 'United "
            "Nations' → [\"United Nations\", \"U.N.\", \"UN\"]. "
            "Respond with a JSON list of strings. Do not explain."
        )

    def build_prompt(self, answer) -> str:
        return (f"The original answer is: {answer}\n"
                "List all equivalent textual expressions as a JSON "
                "list of strings.")


@PROMPT_REGISTRY.register()
class AtomicTaskGeneratorGoldenDocAnswerPrompt(PromptABC):
    """Answer strictly from the provided golden document."""

    def build_prompt(self, golden_doc, question) -> str:
        return (
            "You are given the following document that contains "
            "relevant information to help answer a question.\n"
            f"Document:\n{golden_doc}\n"
            f"Question:\n{question}\n"
            "Answer the question using ONLY the information in the "
            "provided document. Return the final answer directly, "
            "with no explanation."
        )


# ---- DepthQAGenerator family ----------------------------------------

@PROMPT_REGISTRY.register()
class DepthQAGeneratorGetIdentifierPrompt(_IdentifierPrompt):
    pass


@PROMPT_REGISTRY.register()
class DepthQAGeneratorBackwardTaskPrompt(PromptABC):
    """Find a superset of the input element and describe the relation
    that uniquely locates the input within it; JSON {identifier,
    relation} output."""

    def build_prompt(self, input) -> str:
        return (
            "Conduct divergent searches from the input element to "
            "find an appropriate SUPERSET related to its attributes, "
            "and state the relationship that uniquely locates the "
            "input within that superset. Rules: the identifier should "
            "uniquely locate the superset (attribute name, page "
            "title, paper title, ...) and must not contain the input "
            "itself; the relation lists the qualifying conditions "
            "linking superset to input (hierarchy/ownership "
            "preferred, e.g. identifier 'Avatar film series', "
            "relation 'The third film'); produce exactly one "
            "relation, avoiding strongly specific proper nouns and "
            "irrelevant content. Return JSON with keys "
            "'identifier': str and 'relation': str.\n"
            f"Input element:\n{input}\n"
        )


@PROMPT_REGISTRY.register()
class DepthQAGeneratorSupersetCheckPrompt(PromptABC):
    """Validate that (superset, relation) uniquely identifies the
    subset; JSON {"new_query": "valid"/"invalid"} output."""

    def build_system_prompt(self) -> str:
        return (
            "Validate whether a given superset can uniquely identify "
            "a subset through the provided relationship: the superset "
            "must be a true generalization of the subset, and the "
            "relationship must explicitly and uniquely link them. "
            "Return JSON with the key `new_query`, valued \"valid\" "
            "if the pair uniquely locates the subset, otherwise "
            "\"invalid\". Example valid output: "
            "{\"new_query\": \"valid\"}."
        )

    def build_prompt(self, new_id, relation, identifier) -> str:
        return (f"Given superset: {new_id}\n"
                f"Given relationship: {relation}\n"
                f"Given subset: {identifier}\n")


@PROMPT_REGISTRY.register()
class DepthQAGeneratorQuestionPrompt(PromptABC):
    """(superset identifier, relation, answer) → deeper question; JSON
    {"new_query"} output."""

    def build_system_prompt(self) -> str:
        return (
            "Generate a question whose answer is the given input "
            "answer, determined by the given identifier's content and "
            "the given relationship. The question must not reveal the "
            "answer's content. Return JSON with the key new_query."
        )

    def build_prompt(self, new_id, relation, identifier) -> str:
        return (f"Identifier: {new_id}\n"
                f"Relationship: {relation}\n"
                f"Certain answer: {identifier}\n")


@PROMPT_REGISTRY.register()
class DepthQAGeneratorAnswerPrompt(_AnswerListPrompt):
    pass


@PROMPT_REGISTRY.register()
class DepthQAGeneratorRecallScorePrompt(_RecallScorePrompt):
    pass


# ---- WidthQAGenerator family ----------------------------------------

@PROMPT_REGISTRY.register()
class WidthQAGeneratorMergePrompt(PromptABC):
    """Merge 2-3 related questions into comprehensive ones; JSON array
    of {question, index, content_identifier} output."""

    def build_prompt(self, input) -> str:
        return (
            "Merge related research questions into high-quality "
            "comprehensive questions. Each input item has: index "
            "(unique ID), question, golden_answer, and "
            "content_identifier. Group 2-3 thematically similar "
            "questions per merge; every original question must land "
            "in exactly one group; the merged question must retain "
            "all elements of its originals and read coherently. "
            "Output a JSON array of objects:\n"
            "{\"question\": \"text of the synthesized question\", "
            "\"index\": [1,2,3], "
            "\"content_identifier\": \"original content identifier\"}\n"
            "Here are the base questions to process:\n"
            f"{input}\n"
        )


@PROMPT_REGISTRY.register()
class WidthQAGeneratorOriginCheckPrompt(PromptABC):
    """Verify merged questions decompose back to their originals; JSON
    array of {index, complex_question, state} output."""

    def build_prompt(self, input) -> str:
        return (
            "Verify whether each complex question can be decomposed "
            "into its original questions: it must clearly contain all "
            "their elements, introduce no distortion or ambiguity, "
            "and preserve the logical relationships. For each item "
            "output state 1 (decomposes cleanly) or 0 (does not). "
            "Output a JSON array of objects:\n"
            "{\"index\": 1, \"complex_question\": \"original complex "
            "question\", \"state\": 1}\n"
            "Here are the base questions to process:\n"
            f"{input}\n"
        )


@PROMPT_REGISTRY.register()
class WidthQAGeneratorQuestionVerifyPrompt(PromptABC):
    """Answer merged questions from model knowledge; JSON array of
    {index, complex_question, llm_answer} output."""

    def build_prompt(self, input) -> str:
        return (
            "Answer the provided complex research questions based on "
            "your knowledge, one answer per question. Output a JSON "
            "array of objects:\n"
            "{\"index\": 1, \"complex_question\": \"original complex "
            "question\", \"llm_answer\": \"your answer\"}\n"
            "Please answer these research questions:\n"
            f"{input}\n"
        )


@PROMPT_REGISTRY.register()
class WidthQAGeneratorAnswerPrompt(_AnswerListPrompt):
    pass


@PROMPT_REGISTRY.register()
class WidthQAGeneratorRecallScorePrompt(_RecallScorePrompt):
    pass


# ---- Atomic multi-hop QA construction -------------------------------

@PROMPT_REGISTRY.register()
class AtomicQAGeneratorPrompt(PromptABC):
    """Document → atomic retrieval-grounded QA pairs; JSON array of
    {question, answer} output."""

    def build_prompt(self, gen_qa_num, input_doc) -> str:
        return (
            "You are an information-extraction and question-"
            f"generation system. From the document below produce "
            f"{gen_qa_num} QA pairs where each question targets a "
            "specific retrievable detail and each answer is a "
            "concise fact grounded verbatim in the document. Rules: "
            "only questions that require consulting the document "
            "(no common-sense trivia); one fact per question (split "
            "'A increased and B decreased'); answers contain a "
            "definite identifier or value and mark time ranges when "
            "time-sensitive; questions must be specific enough to "
            "have a UNIQUE answer; prefer measurable, database-"
            "friendly details.\n"
            "Output a JSON array in a ```json fence, each item:\n"
            "{\"question\": \"...\", \"answer\": \"...\"}\n"
            f"Document:\n{input_doc}\n"
        )


@PROMPT_REGISTRY.register()
class MergeAtomicQAPrompt(PromptABC):
    """Compose a multi-hop question from QA-document triples; JSON
    {question, answer, type} output with type inference|comparison."""

    def build_prompt(self, Data, New_question, New_answer,
                     New_document) -> str:
        return (
            "You are an expert in constructing multi-hop questions "
            "grounded in document-based facts. Given the existing "
            "hop(s) and a new QA-document triple, produce ONE "
            "multi-hop question that requires reasoning over the "
            "latest previous hop AND the new triple. Only produce it "
            "when the combination is logically valid, unambiguous, "
            "and supported by both documents — otherwise decline by "
            "returning an empty question. Output JSON:\n"
            "{\"question\": \"...\", \"answer\": \"...\", "
            "\"type\": \"inference\" | \"comparison\"}\n"
            f"Existing hops:\n{Data}\n"
            f"New question: {New_question}\n"
            f"New answer: {New_answer}\n"
            f"New document:\n{New_document}\n"
        )


class _HopCheckPrompt(PromptABC):
    """Shared multi-hop validity check; JSON {valid, error_type,
    justification} output."""

    QA_TYPE = "inference"
    RULE = ""

    def build_prompt(self, Question1, Answer1, Document1, Question2,
                     Answer2, Document2, Final_question, Final_answer,
                     qa_type=None) -> str:
        t = qa_type or self.QA_TYPE
        return (
            "You are a multi-hop QA verification system. Given two "
            "question-answer-document triples and a final multi-hop "
            "QA, verify whether the final QA is logically valid for "
            f"type \"{t}\". {self.RULE}\n"
            "Failure categories: \"bad_linkage\" (superficially "
            "similar but logically disconnected facts); "
            "\"entity_false_link\" (connection exists only because "
            "distinct entities share similar names); "
            "\"trivial_concatenation\" (final question merely joins "
            "independent facts with 'and'); \"other\".\n"
            "Return a JSON object:\n"
            "{\"valid\": \"true\" | \"false\", \"error_type\": "
            "\"bad_linkage\" | \"entity_false_link\" | "
            "\"trivial_concatenation\" | \"other\", "
            "\"justification\": \"short explanation\"}\n"
            f"Question1: {Question1}\nAnswer1: {Answer1}\n"
            f"Doc1: {Document1}\n"
            f"Question2: {Question2}\nAnswer2: {Answer2}\n"
            f"Doc2: {Document2}\n"
            f"Final_question: {Final_question}\n"
            f"Final_answer: {Final_answer}\n"
        )


@PROMPT_REGISTRY.register()
class InferenceCheckPrompt(_HopCheckPrompt):
    QA_TYPE = "inference"
    RULE = ("An inference question chains QA1 into QA2: the final "
            "answer must exactly match Answer2, and no intermediate "
            "answer may appear in the final question.")


@PROMPT_REGISTRY.register()
class ComparisonCheckPrompt(_HopCheckPrompt):
    QA_TYPE = "comparison"
    RULE = ("A comparison question requires retrieving both facts and "
            "comparing them; the final answer must follow from the "
            "comparison of Answer1 and Answer2.")


@PROMPT_REGISTRY.register()
class RefineAnswerPrompt(PromptABC):
    """Extract the precise answer from a verbose one; JSON {question,
    original_answer, refined_answer} output."""

    def build_prompt(self, question, original_answer) -> str:
        return (
            "Extract the most precise, concise information that "
            "directly answers the question from the original answer. "
            "Rules: only the exact requested information; keep any "
            "original index/order; never omit essential parts; never "
            "add or infer; standard formats (8%, $1,000, YYYY-MM-DD, "
            "5kg); keep multiple core components for comparative or "
            "multi-part answers. Example: 'What edition of the "
            "Wightman Cup was held in 1931?' / 'The 1931 Wightman "
            "Cup was its 9th edition.' → 'The 9th edition.'\n"
            "Output JSON:\n"
            "{\"question\": \"<original question>\", "
            "\"original_answer\": \"<original answer>\", "
            "\"refined_answer\": \"<clean, concise answer>\"}\n"
            f"question: {question}\n"
            f"original_answer: {original_answer}\n"
        )


@PROMPT_REGISTRY.register()
class MoreOptionalAnswersPrompt(PromptABC):
    """Equivalent surface forms of a refined answer; JSON list of
    strings output."""

    def build_prompt(self, refined_answer) -> str:
        return (
            "List every plausible textual expression that refers to "
            "exactly the same entity or information as the answer "
            "below — synonyms, abbreviations, and alternative "
            "formatting of dates/numbers/units. Equivalence is "
            "mandatory; do not include variants with different "
            "meaning. Respond with a JSON list of strings only.\n"
            f"The original answer is: {refined_answer}\n"
        )


# ---- Hop answering / judging ----------------------------------------

@PROMPT_REGISTRY.register()
class ReasoningPrompt(PromptABC):
    """Concise direct problem solving."""

    def build_prompt(self, problem: str) -> str:
        return (
            "Please solve the following problem and return the "
            "result, being as concise as possible and focusing on "
            "key information while omitting redundant details.\n"
            f"The problem is:\n{problem}\n"
        )


@PROMPT_REGISTRY.register()
class ComparisonReasoningPrompt(PromptABC):
    """Concise comparison answering; refuses rather than guesses."""

    def build_prompt(self, problem: str) -> str:
        return (
            "Please solve the following comparison problem and return "
            "the result. If you are unsure of the answer, do NOT "
            "guess or choose randomly — return \"I cannot answer "
            "this question.\" instead.\n"
            f"The problem is:\n{problem}\n"
            "Be as concise as possible, focusing on key information."
        )


@PROMPT_REGISTRY.register()
class SingleHopPrompt(PromptABC):
    """Answer a single-hop question from one document, or refuse with
    a reason."""

    def build_prompt(self, Document: str, Question: str) -> str:
        return (
            "You are given a document containing information relevant "
            "to a question.\n"
            f"Document:\n{Document}\n"
            f"Question:\n{Question}\n"
            "Answer using the information in the document, as "
            "concisely as possible (key information only). If the "
            "document does not answer the question, return \"I "
            "cannot answer this question. <reason>\"."
        )


class _MultihopAnswerPrompt(PromptABC):
    KIND = ""
    EXAMPLE = ""

    def build_prompt(self, Data: str, FinalQuestion: str) -> str:
        return (
            f"You are an expert solver of multi-hop {self.KIND} "
            f"problems — questions requiring {self.EXAMPLE}\n"
            "Use the supporting facts below to answer the final "
            "question. Return only the concise final answer — do not "
            "output the reasoning chain.\n"
            f"{Data}\n"
            f"FinalQuestion: {FinalQuestion}\n"
        )


@PROMPT_REGISTRY.register()
class MultihopInferencePrompt(_MultihopAnswerPrompt):
    KIND = "inference"
    EXAMPLE = ("combining facts in a logical chain (e.g. 'Who is the "
               "father of the performer of X?' resolves the performer "
               "first, then the father).")


@PROMPT_REGISTRY.register()
class MultihopComparisonPrompt(_MultihopAnswerPrompt):
    KIND = "comparison"
    EXAMPLE = ("retrieving facts from multiple sources and comparing "
               "them (e.g. 'Who was born first, A or B?' compares "
               "both birth dates).")


@PROMPT_REGISTRY.register()
class EssEqPrompt(PromptABC):
    """Essential-equivalence judge of OTHER vs GOLDEN answer w.r.t. the
    question; 0/1/2 score output."""

    def build_prompt(self, question, golden_answer, other_answer) -> str:
        return (
            "You are an expert evaluator. Judge whether the OTHER "
            "ANSWER preserves all essential information of the GOLDEN "
            "ANSWER with respect to the QUESTION.\n"
            "Scoring: 2 = fully equivalent (rewording fine, nothing "
            "missing or wrong); 1 = contains ALL key information plus "
            "extra non-contradictory detail; 0 = missing critical "
            "information or contradicts the golden answer. Always "
            "judge essentiality relative to what the question asks "
            "(e.g. Q 'What year did the war end?', golden '1848', "
            "other 'The year was 1848.' → 2).\n"
            "Output the integer score on the final line.\n"
            f"QUESTION: {question}\n"
            f"GOLDEN ANSWER: {golden_answer}\n"
            f"OTHER ANSWER: {other_answer}\n"
        )
