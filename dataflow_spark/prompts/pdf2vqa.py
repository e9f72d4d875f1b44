"""PDF→VQA extraction prompts (reference:
dataflow/prompts/pdf2vqa.py:1-160).

Output contract (both classes): run-together tag stream of
``<chapter><title>…</title><qa_pair><label>…</label><question>…"
"</question><answer>…</answer><solution>…</solution></qa_pair>…`` with
``<pic>tagA:boxB</pic>`` figure references and ``<empty></empty>`` when
nothing qualifies.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_TAG_FORMAT = (
    "Output format (all tags run together, no extra whitespace or "
    "newlines except between entries):\n"
    "<chapter><title>MAIN_TITLE</title>\n"
    "<qa_pair><label>…</label><question>QUESTION_TEXT<pic>…</pic>…"
    "</question>\n"
    "<answer>ANSWER_TEXT<pic>…</pic>…</answer>"
    "<solution>SOLUTION_TEXT</solution></qa_pair>\n"
    "</chapter>\n"
    "If no qualifying content is found, output:\n"
    "<empty></empty>\n"
)


@PROMPT_REGISTRY.register()
class VQAExtractPrompt(PromptABC):
    """Extract complete problems + answers/solutions from a scanned
    book page image into the tagged qa_pair stream."""

    def __init__(self):
        pass

    def build_prompt(self, example_title: str = "", subject: str = "math",
                     interleaved: bool = False) -> str:
        layout = (
            "On this page, questions and their answers/solutions may "
            "appear contiguously; wrap contiguous pairs together in one "
            "<qa_pair> block.\n"
            if interleaved else
            "On this page, either all questions or all answers with "
            "solutions appear, not mixed; wrap each with the missing "
            "parts left as empty tags.\n")
        return (
            f"You are given a page image (page_n) of a {subject} book"
            + (f" (e.g. '{example_title}')" if example_title else "") +
            ". Extract:\n"
            f"1. All {subject} problems whose text begins on page_n, "
            "and the answers/solutions to those problems.\n"
            "2. Omit problems or answers that are incomplete because "
            "they continue onto the next page; if the problem is "
            "complete but its solution is not, omit both.\n"
            "3. An unnumbered box at the top of a page (no label like "
            "'1.1', 'example 1', 'solution') is usually the "
            "continuation of the previous page — treat it as "
            "incomplete.\n"
            "4. Extract the chapter/section titles appearing on the "
            "page — include EVERY title, even with no questions under "
            "it (empty qa_pair block); skip subtitles (titles followed "
            "by a problem whose label is not 1).\n"
            + layout +
            "Rules: keep sub-questions of one main question in the "
            "same <qa_pair> block; a short answer without a full "
            "solution is kept with the solution tag empty; two-column "
            "pages read left to right, top to bottom; transcribe text "
            "exactly (no translation) with math as LaTeX; record every "
            "figure reference as <pic>tagA:boxB</pic> at its exact "
            "position in the text; non-content pages (cover, catalog, "
            "header/footer only) yield <empty></empty>.\n"
            + _TAG_FORMAT +
            "Please now process the provided page_n image and output "
            "your result."
        )


@PROMPT_REGISTRY.register()
class QAExtractPrompt(PromptABC):
    """Segment OCR'd JSON items (each with an "id") into the tagged
    qa_pair stream, outputting item ids instead of text."""

    def build_prompt(self) -> str:
        return (
            "You are given a JSON file of OCR'd content items, each "
            "with an \"id\" field. Segment the content into "
            "<qa_pair>…</qa_pair> blocks, each a question with its "
            "answer/solution.\n"
            "Rules:\n"
            "1. For chapter titles, questions, and solutions output "
            "ONLY their id fields (comma-separated when several items "
            "form one part) — never the original text.\n"
            "2. For labels use the original problem numbers from the "
            "text, and for answers the original short answer extracted "
            "from the solution — these two are literal text, not ids.\n"
            "3. Omit incomplete problems/answers; a part is complete "
            "when either the answer or the solution exists. ALWAYS "
            "keep short answers even without a full solution (solution "
            "tag empty).\n"
            "4. Keep sub-questions ((1), (a), …) of one main question "
            "in the same <qa_pair> block.\n"
            "5. Wrap qa_pairs in <chapter> blocks whose <title> is the "
            "id of the chapter/section title item; titles followed by "
            "a problem whose label is not 1, or titles carrying a "
            "score breakdown, are subtitles — do not extract them.\n"
            "6. Include the ids of ALL images referenced by a "
            "question/answer/solution inside that part's id list.\n"
            + _TAG_FORMAT.replace("MAIN_TITLE", "MAIN_TITLE_ID")
                         .replace("QUESTION_TEXT", "QUESTION_IDS")
                         .replace("SOLUTION_TEXT", "SOLUTION_IDS") +
            "Please now process the provided json and output your "
            "result."
        )
