"""Knowledge-base cleaning prompts (reference:
dataflow/prompts/kbcleaning.py:1-396).

Output contracts: cleaner wraps the result in ``<cleaned_start>`` /
``<cleaned_end>``; the mathbook extractor joins problems with the
literal ``<SPACE>`` token and returns ``<SPACE><SPACE>`` when nothing
qualifies, with figures referenced as ``<image>...</image>``.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class KnowledgeCleanerPrompt(PromptABC):
    """Raw HTML/scrape → clean knowledge text, preserving semantic tags
    (<table>, <code>, <formula>); ``lang`` in {'en','zh'};
    ``strict_mode`` forbids any paraphrasing."""

    def __init__(self, lang: str = "en", strict_mode: bool = True):
        if lang not in ("en", "zh"):
            raise ValueError("lang must be 'en' or 'zh'")
        self.lang = lang
        self.strict_mode = strict_mode

    def build_prompt(self, raw_content: str) -> str:
        strict = (
            "Strict mode: copy retained text verbatim — no paraphrase, "
            "no summarization, no reordering.\n"
            if self.strict_mode else
            "Light normalization of whitespace and punctuation is "
            "allowed; meaning must not change.\n")
        if self.lang == "zh":
            return (
                "你是知识库清洗助手。请清洗下面的原始内容：去除导航、广"
                "告、页眉页脚、联系方式、签名和图片装饰；保留正文、表格"
                "（<table>）、代码（<code>）和公式（<formula>）等语义标"
                "签；将花引号、破折号等印刷符号规范为标准字符；涉密或个"
                "人敏感信息用占位符代替。\n" + strict +
                "输出格式：将清洗结果包裹在标记之间，除此之外不输出任何"
                "内容：\n<cleaned_start>\n...清洗后的内容...\n"
                "<cleaned_end>\n\n原始内容：\n" + raw_content)
        return (
            "You are a knowledge-base cleaning assistant. Clean the raw "
            "content below: drop navigation, ads, headers/footers, "
            "contact details, signatures, and decorative images; KEEP "
            "body text and semantic tags such as <table>, <code>, and "
            "<formula>; normalize typographic characters (curly quotes, "
            "dashes, ellipses) to standard ASCII equivalents; replace "
            "confidential or personal data with placeholders.\n"
            + strict +
            "Output format — wrap the cleaned result between these "
            "markers and output nothing else:\n"
            "<cleaned_start>\n"
            "...cleaned content...\n"
            "<cleaned_end>\n\n"
            "Raw content:\n" + raw_content)


@PROMPT_REGISTRY.register()
class MathbookQuestionExtractPrompt(PromptABC):
    """Extract complete math problems from a textbook page image,
    inserting <image>filename</image> for referenced figures and
    joining problems with the literal <SPACE> token."""

    def build_prompt(self) -> str:
        return (
            "You are given a textbook page image (page_n.jpg) plus "
            "cropped figure files (index.jpg). Your task:\n"
            "1. Extract every COMPLETE math problem whose text appears "
            "on the page; skip problems that continue onto the next "
            "page.\n"
            "2. Transcribe problem text exactly, rendering math as "
            "LaTeX.\n"
            "3. Do not include solutions or answers.\n"
            "4. For each problem that references a figure, insert the "
            "exact figure filename at the reference point as "
            "<image>index.jpg</image>.\n"
            "5. Return all extracted problems concatenated into one "
            "string, separated by the literal token <SPACE>, e.g.:\n"
            "PROBLEM_TEXT_1<SPACE>PROBLEM_TEXT_2<SPACE>PROBLEM_TEXT_3\n"
            "6. If no qualifying problems are found on the page, return "
            "exactly: <SPACE><SPACE>\n"
        )
