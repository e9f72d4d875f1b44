"""MinerU-shaped document->markdown converters (reference:
knowledge_cleaning/generate/mineru_operators.py:57,200,325 and
pdf2vqa/generate/mineru_to_llm_input_operator.py:9).

Contract (same as the reference): the input column holds a local file
path or URL per row; the operator converts each to a Markdown file under
``intermediate_dir`` and writes that path into the output column (empty
string on failure).

Spark shape: one mapInPandas over (row-id, source) — conversion is
per-row and embarrassingly parallel, so each executor converts its own
partition and writes to ``intermediate_dir``, which must be a shared
filesystem (NFS/object store via fuse) on a multi-node cluster. Handled
natively: text/markdown passthrough, HTML tag-strip extraction. PDF
bytes -> markdown needs a real parser; none is bundled in this
container, so it's a constructor seam (``pdf_converter`` callable) and a
clear per-row failure ("" path) without one — same plan either way.
URL fetch is likewise a seam (``url_fetcher``) so headless clusters
without egress fail per-row, not per-job.
"""

from __future__ import annotations

import html as _html
import os
import re
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dataflow_spark.core.operator import Operator, with_row_id
from dataflow_spark.core.registry import OPERATOR_REGISTRY

_TEXT_EXT = {".md", ".markdown", ".txt", ".text"}
_HTML_EXT = {".html", ".htm", ".xml", ".xhtml"}
_PDF_EXT = {".pdf"}


def html_to_markdown(raw: str) -> str:
    """Minimal main-content extraction: drop script/style, convert
    headings and paragraph-ish breaks, strip remaining tags, unescape
    entities (the reference delegates to trafilatura)."""
    s = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", raw)
    s = re.sub(r"(?is)<h([1-6])[^>]*>(.*?)</h\1>",
               lambda m: "\n" + "#" * int(m.group(1)) + " " + m.group(2) + "\n", s)
    s = re.sub(r"(?i)<(br|/p|/div|/li|/tr)[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[^>]+>", " ", s)
    s = _html.unescape(s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r"\n\s*\n+", "\n\n", s)
    return s.strip()


class _MarkdownConverterBase(Operator):
    """Shared engine for the Local/API/Flash converter variants — they
    differ only in which backend parses PDFs, which is the
    ``pdf_converter`` seam here."""

    def __init__(self, intermediate_dir: str = "intermediate",
                 mineru_backend: str = "vlm-sglang-engine",
                 input_key: str = "source", output_key: str = "text_path",
                 pdf_converter: Callable[[bytes], str] | None = None,
                 url_fetcher: Callable[[str], str] | None = None):
        self.intermediate_dir = intermediate_dir
        self.mineru_backend = mineru_backend
        self.input_key, self.output_key = input_key, output_key
        self.pdf_converter = pdf_converter
        self.url_fetcher = url_fetcher
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out_dir = self.intermediate_dir
        pdf_conv, url_fetch = self.pdf_converter, self.url_fetcher
        in_key, out_key = self.input_key, self.output_key

        df = with_row_id(df)
        schema = StructType([StructField("_row_id", StringType()),
                             StructField(out_key, StringType())])

        def convert_one(rid: str, src) -> str:
            if src is None or str(src).strip() == "":
                return ""
            src = str(src)
            os.makedirs(out_dir, exist_ok=True)
            try:
                if src.startswith(("http://", "https://")):
                    if url_fetch is None:
                        return ""
                    md = html_to_markdown(url_fetch(src))
                    dest = os.path.join(out_dir, f"url_{rid}.md")
                else:
                    ext = os.path.splitext(src)[1].lower()
                    name = os.path.splitext(os.path.basename(src))[0]
                    dest = os.path.join(out_dir, f"{name}.md")
                    if ext in _TEXT_EXT:
                        with open(src, encoding="utf-8", errors="replace") as f:
                            md = f.read()
                    elif ext in _HTML_EXT:
                        with open(src, encoding="utf-8", errors="replace") as f:
                            md = html_to_markdown(f.read())
                    elif ext in _PDF_EXT:
                        if pdf_conv is None:
                            return ""  # no PDF backend bundled — seam
                        with open(src, "rb") as f:
                            md = pdf_conv(f.read())
                    else:
                        return ""
                with open(dest, "w", encoding="utf-8") as f:
                    f.write(md)
                return dest
            except OSError:
                return ""

        def gen(batches):
            for b in batches:
                yield pd.DataFrame({
                    "_row_id": b["_row_id"].astype(str),
                    out_key: [convert_one(r, s)
                              for r, s in zip(b["_row_id"].astype(str),
                                              b[in_key])],
                })

        converted = (df.select(F.col("_row_id").cast("string"), in_key)
                     .mapInPandas(gen, schema=schema))
        return (df.withColumn("_row_id", F.col("_row_id").cast("string"))
                .join(converted, "_row_id", "left").drop("_row_id"))


@OPERATOR_REGISTRY.register()
class FileOrURLToMarkdownConverterLocal(_MarkdownConverterBase):
    """Local-engine variant (mineru_operators.py:325) — PDFs parsed by a
    locally-installed backend supplied as ``pdf_converter``."""


@OPERATOR_REGISTRY.register()
class FileOrURLToMarkdownConverterAPI(_MarkdownConverterBase):
    """Remote-API variant (mineru_operators.py:200) — ``api_key`` kept
    for signature parity; the API client is the ``pdf_converter`` seam."""

    def __init__(self, intermediate_dir: str = "intermediate",
                 mineru_backend: str = "vlm", api_key: str | None = None,
                 **kw: Any):
        super().__init__(intermediate_dir, mineru_backend, **kw)
        self.api_key = api_key


@OPERATOR_REGISTRY.register()
class FileOrURLToMarkdownConverterFlash(_MarkdownConverterBase):
    """Flash-LLM variant (mineru_operators.py:57) — same contract,
    different PDF backend."""


@OPERATOR_REGISTRY.register()
class MinerU2LLMInputOperator(Operator):
    """Convert MinerU markdown output into LLM-ready input files
    (pdf2vqa/generate/mineru_to_llm_input_operator.py:55-70): read each
    row's markdown path, strip image references and layout noise, write
    ``<name>_llm.md`` next to it, store that path."""

    def __init__(self, input_markdown_path_key: str = "text_path",
                 output_converted_layout_key: str = "llm_input_path"):
        self.input_markdown_path_key = input_markdown_path_key
        self.output_converted_layout_key = output_converted_layout_key
        self.input_keys = (input_markdown_path_key,)
        self.output_keys = (output_converted_layout_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        in_key, out_key = (self.input_markdown_path_key,
                           self.output_converted_layout_key)

        df = with_row_id(df)
        schema = StructType([StructField("_row_id", StringType()),
                             StructField(out_key, StringType())])

        def convert_one(path) -> str:
            if path is None or str(path).strip() == "":
                return ""
            path = str(path)
            try:
                with open(path, encoding="utf-8", errors="replace") as f:
                    md = f.read()
                md = re.sub(r"!\[[^\]]*\]\([^)]*\)", "", md)   # image refs
                md = re.sub(r"<[^>\n]+>", "", md)              # layout tags
                md = re.sub(r"\n\s*\n+", "\n\n", md).strip()
                base, _ = os.path.splitext(path)
                dest = base + "_llm.md"
                with open(dest, "w", encoding="utf-8") as f:
                    f.write(md)
                return dest
            except OSError:
                return ""

        def gen(batches):
            for b in batches:
                yield pd.DataFrame({
                    "_row_id": b["_row_id"].astype(str),
                    out_key: [convert_one(p) for p in b[in_key]],
                })

        converted = (df.select(F.col("_row_id").cast("string"), in_key)
                     .mapInPandas(gen, schema=schema))
        return (df.withColumn("_row_id", F.col("_row_id").cast("string"))
                .join(converted, "_row_id", "left").drop("_row_id"))
