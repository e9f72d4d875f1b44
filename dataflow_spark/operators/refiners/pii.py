"""PII / NER / linguistic refiners (reference: general_text/refine/
pii_anonymize_refiner.py, ner_refiner.py, stemming_lemmatization_refiner.py,
spelling_correction_refiner.py, remove_emoticons_refiner.py).

The reference backs these with presidio/spaCy/NLTK/symspell. Those
libraries aren't engine dependencies: PII masking and emoticon removal
are pure regexp_replace chains (JVM-side, oracle-able); stemming is a
deterministic suffix-rule pandas UDF (Porter-style S1 rules); spelling
correction is an edit-distance-1 corrector against a user-supplied
vocabulary (broadcast); NER masking falls back to a capitalized-span
regex when spaCy is absent (import-gated).
"""

from __future__ import annotations

import re
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from dataflow_spark.core.operator import Operator, RefineOperator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class PIIAnonymizeRefiner(RefineOperator):
    """Mask emails, phone numbers, SSNs, IPs, and credit-card-like
    numbers with typed placeholders.

    Reference uses presidio (pii_anonymize_refiner.py:90); ours is a
    regexp_replace chain — stays in codegen, no Python in the hot path.
    Order matters: cards before phones (overlapping digit runs).
    """

    RULES = [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
        (r"\b(?:\d[ -]?){13,16}\b", "[CARD]"),
        (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
        (r"\b(?:\+?\d{1,3}[ -]?)?(?:\(\d{3}\)[ -]?|\d{3}[ -])\d{3}[ -]\d{4}\b", "[PHONE]"),
        (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ]

    def refine_expr(self, col: Column) -> Column:
        out = col
        for pat, repl in self.RULES:
            out = F.regexp_replace(out, pat, repl)
        return out


_EMOTICONS = [
    ":-)", ":)", ":-(", ":(", ";-)", ";)", ":-D", ":D", ":-P", ":P", ":-p",
    ":p", ":-O", ":O", ":-o", ":o", ":-|", ":|", ":-/", ":/", ":-\\", ":'(",
    ":'-(", "=)", "=(", "=D", "=P", "^_^", "^-^", "-_-", "o_O", "O_o", "T_T",
    "x_x", "X_X", ">:(", ">:-(", "<3", "</3", ":3", "xD", "XD", ":*", ":-*",
]


@OPERATOR_REGISTRY.register()
class RemoveEmoticonsRefiner(RefineOperator):
    """Strip ASCII emoticons (reference: remove_emoticons_refiner.py —
    a 5k-line inline list; ours covers the common inventory via one
    alternation regex, longest-first so ':-)' wins over ':-')."""

    def refine_expr(self, col: Column) -> Column:
        pats = sorted(_EMOTICONS, key=len, reverse=True)
        alt = "|".join(re.escape(p) for p in pats)
        return F.regexp_replace(col, f"(?:{alt})", "")


# Porter step-1-style suffix rules: deterministic, order matters.
_STEM_RULES = [
    ("sses", "ss"), ("ies", "i"), ("ational", "ate"), ("tional", "tion"),
    ("ization", "ize"), ("fulness", "ful"), ("ousness", "ous"),
    ("iveness", "ive"), ("ments", "ment"), ("ment", "ment"),
    ("ingly", ""), ("edly", ""), ("ing", ""), ("ed", ""), ("ly", ""),
    ("ss", "ss"), ("s", ""),
]


def _stem_word(w: str) -> str:
    lw = w.lower()
    for suf, repl in _STEM_RULES:
        if lw.endswith(suf) and len(lw) - len(suf) + len(repl) >= 3:
            return lw[: len(lw) - len(suf)] + repl
    return lw


@OPERATOR_REGISTRY.register()
class StemmingLemmatizationRefiner(RefineOperator):
    """Suffix-rule stemmer over whitespace tokens.

    Reference uses NLTK Porter/WordNet (stemming_lemmatization_refiner.py:78).
    Engine semantics: deterministic Porter-style step-1 rules (no corpus
    download), applied via an Arrow-batched pandas UDF.
    """

    def refine_expr(self, col: Column) -> Column:
        @F.pandas_udf(StringType())
        def stem(s: pd.Series) -> pd.Series:
            word_re = re.compile(r"[A-Za-z]+")
            return s.map(
                lambda t: word_re.sub(lambda m: _stem_word(m.group(0)), t)
                if isinstance(t, str) else t
            )

        return stem(col)


@OPERATOR_REGISTRY.register()
class SpellingCorrectionRefiner(RefineOperator):
    """Edit-distance-1 correction against a supplied vocabulary.

    Reference uses symspell (spelling_correction_refiner.py:107). Engine
    semantics: a word not in the vocabulary is replaced by the
    lexicographically-smallest vocab word within edit distance 1 (delete/
    transpose/replace/insert), else kept. Vocabulary is broadcast via the
    UDF closure; correction is deterministic.
    """

    def __init__(self, vocabulary: list[str], input_key: str = "text"):
        super().__init__(input_key=input_key)
        self.vocabulary = sorted(set(w.lower() for w in vocabulary))

    def refine_expr(self, col: Column) -> Column:
        vocab = set(self.vocabulary)

        def edits1(w: str):
            letters = "abcdefghijklmnopqrstuvwxyz"
            splits = [(w[:i], w[i:]) for i in range(len(w) + 1)]
            deletes = [a + b[1:] for a, b in splits if b]
            transposes = [a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1]
            replaces = [a + c + b[1:] for a, b in splits if b for c in letters]
            inserts = [a + c + b for a, b in splits for c in letters]
            return set(deletes + transposes + replaces + inserts)

        def correct(w: str) -> str:
            lw = w.lower()
            if lw in vocab or not lw.isalpha():
                return w
            cands = sorted(edits1(lw) & vocab)
            return cands[0] if cands else w

        @F.pandas_udf(StringType())
        def fix(s: pd.Series) -> pd.Series:
            word_re = re.compile(r"[A-Za-z]+")
            return s.map(
                lambda t: word_re.sub(lambda m: correct(m.group(0)), t)
                if isinstance(t, str) else t
            )

        return fix(col)


@OPERATOR_REGISTRY.register()
class NERRefiner(RefineOperator):
    """Mask named entities with ``[ENT]``.

    Reference uses spaCy (ner_refiner.py:104). When spaCy is installed it
    is used per-executor (lazy singleton); otherwise a deterministic
    fallback masks multi-word TitleCase spans not at sentence start —
    the plumbing (pandas UDF, batching) is identical either way.
    """

    FALLBACK_RE = re.compile(
        r"(?<![.!?]\s)(?<!^)\b(?:[A-Z][a-z]+)(?:\s+[A-Z][a-z]+)+\b")

    def __init__(self, input_key: str = "text", placeholder: str = "[ENT]"):
        super().__init__(input_key=input_key)
        self.placeholder = placeholder

    def refine_expr(self, col: Column) -> Column:
        placeholder = self.placeholder
        fallback = self.FALLBACK_RE

        @F.pandas_udf(StringType())
        def mask(s: pd.Series) -> pd.Series:
            try:  # pragma: no cover - spaCy not in the test container
                import spacy

                nlp = spacy.load("en_core_web_sm", disable=["parser"])

                def one(t: str) -> str:
                    doc = nlp(t)
                    out, last = [], 0
                    for ent in doc.ents:
                        out.append(t[last:ent.start_char]); out.append(placeholder)
                        last = ent.end_char
                    out.append(t[last:])
                    return "".join(out)
            except Exception:
                def one(t: str) -> str:
                    return fallback.sub(placeholder, t)

            return s.map(lambda t: one(t) if isinstance(t, str) else t)

        return mask(col)
