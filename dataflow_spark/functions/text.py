"""Text statistics as pure Column expressions (JVM-side, codegen-friendly).

Every helper here compiles to built-in Spark SQL expressions — no Python
UDFs — so filters built on them stay inside whole-stage codegen and can
be partially pushed into the scan. Each function documents the exact
semantics so the DuckDB oracle SQL in __spark_entry__.py can mirror it
token for token.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word = maximal run of non-whitespace. Split on \s+ and drop empties so
# leading/trailing whitespace doesn't create phantom words.
WS_RE = r"\s+"
SENT_RE = r"[.!?]+"


def words(col: Column) -> Column:
    """array<string> of whitespace-delimited tokens, empties removed."""
    return F.filter(F.split(col, WS_RE), lambda x: x != F.lit(""))


def word_count(col: Column) -> Column:
    return F.size(words(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def sentence_count(col: Column) -> Column:
    """Number of [.!?]+-terminated segments with non-space content."""
    return F.size(F.filter(F.split(col, SENT_RE), lambda x: F.trim(x) != F.lit("")))


def line_array(col: Column) -> Column:
    return F.split(col, r"\n")


def mean_word_length(col: Column) -> Column:
    """Average token length; null when there are no words."""
    w = words(col)
    return F.when(
        F.size(w) > 0,
        F.aggregate(w, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
        / F.size(w),
    )


def unique_word_ratio(col: Column) -> Column:
    """|distinct lowercase tokens| / |tokens|; null when empty."""
    w = F.transform(words(col), lambda x: F.lower(x))
    return F.when(F.size(w) > 0, F.size(F.array_distinct(w)).cast("double") / F.size(w))


def capital_word_ratio(col: Column) -> Column:
    """Fraction of tokens that are fully upper-case (and contain a letter)."""
    w = words(col)
    caps = F.filter(w, lambda x: (x == F.upper(x)) & x.rlike("[A-Za-z]"))
    return F.when(F.size(w) > 0, F.size(caps).cast("double") / F.size(w))


def symbol_word_ratio(col: Column, symbols: str = "#...") -> Column:
    """#occurrences of symbol chars / #words (reference: SymbolWordRatioFilter)."""
    w = word_count(col)
    n_sym = F.length(col) - F.length(F.translate(col, "#|…", ""))
    return F.when(w > 0, n_sym.cast("double") / w)


def curly_bracket_ratio(col: Column) -> Column:
    """('{' + '}') count / total chars; 0 for empty strings."""
    n = F.length(col) - F.length(F.translate(col, "{}", ""))
    return F.when(F.length(col) > 0, n.cast("double") / F.length(col)).otherwise(F.lit(0.0))


def alpha_word_ratio(col: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    w = words(col)
    alpha = F.filter(w, lambda x: x.rlike("[A-Za-z]"))
    return F.when(F.size(w) > 0, F.size(alpha).cast("double") / F.size(w))


def stopword_ratio(col: Column, stopwords: list[str]) -> Column:
    """Fraction of lowercase tokens found in ``stopwords``."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    w = F.transform(words(col), lambda x: F.lower(x))
    hits = F.filter(w, lambda x: F.array_contains(sw, x))
    return F.when(F.size(w) > 0, F.size(hits).cast("double") / F.size(w))


def line_ratio(col: Column, predicate) -> Column:
    """Fraction of \\n-lines satisfying ``predicate`` (Column -> Column)."""
    lines = line_array(col)
    return F.when(
        F.size(lines) > 0,
        F.size(F.filter(lines, predicate)).cast("double") / F.size(lines),
    )


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: count of word-piece matches.

    Pattern: runs of letters, runs of digits, or single non-space
    non-alnum symbols -- a deterministic stand-in for a real tokenizer
    that both Spark and the DuckDB oracle can evaluate.
    """
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_score(col: Column, stopwords: list[str]) -> Column:
    """Composite document-quality heuristic in [0,1].

    0.25*len_score + 0.25*stopword_score + 0.25*punct_score + 0.25*alpha
      - len_score: min(word_count/100, 1)
      - stopword_score: min(stopword_ratio/0.3, 1)
      - punct_score: 1 if text ends with . ! or ?, else 0
      - alpha: alpha_word_ratio
    Deterministic, SQL-mirrorable; the shape follows published text
    quality heuristics (Gopher/C4-style rules).
    """
    len_score = F.least(word_count(col).cast("double") / 100.0, F.lit(1.0))
    sw_score = F.least(F.coalesce(stopword_ratio(col, stopwords), F.lit(0.0)) / 0.3, F.lit(1.0))
    punct = F.when(F.trim(col).rlike(r"[.!?]$"), 1.0).otherwise(0.0)
    alpha = F.coalesce(alpha_word_ratio(col), F.lit(0.0))
    return 0.25 * len_score + 0.25 * sw_score + 0.25 * punct + 0.25 * alpha
