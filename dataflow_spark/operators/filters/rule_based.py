"""Rule-based row filters — one Column expression each, no UDFs.

Reference inventory: the 21 classes of
general_text/filter/rule_based_filter.py plus word_number/blocklist
(SURVEY.md §2.3). Each filter computes a boolean label and keeps truthy
rows; expressed as built-in Spark SQL so Catalyst can push predicates
into the Parquet scan and keep the whole chain in one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import FilterOperator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.functions import text as T

# Small embedded english stopword list (public-domain standard set);
# kept tiny + deterministic so oracle SQL can inline the same list.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "if", "then", "of", "to", "in",
    "on", "at", "by", "for", "with", "is", "are", "was", "were", "be",
    "been", "it", "its", "this", "that", "as", "from", "not", "no",
]


@OPERATOR_REGISTRY.register()
class ColonEndFilter(FilterOperator):
    """Drop rows whose trimmed text ends with ':' (ref rule_based_filter.py:47-63)."""

    def compute_label(self, df: DataFrame) -> Column:
        c = F.col(self.input_key)
        return ~F.trim(c).endswith(":")


@OPERATOR_REGISTRY.register()
class ContentNullFilter(FilterOperator):
    """Drop null / whitespace-only rows."""

    def compute_label(self, df: DataFrame) -> Column:
        c = F.col(self.input_key)
        return c.isNotNull() & (F.trim(c) != "")


@OPERATOR_REGISTRY.register()
class WordNumberFilter(FilterOperator):
    """Keep rows whose whitespace word count is within [min_words, max_words]."""

    def __init__(self, input_key: str = "text", min_words: int = 20,
                 max_words: int = 100000, **kw):
        super().__init__(input_key, **kw)
        self.min_words, self.max_words = min_words, max_words

    def compute_label(self, df: DataFrame) -> Column:
        n = T.word_count(F.col(self.input_key))
        return (n >= self.min_words) & (n <= self.max_words)


@OPERATOR_REGISTRY.register()
class CharNumberFilter(FilterOperator):
    """Keep rows with at least ``min_chars`` characters."""

    def __init__(self, input_key: str = "text", min_chars: int = 100, **kw):
        super().__init__(input_key, **kw)
        self.min_chars = min_chars

    def compute_label(self, df: DataFrame) -> Column:
        return F.length(F.col(self.input_key)) >= self.min_chars


@OPERATOR_REGISTRY.register()
class SentenceNumberFilter(FilterOperator):
    """Keep rows whose sentence count ([.!?]+ segments) is in range."""

    def __init__(self, input_key: str = "text", min_sentences: int = 3,
                 max_sentences: int = 7500, **kw):
        super().__init__(input_key, **kw)
        self.min_sentences, self.max_sentences = min_sentences, max_sentences

    def compute_label(self, df: DataFrame) -> Column:
        n = T.sentence_count(F.col(self.input_key))
        return (n >= self.min_sentences) & (n <= self.max_sentences)


@OPERATOR_REGISTRY.register()
class MeanWordLengthFilter(FilterOperator):
    """Keep rows whose mean token length is in [min_len, max_len]."""

    def __init__(self, input_key: str = "text", min_len: float = 3.0,
                 max_len: float = 10.0, **kw):
        super().__init__(input_key, **kw)
        self.min_len, self.max_len = min_len, max_len

    def compute_label(self, df: DataFrame) -> Column:
        m = T.mean_word_length(F.col(self.input_key))
        return m.isNotNull() & (m >= self.min_len) & (m <= self.max_len)


@OPERATOR_REGISTRY.register()
class HtmlEntityFilter(FilterOperator):
    """Drop rows containing HTML entities like &amp; &lt; &#39;."""

    ENTITY_RE = r"&(amp|lt|gt|quot|apos|nbsp|#[0-9]{1,6});"

    def compute_label(self, df: DataFrame) -> Column:
        return ~F.col(self.input_key).rlike(self.ENTITY_RE)


@OPERATOR_REGISTRY.register()
class WatermarkFilter(FilterOperator):
    """Drop rows containing any configured watermark word."""

    def __init__(self, input_key: str = "text",
                 watermarks: list[str] | None = None, **kw):
        super().__init__(input_key, **kw)
        self.watermarks = watermarks or ["Copyright", "Watermark", "Confidential"]

    def compute_label(self, df: DataFrame) -> Column:
        pat = "(" + "|".join(self.watermarks) + ")"
        return ~F.col(self.input_key).rlike(pat)


@OPERATOR_REGISTRY.register()
class LoremIpsumFilter(FilterOperator):
    """Drop rows where 'lorem ipsum' occurs (case-insensitive)."""

    def compute_label(self, df: DataFrame) -> Column:
        return ~F.lower(F.col(self.input_key)).contains("lorem ipsum")


@OPERATOR_REGISTRY.register()
class SpecialCharacterFilter(FilterOperator):
    """Drop rows containing replacement/control characters."""

    SPECIAL_RE = "[\ufffd\u0000-\u0008\u000b\u000c\u000e-\u001f]"

    def compute_label(self, df: DataFrame) -> Column:
        return ~F.col(self.input_key).rlike(self.SPECIAL_RE)


@OPERATOR_REGISTRY.register()
class UniqueWordsFilter(FilterOperator):
    """Keep rows whose distinct-word ratio >= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.1, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.unique_word_ratio(F.col(self.input_key))
        return r.isNotNull() & (r >= self.threshold)


@OPERATOR_REGISTRY.register()
class CapitalWordsFilter(FilterOperator):
    """Keep rows whose ALL-CAPS word ratio <= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.2, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.capital_word_ratio(F.col(self.input_key))
        return r.isNull() | (r <= self.threshold)


@OPERATOR_REGISTRY.register()
class CurlyBracketFilter(FilterOperator):
    """Keep rows where curly-bracket density <= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.025, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        return T.curly_bracket_ratio(F.col(self.input_key)) <= self.threshold


@OPERATOR_REGISTRY.register()
class StopWordFilter(FilterOperator):
    """Keep rows whose stopword ratio >= threshold (real text has stopwords)."""

    def __init__(self, input_key: str = "text", threshold: float = 0.06,
                 stopwords: list[str] | None = None, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold
        self.stopwords = stopwords or EN_STOPWORDS

    def compute_label(self, df: DataFrame) -> Column:
        r = T.stopword_ratio(F.col(self.input_key), self.stopwords)
        return r.isNotNull() & (r >= self.threshold)


@OPERATOR_REGISTRY.register()
class AlphaWordsFilter(FilterOperator):
    """Keep rows where fraction of words containing a letter >= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.6, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.alpha_word_ratio(F.col(self.input_key))
        return r.isNotNull() & (r >= self.threshold)


@OPERATOR_REGISTRY.register()
class SymbolWordRatioFilter(FilterOperator):
    """Keep rows where (symbol chars '#', '|', '…') / words <= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.4, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.symbol_word_ratio(F.col(self.input_key))
        return r.isNull() | (r <= self.threshold)


@OPERATOR_REGISTRY.register()
class LineEndWithEllipsisFilter(FilterOperator):
    """Keep rows where ratio of lines ending in '...'/'…' <= threshold."""

    def __init__(self, input_key: str = "text", threshold: float = 0.3, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.line_ratio(
            F.col(self.input_key),
            lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
        )
        return r.isNull() | (r <= self.threshold)


@OPERATOR_REGISTRY.register()
class LineStartWithBulletpointFilter(FilterOperator):
    """Keep rows where bullet-started line ratio <= threshold."""

    BULLET_RE = r"^\s*([-*•‣⁃]|[0-9]+[.)])"

    def __init__(self, input_key: str = "text", threshold: float = 0.9, **kw):
        super().__init__(input_key, **kw)
        self.threshold = threshold

    def compute_label(self, df: DataFrame) -> Column:
        r = T.line_ratio(F.col(self.input_key), lambda ln: ln.rlike(self.BULLET_RE))
        return r.isNull() | (r <= self.threshold)


@OPERATOR_REGISTRY.register()
class LineWithJavascriptFilter(FilterOperator):
    """Keep rows with at most ``max_lines`` lines mentioning 'javascript'."""

    def __init__(self, input_key: str = "text", max_lines: int = 3, **kw):
        super().__init__(input_key, **kw)
        self.max_lines = max_lines

    def compute_label(self, df: DataFrame) -> Column:
        lines = T.line_array(F.col(self.input_key))
        n = F.size(F.filter(lines, lambda ln: F.lower(ln).contains("javascript")))
        return n <= self.max_lines


@OPERATOR_REGISTRY.register()
class NoPuncFilter(FilterOperator):
    """Keep rows whose longest sentence-punctuation-free word run <= threshold.

    Split on [.!?;:,] and bound the max word count of any segment.
    """

    def __init__(self, input_key: str = "text", max_run: int = 112, **kw):
        super().__init__(input_key, **kw)
        self.max_run = max_run

    def compute_label(self, df: DataFrame) -> Column:
        segs = F.split(F.col(self.input_key), r"[.!?;:,]")
        longest = F.array_max(F.transform(segs, lambda s: T.word_count(s)))
        return longest.isNull() | (longest <= self.max_run)


@OPERATOR_REGISTRY.register()
class IDCardFilter(FilterOperator):
    """Drop rows with ID-card/SSN-like PII patterns."""

    PII_RE = r"([0-9]{3}-[0-9]{2}-[0-9]{4}|[0-9]{17}[0-9Xx])"

    def compute_label(self, df: DataFrame) -> Column:
        return ~F.col(self.input_key).rlike(self.PII_RE)


@OPERATOR_REGISTRY.register()
class BlocklistFilter(FilterOperator):
    """Keep rows with at most ``max_hits`` lowercase tokens in the blocklist."""

    def __init__(self, input_key: str = "text",
                 blocklist: list[str] | None = None, max_hits: int = 0, **kw):
        super().__init__(input_key, **kw)
        self.blocklist = blocklist or ["spam", "viagra", "casino"]
        self.max_hits = max_hits

    def compute_label(self, df: DataFrame) -> Column:
        bl = F.array(*[F.lit(s) for s in self.blocklist])
        w = F.transform(T.words(F.col(self.input_key)), lambda x: F.lower(x))
        hits = F.size(F.filter(w, lambda x: F.array_contains(bl, x)))
        return hits <= self.max_hits


@OPERATOR_REGISTRY.register()
class ScoreRangeFilter(FilterOperator):
    """Generic evaluator+range composition: keep min <= score_key <= max.

    The reference pairs every scorer with a threshold filter (e.g.
    PerplexityFilter, text_pt/filter/perplexity_filter.py:44-60); here it
    is one generic operator parameterized by the score column.
    """

    def __init__(self, input_key: str = "score", min_score: float = 0.0,
                 max_score: float = 1.0, **kw):
        super().__init__(input_key, **kw)
        self.min_score, self.max_score = min_score, max_score

    def compute_label(self, df: DataFrame) -> Column:
        c = F.col(self.input_key)
        return c.isNotNull() & (c >= self.min_score) & (c <= self.max_score)
