"""Operator ABC — the engine's unit of computation.

Mirrors the reference contract (``OperatorABC.run(storage, input_key=...,
output_key=...)``, /root/reference/dataflow/core/operator.py:5-15) but is
Spark-native: ``run`` takes and returns a *lazy* ``DataFrame``; no
materialization happens inside an operator, so Catalyst sees the whole
pipeline as one plan and can fuse/pushdown/prune across operator
boundaries (the reference re-reads and re-writes a file per step).

Archetypes (SURVEY.md §2.1):
  - Generator: adds column(s) / produces rows   -> ``Operator``
  - Evaluator: adds score column(s)             -> ``Operator``
  - Filter:    label column + keep predicate    -> ``FilterOperator``
  - Refiner:   rewrite a column in place        -> ``RefineOperator``
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import Column, DataFrame

ROW_ID = "_row_id"


class BudgetExceededError(ValueError):
    """An operator's compute/candidate budget guard refused the run.

    Raised by the exact-similarity family (FuzzyJoinOperator,
    NgramJaccardDeduplicateFilter) when a corpus shape makes the exact
    algorithm ~quadratic past the configured budget — an actionable
    refusal in seconds instead of an hours-long job or executor OOM.
    Subclasses ValueError so existing ``except ValueError`` handling
    (and tests) keep working; operators with ``on_budget_exceeded=
    "minhash"`` catch it and route to the approximate fallback.
    """


def with_row_id(df: DataFrame, order_by: str | None = None) -> DataFrame:
    """Attach a stable ``_row_id`` used for order-dependent semantics.

    The reference's dedup family keeps the *first* occurrence in file
    order (hash_deduplicate_filter.py:80-89). Under distribution "first"
    must be defined by data, not partition order: pass ``order_by`` (a
    stable source column, e.g. a primary key) when one exists; otherwise
    fall back to ``monotonically_increasing_id`` which is stable for a
    fixed file layout.
    """
    from pyspark.sql import functions as F

    if ROW_ID in df.columns:
        return df
    if order_by is not None:
        return df.withColumn(ROW_ID, F.col(order_by).cast("long"))
    return df.withColumn(ROW_ID, F.monotonically_increasing_id())


class Operator(ABC):
    """Base class for all engine operators.

    Subclasses declare ``input_keys``/``output_keys`` (may be extended at
    ``__init__`` time) so ``Pipeline.compile()`` can validate key flow
    against the source schema before any job runs — reproducing the
    reference's compile-time KeyError diagnostics
    (/root/reference/dataflow/pipeline/Pipeline.py:100-135) without
    executing Spark jobs.
    """

    #: column names read / written; used by Pipeline.compile()
    input_keys: tuple[str, ...] = ()
    output_keys: tuple[str, ...] = ()

    @abstractmethod
    def run(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        """Transform ``df`` lazily. Must not trigger an action."""

    @classmethod
    def get_desc(cls, lang: str = "en") -> str:
        """Human/agent-readable operator description (reference parity:
        every operator exposes get_desc for the WebUI/agent registry)."""
        return (cls.__doc__ or cls.__name__).strip().split("\n")[0]

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}(in={self.input_keys}, out={self.output_keys})"


class FilterOperator(Operator):
    """Filter archetype: compute a 0/1 label column, keep label==1.

    Matches the reference's universal filter contract (compute label,
    append column, drop rows; e.g. rule_based_filter.py:47-63). Subclasses
    implement ``compute_label`` as a pure Column expression whenever
    possible so the predicate stays inside whole-stage codegen and can be
    pushed into the scan by Catalyst.
    """

    def __init__(self, input_key: str = "text", label_key: str | None = None,
                 keep_label: bool = False):
        self.input_key = input_key
        self.label_key = label_key or f"{type(self).__name__.lower()}_label"
        self.keep_label = keep_label
        self.input_keys = (input_key,)
        self.output_keys = (self.label_key,) if keep_label else ()

    @abstractmethod
    def compute_label(self, df: DataFrame) -> Column:
        """Return a boolean/int Column: truthy rows are kept."""

    def run(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        from pyspark.sql import functions as F

        label = self.compute_label(df).cast("int")
        if self.keep_label:
            # keep the label column for downstream inspection (reference
            # writes it to the step file)
            return df.withColumn(self.label_key, label).filter(F.col(self.label_key) == 1)
        return df.filter(label == 1)


class RefineOperator(Operator):
    """Refiner archetype: rewrite ``input_key`` in place.

    Reference pattern: remove_emoji_refiner.py:57-82 — transform one text
    column, same rows out.
    """

    def __init__(self, input_key: str = "text"):
        self.input_key = input_key
        self.input_keys = (input_key,)
        self.output_keys = (input_key,)

    @abstractmethod
    def refine_expr(self, col: Column) -> Column:
        """Return the rewritten column expression."""

    def run(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        from pyspark.sql import functions as F

        return df.withColumn(self.input_key, self.refine_expr(F.col(self.input_key)))
