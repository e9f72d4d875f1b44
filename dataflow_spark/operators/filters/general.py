"""GeneralFilter / TransformOperator — the engine's escape hatches.

Reference parity:
  - GeneralFilter: arbitrary user predicates AND-combined
    (core_text/filter/general_filter.py:58-76; lambda catalog in
    test/small_functions/filtering.py:14-33 — == != > >= < <= isin
    str.contains/startswith/endswith isna notna).
  - PandasOperator: arbitrary df -> df transform list
    (core_text/refine/pandas_operator.py:42-52) — projections, sorts,
    renames, top-k.

Ours are strictly more powerful: predicates are native Spark Columns or
SQL strings, so they stay in Catalyst (pushdown/pruning) instead of
opaque Python lambdas.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class GeneralFilter(Operator):
    """AND-combine a list of predicates (Column objects or SQL strings)."""

    def __init__(self, predicates: Sequence[Column | str]):
        self.predicates = list(predicates)
        self.input_keys = ()
        self.output_keys = ()

    def run(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        for p in self.predicates:
            df = df.filter(F.expr(p) if isinstance(p, str) else p)
        return df


@OPERATOR_REGISTRY.register()
class TransformOperator(Operator):
    """Apply a list of DataFrame -> DataFrame callables in order.

    ``provides``/``consumes`` optionally declare the columns the
    transforms add/read so ``Pipeline.compile`` can validate key flow
    through an otherwise-opaque callable.
    """

    def __init__(self, transforms: Sequence[Callable[[DataFrame], DataFrame]],
                 provides: Sequence[str] = (),
                 consumes: Sequence[str] = ()):
        self.transforms = list(transforms)
        self.input_keys = tuple(consumes)
        self.output_keys = tuple(provides)

    def run(self, df: DataFrame, **kwargs: Any) -> DataFrame:
        for t in self.transforms:
            df = t(df)
        return df
