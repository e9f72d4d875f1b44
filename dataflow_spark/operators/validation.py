"""Declarative data-quality validation (Deequ-style expectation suite).

The reference validates pipelines structurally — compile-time key checks
(/root/reference/dataflow/pipeline/Pipeline.py:100-135) — but has no
content-level data-quality gate. At 100 TB a corpus lands from many
upstream jobs and a cheap declarative contract ("doc_id unique, text
never null, lang in {...}, every order has a customer") is the first
thing a production pipeline runs. This operator provides it Spark-first:

- ALL column-level checks compile into ONE aggregation pass over the
  table (a single-row ``df.agg(...)`` — one scan, map-side combined,
  no per-check jobs), then unpivot to one row per check with
  ``F.inline``. Adding a check adds an expression, not a scan.
- referential-integrity checks each add a broadcast left-anti join
  (dimension side is small by definition); their single-row counts
  union onto the same result frame.

Everything stays lazy: ``run`` returns a DataFrame of
``(check, column, metric, expected, passed)`` and triggers no action.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class ExpectationSuiteOperator(Operator):
    """Run a declarative list of data-quality checks in one scan.

    ``checks`` is a list of dicts; supported kinds:

    - ``{"check": "row_count", "at_least": n, "at_most": m}``
    - ``{"check": "not_null", "column": c, "max_null_frac": f}`` (default 0)
    - ``{"check": "unique", "column": c}`` — metric is the duplicate count
    - ``{"check": "min", "column": c, "at_least": v}``
    - ``{"check": "max", "column": c, "at_most": v}``
    - ``{"check": "accepted_values", "column": c, "values": [...]}``
      — metric is the count of non-null values outside the set
    - ``{"check": "matches_regex", "column": c, "pattern": p}``
      — metric is the count of non-null values NOT matching
    - ``{"check": "ref_integrity", "column": c, "ref": name,
       "ref_column": rc}`` — metric is the orphan count; the referenced
      table is passed to ``run(df, refs={name: DataFrame})``
    """

    output_keys = ("check", "column", "metric", "expected", "passed")

    def __init__(self, checks: list[dict]):
        if not checks:
            raise ValueError("ExpectationSuiteOperator needs >= 1 check")
        self.checks = checks
        self.input_keys = tuple(sorted({c["column"] for c in checks
                                        if c.get("column")}))

    # -- per-kind aggregate expression + pass predicate ------------------

    def _agg_expr(self, c: dict) -> Column:
        kind, col = c["check"], c.get("column")
        if kind == "row_count":
            return F.count(F.lit(1)).cast("double")
        if kind == "not_null":
            return F.avg(F.col(col).isNull().cast("double"))
        if kind == "unique":
            return (F.count(col) - F.countDistinct(col)).cast("double")
        if kind == "min":
            return F.min(col).cast("double")
        if kind == "max":
            return F.max(col).cast("double")
        if kind == "accepted_values":
            bad = (~F.col(col).isin(*c["values"])) & F.col(col).isNotNull()
            return F.sum(bad.cast("long")).cast("double")
        if kind == "matches_regex":
            bad = (~F.col(col).rlike(c["pattern"])) & F.col(col).isNotNull()
            return F.sum(bad.cast("long")).cast("double")
        raise ValueError(f"unknown check kind: {kind!r}")

    @staticmethod
    def _bounds(c: dict) -> tuple[float | None, float | None, str]:
        """(lower, upper, human-readable expectation) for a metric."""
        kind = c["check"]
        if kind == "row_count":
            lo, hi = c.get("at_least"), c.get("at_most")
            return lo, hi, f"count in [{lo}, {hi}]"
        if kind == "not_null":
            hi = float(c.get("max_null_frac", 0.0))
            return None, hi, f"null_frac <= {hi}"
        if kind in ("unique", "accepted_values", "matches_regex",
                    "ref_integrity"):
            return None, 0.0, "violations == 0"
        if kind == "min":
            return c.get("at_least"), None, f"min >= {c.get('at_least')}"
        if kind == "max":
            return None, c.get("at_most"), f"max <= {c.get('at_most')}"
        raise ValueError(kind)

    def _result_struct(self, c: dict, metric: Column) -> Column:
        lo, hi, expected = self._bounds(c)
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (metric >= F.lit(float(lo)))
        if hi is not None:
            ok = ok & (metric <= F.lit(float(hi)))
        return F.struct(
            F.lit(c["check"]).alias("check"),
            F.lit(c.get("column", "*")).alias("column"),
            F.round(metric, 6).alias("metric"),
            F.lit(expected).alias("expected"),
            ok.cast("int").alias("passed"),
        )

    def run(self, df: DataFrame, refs: dict[str, DataFrame] | None = None,
            **kw: Any) -> DataFrame:
        scan = [c for c in self.checks if c["check"] != "ref_integrity"]
        fks = [c for c in self.checks if c["check"] == "ref_integrity"]

        out = None
        if scan:
            aggs = [self._agg_expr(c).alias(f"_m{i}")
                    for i, c in enumerate(scan)]
            row = df.agg(*aggs)  # ONE pass over the fact table
            structs = [self._result_struct(c, F.col(f"_m{i}"))
                       for i, c in enumerate(scan)]
            out = row.select(F.inline(F.array(*structs)))

        for c in fks:
            ref = (refs or {}).get(c["ref"])
            if ref is None:
                raise KeyError(
                    f"ref_integrity check needs refs[{c['ref']!r}] at run()")
            keys = ref.select(F.col(c["ref_column"]).alias(c["column"]))
            orphans = (df.join(F.broadcast(keys.distinct()), c["column"],
                               "left_anti")
                       .agg(F.count(F.lit(1)).cast("double").alias("_m")))
            res = orphans.select(
                F.inline(F.array(self._result_struct(c, F.col("_m")))))
            out = res if out is None else out.unionAll(res)
        return out
