"""Skew mitigation helpers: salted two-stage aggregation and salted join.

AQE (spark.sql.adaptive.skewJoin) already splits skewed shuffle-join
partitions at runtime, so prefer plain joins first. What AQE does NOT
split is a skewed ``groupBy`` key — all rows of a hot key still land in
one reducer. ``salted_agg`` spreads a hot key over ``n_salts`` partial
groups and merges the partials; correct for algebraic aggregates
(count/sum/min/max, and avg derived from sum+count).

``salted_join`` is the manual fallback when AQE is unavailable (e.g.
broadcast-disabled builds): salt the large side deterministically and
replicate the small side once per salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"

_PARTIAL = {
    "count": lambda c: F.count(F.lit(1) if c is None else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_MERGE = {
    "count": F.sum,  # counts add up across salt groups
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(df: DataFrame, group_cols: list[str],
               aggs: dict[str, tuple[str, str | None]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs`` maps output column -> (fn, input column) with fn in
    count/sum/min/max; input column is None for count(*). avg: request
    sum and count, divide afterwards.

    The salt is derived from hashing the full row (not rand()) so
    retried tasks produce identical partials — required for exactly-once
    results under speculative execution.
    """
    unknown = {f for f, _ in aggs.values()} - _PARTIAL.keys()
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {sorted(unknown)}")
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)))
    partial = salted.groupBy(*group_cols, _SALT).agg(
        *[_PARTIAL[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    return partial.groupBy(*group_cols).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _) in aggs.items()])


def salted_join(large: DataFrame, small: DataFrame, on: list[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated ``n_salts`` times, so one hot key spreads over
    ``n_salts`` reducers. Output columns match ``large.join(small, on,
    how)``. Prefer AQE skew handling; use this when AQE can't engage.
    """
    lg = large.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salts)))
    sm = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return lg.join(sm, on + [_SALT], how).drop(_SALT)
