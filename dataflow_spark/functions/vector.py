"""Vector math over array<float|double> columns — JVM-side expressions.

Used by the similarity-search and semantic-dedup operators. All helpers
cast to double before arithmetic so results are reproducible against a
double-precision oracle regardless of the stored element type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize; null-safe (returns original when norm == 0)."""
    n = norm(a)
    return F.when(n > 0, F.transform(to_double_array(a), lambda x: x / n)).otherwise(
        to_double_array(a)
    )
