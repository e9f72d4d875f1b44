"""Vector math over array<float|double> columns — JVM-side expressions.

Used by the similarity-search and semantic-dedup operators. All helpers
cast to double before arithmetic so results are reproducible against a
double-precision oracle regardless of the stored element type.
"""

from __future__ import annotations

import pandas as pd

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


def hyperplane_bands_udf(num_planes: int = 16, num_bands: int = 4,
                         seed: int = 42, dim: int | None = None):
    """Vectorized random-hyperplane LSH band keys: embedding array ->
    array<long> of ``num_bands`` packed sign-bit keys.

    The pure-expression variant (per-plane zip_with/aggregate trees) is
    CodegenFallback and measured ~1000x slower per row; this computes
    the whole Arrow batch as one (batch x dim) @ (dim x planes) matmul.
    Same plane family for a given seed regardless of batch shape.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    width = num_planes // num_bands

    @pandas_udf("array<long>")
    def bands(s: pd.Series) -> pd.Series:
        X = np.array(
            [v if v is not None else [] for v in s], dtype=object)
        lens = {len(v) for v in X}
        out = [None] * len(X)
        rng_cache = {}
        for L in lens:
            if L == 0:
                continue
            if L not in rng_cache:
                rng = np.random.RandomState(seed)
                rng_cache[L] = rng.standard_normal((num_planes, L))
            planes = rng_cache[L]
            idx = [i for i, v in enumerate(X) if len(v) == L]
            M = np.array([X[i] for i in idx], dtype=np.float64)
            bits = (M @ planes.T) > 0          # (n, num_planes)
            weights = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)
            for j, i in enumerate(idx):
                row = bits[j].astype(np.int64)
                out[i] = [int(row[b * width:(b + 1) * width] @ weights)
                          for b in range(num_bands)]
        return pd.Series(out)

    return bands
