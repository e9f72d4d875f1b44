"""Bounded driver pulls that avoid the CollectLimit scale-up job cascade.

``limit(n)`` + a pandas collect executes through Spark's incremental take:
try 1 partition, then ``spark.sql.limit.scaleUpFactor`` (4) more, and so
on until ``n`` rows are found or partitions are exhausted. Each attempt
is its own job — for the engine's budget-bounded probes (near-dup CC
edges, segment-dedup duplicated tail, KNN query sides), whose upstream
shuffle stages are materialized anyway before the first attempt, the
scale-up buys nothing and costs 2+ scheduler round trips of pure latency
per invocation (50-150 ms/job on a loaded driver).

:func:`bounded_pull` scopes ``spark.sql.limit.initialNumPartitions`` so
the first attempt covers ``_INITIAL_PARTITIONS`` result partitions at
once — one collect job in the common case. The value is deliberately
modest: each result-stage task ships up to ``n`` rows, so a huge first
attempt could flood the driver on an over-limit result at scale (the
very case the probes exist to detect); 16 partitions x a few-million-row
cap stays well under ``spark.driver.maxResultSize`` while covering every
AQE-coalesced local plan in one shot. Limit semantics are unchanged —
this is purely how many partitions the first take attempt reads.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_KEY = "spark.sql.limit.initialNumPartitions"
_INITIAL_PARTITIONS = "16"


def bounded_pull(df: DataFrame, n: int) -> "pd.DataFrame":
    """Limit to ``n`` rows and collect to pandas in (usually) one job.

    ``n`` must be a finite row bound — every call site is a
    budget-bounded driver probe (see tests/test_no_unbounded_collect.py).
    """
    conf = df.sparkSession.conf
    old = conf.get(_KEY, None)
    conf.set(_KEY, _INITIAL_PARTITIONS)
    try:
        return df.limit(int(n)).toPandas()
    finally:
        if old is None:
            conf.unset(_KEY)
        else:
            conf.set(_KEY, old)
