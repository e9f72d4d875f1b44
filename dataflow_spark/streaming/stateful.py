"""Custom stateful streaming: running per-key aggregates across
micro-batches via ``applyInPandasWithState``.

The reference has no event-time state (SURVEY.md §2.12); this is part of
the engine's beyond-the-reference streaming surface. The pattern is the
one Structured Streaming documents for arbitrary stateful ops: state is
a tuple kept per group key, updated once per micro-batch, emitted as an
update stream. Works identically on an unbounded source and on
``availableNow`` replay of a directory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

RUNNING_STATS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def running_user_stats(events: DataFrame, user_key: str = "user_id",
                       value_key: str = "value") -> DataFrame:
    """Cumulative (count, sum) per user maintained across micro-batches.

    Streaming-only (Spark rejects applyInPandasWithState in batch
    queries); the batch equivalent of the final state is a plain
    ``groupBy(user).agg(count, sum)`` — the property the streaming test
    asserts against.
    """

    def update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_key].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(user_key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
