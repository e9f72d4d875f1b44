"""Session-keyed memo for plan-construction UDF objects.

The first invocation of a pandas UDF cloudpickles its closure and
creates the JVM-side ``UserDefinedPythonFunction`` — ~30-50 py4j round
trips plus the pickle CPU. The returned :class:`UserDefinedFunction`
then caches that JVM handle (``_judf``), so *reusing one UDF object*
makes every later plan build cost ~2 round trips. Operators that build
their UDFs inside ``run()`` paid the full registration on EVERY plan
build (the bench constructs plans fresh per timed iteration — honestly
— so this was a real per-invocation driver cost, and it scales with
driver RPC latency, not data size).

:func:`session_udf` memoizes the UDF **object** per live
``SparkSession``. It stores plan-construction handles only — never
data, never results, never anything derived from an input table — so
every invocation still recomputes everything from the parquet inputs.
Entries are keyed by the session object in a ``WeakKeyDictionary``:
a stopped session's stale JVM handles can never be served to a new
session, and the memo dies with the session.

Rules for call sites (enforced by review + tests/test_udf_cache.py):

- ``key`` MUST contain every closure input that changes the UDF's
  output (config params, constants). Factories that close over
  per-run data (a broadcast variable, a collected set) MUST NOT be
  memoized — build them fresh each run.
- ``key`` should lead with a module-qualified name so factories never
  collide.
"""

from __future__ import annotations

import threading
import weakref
from typing import Any, Callable, Hashable

from pyspark.sql import SparkSession

_UDFS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary())
# Concurrent plan builds on one SparkSession (multi-threaded driver,
# guide §2.6) must not race the lookup/insert: without the lock two
# threads can build the factory twice and hand out different objects,
# breaking the identity contract pinned by tests/test_udf_cache.py.
_LOCK = threading.Lock()


def session_udf(key: Hashable, factory: Callable[[], Any]) -> Any:
    """Return ``factory()`` memoized per (active SparkSession, key).

    Falls back to a fresh build when no session is active (Spark-free
    unit tests of the factories) or the key is unhashable.
    """
    spark = SparkSession.getActiveSession()
    if spark is None:
        return factory()
    try:
        hash(key)
    except TypeError:  # unhashable key — never cache
        return factory()
    with _LOCK:
        per = _UDFS.setdefault(spark, {})
        hit = per.get(key)
        if hit is None:
            hit = per[key] = factory()
    return hit
