"""ClickHouse/MyScale connection pool + paged read contract.

Reference: ClickHouseConnectionPool
(dataflow/utils/db_pool/myscale_pool.py:11-163 — bounded pool with
health checks, context-manager checkout, status introspection) and
MyScaleDBStorage's page_size/page_num read paging
(utils/storage.py:761-811, default page_size=10000).

Spark-first note: for BULK reads the right tool is the JDBC reader
with partitioning (sources/readers.py::read_jdbc) — Spark parallelizes
range predicates across executors and the pool below is unnecessary.
This module serves the reference's two remaining use cases: (a) a
driver-side native-protocol pool for small control-plane queries
(DDL, counts, page probes) — functional wherever ``clickhouse-driver``
is installed, a clear ImportError here; (b) the page_size/page_num
read contract, implemented as a pure predicate builder usable with
either the pool or the JDBC reader.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any


class ClickHousePoolError(Exception):
    pass


class TooManyConnections(ClickHousePoolError):
    pass


class ClickHouseConnectionPool:
    """Bounded native-protocol connection pool (reference
    myscale_pool.py:11-163)."""

    # nested aliases kept for reference-compatible exception access
    ClickHousePoolError = ClickHousePoolError
    TooManyConnections = TooManyConnections

    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, min_connections: int = 5,
                 max_connections: int = 20,
                 health_check_interval: int = 30,
                 connect_timeout: int = 10, **kwargs: Any):
        try:
            from clickhouse_driver import Client  # type: ignore
            from clickhouse_driver.errors import Error as CHError  # type: ignore

            self._Client, self._CHError = Client, CHError
        except ImportError as e:
            raise ImportError(
                "clickhouse-driver is required for "
                "ClickHouseConnectionPool (not in this container): "
                "pip install clickhouse-driver. For bulk table reads "
                "use read_jdbc with partition options instead.") from e
        self._config = {"host": host, "port": port, "user": user,
                        "password": password, "database": database,
                        "connect_timeout": connect_timeout, **kwargs}
        self._min, self._max = min_connections, max_connections
        self._health_check_interval = health_check_interval
        self._pool: list = []
        self._count_lock = threading.Lock()
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._closed = False
        self._in_use = 0
        self._total_created = 0
        for _ in range(self._min):
            self._pool.append(self._create())

    def _create(self):
        # the health-probe replacement path calls this while holding the
        # main (non-reentrant) lock and the checkout path while not, so
        # the counter gets its own tiny lock (ordering main -> count,
        # never the reverse: no deadlock)
        with self._count_lock:
            self._total_created += 1
        return self._Client(**self._config)

    def _alive(self, client) -> bool:
        try:
            client.execute("SELECT 1")
            return True
        except Exception:
            return False

    @contextmanager
    def get_connection(self):
        """Checkout/return a pooled client; blocks when max in use."""
        import time as _time

        deadline = _time.monotonic() + self._config["connect_timeout"]
        with self._cond:
            if self._closed:
                raise ClickHousePoolError("pool is closed")
            # deadline-based wait: spurious/stolen wakeups re-wait for
            # the REMAINING time instead of failing immediately
            while not self._pool and self._in_use >= self._max:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    raise TooManyConnections(
                        f"{self._max} connections in use")
                self._cond.wait(timeout=remaining)
                if self._closed:
                    raise ClickHousePoolError("pool is closed")
            client = self._pool.pop() if self._pool else self._create()
            self._in_use += 1
        try:
            # health probe, skipped when this client was verified within
            # health_check_interval (reference pool semantics)
            now = _time.monotonic()
            last = getattr(client, "_df_last_checked", 0.0)
            if now - last > self._health_check_interval:
                if not self._alive(client):
                    try:
                        client.disconnect()
                    except Exception:
                        pass
                    client = self._create()
                client._df_last_checked = _time.monotonic()
        except BaseException:
            # replacement failed: release the reserved slot
            with self._cond:
                self._in_use -= 1
                self._cond.notify()
            raise
        try:
            yield client
        finally:
            with self._cond:
                self._in_use -= 1
                if not self._closed:
                    self._pool.append(client)
                    client = None
                self._cond.notify()
            if client is not None:
                # pool closed while this client was checked out: close()
                # only drained the idle list, so disconnect here instead
                # of silently leaking the socket
                try:
                    client.disconnect()
                except Exception:
                    pass

    def close(self) -> None:
        with self._cond:
            self._closed = True
            for c in self._pool:
                try:
                    c.disconnect()
                except Exception:
                    pass
            self._pool.clear()
            self._cond.notify_all()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()

    def get_status(self) -> dict:
        with self._lock:
            return {"idle": len(self._pool), "in_use": self._in_use,
                    "max": self._max, "closed": self._closed,
                    "total_created": self._total_created}


def paged_query(table: str, page_size: int = 10_000, page_num: int = 0,
                where: str = "", order_by: str = "",
                columns: str = "*") -> str:
    """Build one page's SELECT under the reference's page_size/page_num
    contract (storage.py:761-811; defaults page_size=10000, page_num=0).

    ORDER BY should be a stable key — LIMIT/OFFSET without one is
    nondeterministic in any distributed store.
    """
    if page_size <= 0 or page_num < 0:
        raise ValueError("page_size must be > 0 and page_num >= 0")
    sql = f"SELECT {columns} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    if order_by:
        sql += f" ORDER BY {order_by}"
    sql += f" LIMIT {page_size} OFFSET {page_num * page_size}"
    return sql


def jdbc_page_predicates(key: str, lo: int, hi: int,
                         page_size: int = 10_000) -> list[str]:
    """Translate the paging contract into Spark JDBC ``predicates``:
    non-overlapping key ranges, one partition per page — every
    executor reads its page concurrently instead of the driver looping
    LIMIT/OFFSET (which re-sorts the table once PER PAGE server-side:
    O(pages * n log n) — the scale trap the predicate form avoids).
    """
    if hi < lo:
        raise ValueError("hi must be >= lo")
    if page_size <= 0:
        raise ValueError("page_size must be > 0")
    preds = []
    start = lo
    while start <= hi:
        end = min(start + page_size - 1, hi)
        preds.append(f"{key} >= {start} AND {key} <= {end}")
        start = end + 1
    return preds
