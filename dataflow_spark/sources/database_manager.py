"""Text2SQL database manager: multi-engine connector registry.

Reference: dataflow/utils/text2sql/base.py:1-76 (DatabaseInfo /
QueryResult / DatabaseConnectorABC) and database_manager.py:84-400
(connector registry, discovery, result cache, batch execute/compare,
schema/DDL extraction, lembed() preprocessing for sqlite-vec).

Spark-first split of responsibilities: ROW-SCALE SQL execution against
per-executor sqlite stays in ``operators/text2sql.py`` (mapInPandas,
one interpreter-side connection per task — that's the 100 TB path).
This module is the DRIVER-SIDE utility surface the reference exposes:
discover databases, pull schemas/DDL for prompt construction, execute
and compare bounded query batches (thread pool), and normalize
results. sqlite is fully functional via the stdlib; mysql and
sqlite-vec are documented seams behind lazy imports (no pymysql /
sqlite-vec extension in this container).
"""

from __future__ import annotations

import hashlib
import os
import re
import sqlite3
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DatabaseInfo:
    """Database connection information (reference base.py:9-14)."""

    db_id: str
    db_type: str
    connection_info: Dict[str, Any]
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class QueryResult:
    """Standard query result format (reference base.py:16-23)."""

    success: bool
    data: List[Dict[str, Any]] = field(default_factory=list)
    columns: List[str] = field(default_factory=list)
    error: Optional[str] = None
    row_count: int = 0


class DatabaseConnectorABC:
    """Connector contract (reference base.py:26-76)."""

    def connect(self, connection_info: Dict) -> Any:
        raise NotImplementedError

    def execute_query(self, connection: Any, sql: str,
                      params: Optional[Tuple] = None) -> QueryResult:
        raise NotImplementedError

    def explain_query(self, connection: Any, sql: str,
                      params: Optional[Tuple] = None) -> QueryResult:
        raise NotImplementedError

    def get_schema_info(self, connection: Any,
                        db_id: Optional[str] = None) -> Dict[str, Any]:
        raise NotImplementedError

    def discover_databases(self, config: Dict) -> Dict[str, DatabaseInfo]:
        raise NotImplementedError

    def validate_connection(self, connection: Any) -> bool:
        try:
            return self.execute_query(connection, "SELECT 1").success
        except Exception:
            return False

    def close(self, connection: Any) -> None:
        if hasattr(connection, "close"):
            try:
                connection.close()
            except Exception:
                pass


class SQLiteConnector(DatabaseConnectorABC):
    """Full stdlib implementation; databases discovered as *.sqlite/
    *.db files under ``config['root_path']``."""

    EXTENSIONS = (".sqlite", ".db", ".sqlite3")

    def connect(self, connection_info: Dict) -> sqlite3.Connection:
        conn = sqlite3.connect(connection_info["path"],
                               check_same_thread=False)
        conn.row_factory = sqlite3.Row
        return conn

    def _run(self, connection, sql, params, prefix="") -> QueryResult:
        try:
            cur = connection.execute(prefix + sql, params or ())
            rows = cur.fetchall()
            cols = ([d[0] for d in cur.description]
                    if cur.description else [])
            data = [dict(r) for r in rows]
            return QueryResult(success=True, data=data, columns=cols,
                               row_count=len(data))
        except Exception as e:  # noqa: BLE001 — error taxonomy is the result
            return QueryResult(success=False, error=f"{type(e).__name__}: {e}")

    def execute_query(self, connection, sql, params=None) -> QueryResult:
        return self._run(connection, sql, params)

    def explain_query(self, connection, sql, params=None) -> QueryResult:
        return self._run(connection, sql, params, prefix="EXPLAIN QUERY PLAN ")

    def get_schema_info(self, connection, db_id=None) -> Dict[str, Any]:
        tables: Dict[str, Any] = {}
        master = self._run(
            connection,
            "SELECT name, sql FROM sqlite_master "
            "WHERE type='table' AND name NOT LIKE 'sqlite_%'", None)
        for row in master.data:
            name = row["name"]
            cols = self._run(connection, f'PRAGMA table_info("{name}")', None)
            sample = self._run(connection,
                               f'SELECT * FROM "{name}" LIMIT 2', None)
            tables[name] = {
                "create_statement": row["sql"],
                "columns": {c["name"]: {"type": c["type"],
                                        "pk": bool(c["pk"])}
                            for c in cols.data},
                "sample_rows": sample.data,
            }
        return {"db_id": db_id, "tables": tables}

    def discover_databases(self, config: Dict) -> Dict[str, DatabaseInfo]:
        root = config.get("root_path", ".")
        found: Dict[str, DatabaseInfo] = {}
        for dirpath, _, files in os.walk(root):
            for fn in files:
                if fn.endswith(self.EXTENSIONS):
                    db_id = os.path.splitext(fn)[0]
                    found[db_id] = DatabaseInfo(
                        db_id=db_id, db_type="sqlite",
                        connection_info={
                            "path": os.path.join(dirpath, fn)})
        return found


class SQLiteVecConnector(SQLiteConnector):
    """sqlite + the sqlite-vec extension (reference
    sqlite_vec_connector.py:24-163): vector KNN via MATCH/distance,
    with ``lembed(...)`` calls rewritten to vector literals through an
    EmbeddingServing (the reference registers a sqlite_lembed model
    instead; same query surface).

    When the native extension is absent (this container), the connector
    FALLS BACK to a functional pure-python emulation instead of
    erroring: the sqlite-vec distance functions are registered as
    Python scalar functions over JSON-text vectors, and the canonical
    KNN shape the reference's own VecSQL prompt mandates
    (``<col> MATCH <vec>`` plus ``LIMIT n`` or ``AND k = n``,
    text2sql.py:690-725) is rewritten to an equivalent
    ORDER BY distance query. Queries outside that grammar still run —
    any remaining MATCH falls through to sqlite and errors into the
    QueryResult, same taxonomy as the reference.
    """

    # one-arg lembed('text') and two-arg lembed('model', "text") forms
    LEMBED_RE = re.compile(
        r"""lembed\(\s*(?:'[^']*'\s*,\s*)?(?:'((?:[^']|'')*)'|"([^"]*)")\s*\)""")
    _MATCH_RE = re.compile(
        r"""(\w+(?:\.\w+)?)\s+MATCH\s+('\[[^']*\]')""", re.IGNORECASE)
    _K_RE = re.compile(r"\s+AND\s+k\s*=\s*(\d+)", re.IGNORECASE)
    _LIMIT_RE = re.compile(r"\bLIMIT\s+\d+\s*;?\s*$", re.IGNORECASE)

    def __init__(self, embedder=None):
        self.embedder = embedder
        self._native = None  # resolved at first connect

    @staticmethod
    def _parse_vec(v):
        import json

        if isinstance(v, (bytes, bytearray)):  # vec_f32 blob: 4-byte LE floats
            import struct

            return list(struct.unpack(f"<{len(v) // 4}f", bytes(v)))
        if isinstance(v, str):
            return json.loads(v)
        return list(v)

    @classmethod
    def _dist_l2(cls, a, b):
        va, vb = cls._parse_vec(a), cls._parse_vec(b)
        return sum((x - y) ** 2 for x, y in zip(va, vb)) ** 0.5

    @classmethod
    def _dist_cosine(cls, a, b):
        va, vb = cls._parse_vec(a), cls._parse_vec(b)
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        return 1.0 - dot / (na * nb) if na and nb else 1.0

    def connect(self, connection_info: Dict) -> sqlite3.Connection:
        conn = super().connect(connection_info)
        try:
            import sqlite_vec  # type: ignore

            conn.enable_load_extension(True)
            sqlite_vec.load(conn)
            conn.enable_load_extension(False)
            self._native = True
        except ImportError:
            # pure-python fallback: same function names sqlite-vec
            # exports, vectors as JSON text (or vec_f32 blobs)
            self._native = False
            conn.create_function("vec_distance_l2", 2, self._dist_l2)
            conn.create_function("vec_distance_cosine", 2, self._dist_cosine)
            conn.create_function(
                "vec_length", 1, lambda v: len(self._parse_vec(v)))
        return conn

    def preprocess_sql(self, sql: str) -> str:
        """Rewrite lembed(...) calls to json vector literals (reference
        sqlite_lembed registers the model in-database instead; the query
        text contract is identical) and, in fallback mode, lower the
        vec0 MATCH-KNN shape onto plain sqlite."""
        if self.embedder is not None:
            def repl(m: re.Match) -> str:
                text = (m.group(1).replace("''", "'")
                        if m.group(1) is not None else m.group(2))
                vec = self.embedder.embed_batch([text])[0]
                return "'[" + ",".join(f"{x:.6f}" for x in vec) + "]'"

            sql = self.LEMBED_RE.sub(repl, sql)
        if self._native is False:
            sql = self._lower_knn(sql)
        return sql

    def _lower_knn(self, sql: str) -> str:
        """`col MATCH '<vec>' (AND k = n | ... LIMIT n)` ->
        `ORDER BY vec_distance_l2(col, '<vec>') LIMIT n` (vec0's MATCH
        is an l2 top-k; `distance` references resolve to the same
        expression, mirroring vec0's implicit distance column)."""
        m = self._MATCH_RE.search(sql)
        if not m:
            return sql
        col, vec = m.group(1), m.group(2)
        dist = f"vec_distance_l2({col}, {vec})"
        sql = sql[:m.start()] + "1=1" + sql[m.end():]
        k = None
        km = self._K_RE.search(sql)
        if km:
            k = int(km.group(1))
            sql = sql[:km.start()] + sql[km.end():]
        # vec0 exposes the match distance as a `distance` column
        sql = re.sub(r"\bdistance\b", dist, sql)
        has_limit = self._LIMIT_RE.search(sql)
        has_order = re.search(r"\bORDER\s+BY\b", sql, re.IGNORECASE)
        tail = ""
        if not has_order:
            tail += f" ORDER BY {dist}"
        if k is not None and not has_limit:
            tail += f" LIMIT {k}"
        if tail:
            sql = sql.rstrip().rstrip(";")
            lm = self._LIMIT_RE.search(sql)
            if lm:  # ORDER BY must precede an existing LIMIT
                sql = sql[:lm.start()] + tail.lstrip() + " " + sql[lm.start():]
            else:
                sql += tail
        return sql

    def execute_query(self, connection, sql, params=None) -> QueryResult:
        return super().execute_query(connection, self.preprocess_sql(sql),
                                     params)


class MySQLConnector(DatabaseConnectorABC):
    """MySQL via pymysql (lazy import seam; for bulk Spark reads use
    sources/readers.py::read_jdbc with partitionColumn instead)."""

    def connect(self, connection_info: Dict):
        try:
            import pymysql  # type: ignore
        except ImportError as e:
            raise ImportError(
                "MySQLConnector needs 'pymysql' (not in this "
                "container); for distributed reads use read_jdbc.") from e
        return pymysql.connect(**connection_info)

    def execute_query(self, connection, sql, params=None) -> QueryResult:
        try:
            with connection.cursor() as cur:
                cur.execute(sql, params or ())
                cols = ([d[0] for d in cur.description]
                        if cur.description else [])
                data = [dict(zip(cols, r)) for r in cur.fetchall()]
            return QueryResult(success=True, data=data, columns=cols,
                               row_count=len(data))
        except Exception as e:  # noqa: BLE001
            return QueryResult(success=False, error=f"{type(e).__name__}: {e}")

    def explain_query(self, connection, sql, params=None) -> QueryResult:
        return self.execute_query(connection, "EXPLAIN " + sql, params)

    def get_schema_info(self, connection, db_id=None) -> Dict[str, Any]:
        tables: Dict[str, Any] = {}
        res = self.execute_query(connection, "SHOW TABLES")
        for row in res.data:
            (name,) = tuple(row.values())
            ddl = self.execute_query(connection, f"SHOW CREATE TABLE `{name}`")
            stmt = (list(ddl.data[0].values())[1] if ddl.success and ddl.data
                    else "")
            tables[name] = {"create_statement": stmt, "columns": {},
                            "sample_rows": []}
        return {"db_id": db_id, "tables": tables}

    def discover_databases(self, config: Dict) -> Dict[str, DatabaseInfo]:
        conn = self.connect(config)
        try:
            res = self.execute_query(conn, "SHOW DATABASES")
            skip = {"information_schema", "mysql", "performance_schema",
                    "sys"}
            return {
                list(r.values())[0]: DatabaseInfo(
                    db_id=list(r.values())[0], db_type="mysql",
                    connection_info={**config,
                                     "database": list(r.values())[0]})
                for r in res.data if list(r.values())[0] not in skip}
        finally:
            self.close(conn)


class CacheManager:
    """Tiny TTL result cache (reference database_manager.py:19-82)."""

    def __init__(self, max_size: int = 100, ttl: int = 1800):
        self.max_size, self.ttl = max_size, ttl
        self._store: Dict[str, Tuple[float, Any]] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _make_key(*args) -> str:
        return hashlib.md5("||".join(map(str, args)).encode()).hexdigest()

    def get(self, *args):
        key = self._make_key(*args)
        with self._lock:
            hit = self._store.get(key)
            if hit is None:
                return None
            ts, value = hit
            if time.time() - ts > self.ttl:
                del self._store[key]
                return None
            return value

    def set(self, value, *args) -> None:
        key = self._make_key(*args)
        with self._lock:
            if len(self._store) >= self.max_size:
                oldest = min(self._store, key=lambda k: self._store[k][0])
                del self._store[oldest]
            self._store[key] = (time.time(), value)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()


class DatabaseManager:
    """Connector registry + discovery + bounded batch execution
    (reference database_manager.py:84-400)."""

    CONNECTOR_CLASSES = {
        "sqlite": SQLiteConnector,
        "sqlite-vec": SQLiteVecConnector,
        "mysql": MySQLConnector,
    }

    def __init__(self, db_type: str = "sqlite",
                 config: Optional[Dict] = None, max_workers: int = 4,
                 max_rows: int = 10_000,
                 connector_kwargs: Optional[Dict] = None):
        """``connector_kwargs`` is forwarded to the connector class —
        e.g. ``{"embedder": <EmbeddingServing>}`` for 'sqlite-vec' so
        its lembed('text') rewrite actually has an embedder."""
        if db_type not in self.CONNECTOR_CLASSES:
            raise ValueError(
                f"unsupported db_type {db_type!r}; register a "
                "DatabaseConnectorABC subclass in CONNECTOR_CLASSES")
        self.db_type = db_type
        self.config = config or {}
        self.connector = self.CONNECTOR_CLASSES[db_type](
            **(connector_kwargs or {}))
        self.max_workers = max_workers
        self.max_rows = max_rows
        self.cache = CacheManager()
        self.databases = self.connector.discover_databases(self.config)

    # -- connections --------------------------------------------------
    def get_connection(self, db_id: str):
        if db_id not in self.databases:
            raise KeyError(f"unknown db_id {db_id!r}; "
                           f"known: {sorted(self.databases)[:10]}")
        return self.connector.connect(
            self.databases[db_id].connection_info)

    def database_exists(self, db_id: str) -> bool:
        return db_id in self.databases

    def list_databases(self) -> List[str]:
        return sorted(self.databases)

    # -- execution ----------------------------------------------------
    def execute_query(self, db_id: str, sql: str) -> QueryResult:
        conn = self.get_connection(db_id)
        try:
            res = self.connector.execute_query(conn, sql)
            if res.success and res.row_count > self.max_rows:
                res.data = res.data[:self.max_rows]
                res.row_count = self.max_rows
            return res
        finally:
            self.connector.close(conn)

    def batch_execute_queries(
            self, queries: List[Tuple[str, str]]) -> List[QueryResult]:
        """[(db_id, sql)] -> aligned results; driver thread pool for
        BOUNDED batches (corpus-scale execution belongs in the
        mapInPandas operators)."""
        with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
            return list(ex.map(
                lambda q: self.execute_query(q[0], q[1]), queries))

    def batch_explain_queries(
            self, queries: List[Tuple[str, str]]) -> List[QueryResult]:
        def one(q):
            conn = self.get_connection(q[0])
            try:
                return self.connector.explain_query(conn, q[1])
            finally:
                self.connector.close(conn)

        with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
            return list(ex.map(one, queries))

    # -- comparison ---------------------------------------------------
    @staticmethod
    def compare_results(result1: QueryResult,
                        result2: QueryResult) -> Dict[str, Any]:
        """Order-insensitive, type-normalized result equality
        (reference database_manager.py:259-318)."""
        if not (result1.success and result2.success):
            return {"equal": False,
                    "error": result1.error or result2.error}

        def norm_cell(v):
            if isinstance(v, float):
                return round(v, 6)
            if isinstance(v, bytes):
                return v.hex()
            return v

        def norm(res: QueryResult):
            rows = [tuple(norm_cell(v) for v in row.values())
                    for row in res.data]
            return sorted(rows, key=lambda t: tuple(
                (x is None, str(x)) for x in t))

        return {"equal": norm(result1) == norm(result2),
                "rows1": result1.row_count, "rows2": result2.row_count}

    def compare_queries(self, db_id: str, sql1: str,
                        sql2: str) -> Dict[str, Any]:
        return self.compare_results(self.execute_query(db_id, sql1),
                                    self.execute_query(db_id, sql2))

    def batch_compare_queries(
            self, query_triples: List[Tuple[str, str, str]]
    ) -> List[Dict[str, Any]]:
        with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
            return list(ex.map(
                lambda t: self.compare_queries(*t), query_triples))

    # -- schema / prompt assembly ------------------------------------
    def _get_schema(self, db_id: str) -> Dict[str, Any]:
        cached = self.cache.get("schema", self.db_type, db_id)
        if cached is not None:
            return cached
        conn = self.get_connection(db_id)
        try:
            schema = self.connector.get_schema_info(conn, db_id)
        finally:
            self.connector.close(conn)
        self.cache.set(schema, "schema", self.db_type, db_id)
        return schema

    def get_create_statements_and_insert_statements(
            self, db_id: str) -> tuple:
        schema = self._get_schema(db_id)
        creates = [t["create_statement"]
                   for t in schema["tables"].values()
                   if t.get("create_statement")]
        inserts = []
        for name, t in schema["tables"].items():
            for row in t.get("sample_rows", []):
                cols = ", ".join(row.keys())
                vals = ", ".join(
                    "NULL" if v is None
                    else str(v) if isinstance(v, (int, float))
                    else "'" + str(v).replace("'", "''") + "'"
                    for v in row.values())
                inserts.append(
                    f"INSERT INTO {name} ({cols}) VALUES ({vals});")
        return creates, inserts

    def get_db_details(self, db_id: str) -> str:
        creates, _ = self.get_create_statements_and_insert_statements(db_id)
        return "\n\n".join(creates)
