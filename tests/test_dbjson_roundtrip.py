"""ClickHouse/MyScale `data`-JSON column contract: integration round-trip
through an embedded columnar store (DuckDB standing in for ClickHouse —
same contract shape: system columns + one JSON string column; the
production hop is a JDBC writer/reader with identical layout)."""

import duckdb
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from dataflow_spark.sources.dbjson import (SYSTEM_COLUMNS, pack_data_column,
                                           unpack_data_column)


@pytest.fixture()
def user_df(spark):
    rows = [
        (1, "alice says \"hi\"", 0.5, None),
        (2, "unicode: café 中文", -3.25, "tag"),
        (3, None, 0.0, "x,y\nz"),
    ]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
        StructField("label", StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_pack_store_readback_unpack(spark, user_df, tmp_path):
    packed = pack_data_column(user_df, pipeline_id="p1", task_id=7)
    assert set(packed.columns) >= {"data", "pipeline_id", "task_id",
                                   "raw_data_id"}

    # store hop: write into an embedded DB table, read back
    con = duckdb.connect(str(tmp_path / "store.db"))
    con.register("staged", packed.toPandas())
    con.execute("CREATE TABLE dataflow_rows AS SELECT * FROM staged")
    back = con.execute(
        "SELECT data, pipeline_id, task_id, raw_data_id "
        "FROM dataflow_rows").fetchdf()
    con.close()

    restored_packed = spark.createDataFrame(back)
    restored = unpack_data_column(restored_packed, schema=user_df.schema)

    got = {r.doc_id: (r.text, r.score, r.label)
           for r in restored.select("doc_id", "text", "score", "label").collect()}
    want = {r.doc_id: (r.text, r.score, r.label) for r in user_df.collect()}
    assert got == want
    assert restored.schema["score"].dataType == DoubleType()
    # system columns survived the store hop
    sys_rows = restored.select("pipeline_id", "task_id").distinct().collect()
    assert [(r.pipeline_id, r.task_id) for r in sys_rows] == [("p1", 7)]


def test_store_side_json_query(spark, user_df, tmp_path):
    """The store itself can filter on JSON fields — the contract's point:
    ClickHouse/MyScale query user fields via JSON functions without the
    engine unpacking first."""
    packed = pack_data_column(user_df, pipeline_id="p2")
    con = duckdb.connect()
    con.register("t", packed.toPandas())
    n = con.execute(
        "SELECT count(*) FROM t "
        "WHERE CAST(json_extract(data, '$.score') AS DOUBLE) >= 0").fetchone()[0]
    con.close()
    assert n == 2


def test_existing_system_columns_preserved(spark, user_df):
    df = user_df.withColumn("pipeline_id", F.lit("keep-me"))
    packed = pack_data_column(df, pipeline_id="ignored")
    assert packed.select("pipeline_id").distinct().collect()[0][0] == "keep-me"
    assert SYSTEM_COLUMNS[0] == "pipeline_id"


def test_jdbc_roundtrip_embedded_derby(spark, user_df, tmp_path):
    """Real JDBC hop (Spark jdbc source -> embedded Derby -> jdbc read):
    the exact production path of the ClickHouse/MyScale contract, with
    Derby standing in as the JDBC-capable store."""
    from dataflow_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/chdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    packed = pack_data_column(user_df, pipeline_id="p-jdbc", task_id=3)
    (packed.write.format("jdbc").option("url", url)
     .option("dbtable", "dataflow_rows").option("driver", driver)
     .mode("overwrite").save())

    back = read_jdbc(spark, url, "dataflow_rows", driver=driver)
    restored = unpack_data_column(back, schema=user_df.schema)
    got = {r.doc_id: (r.text, r.score, r.label)
           for r in restored.select("doc_id", "text", "score", "label").collect()}
    want = {r.doc_id: (r.text, r.score, r.label) for r in user_df.collect()}
    assert got == want
    sysr = restored.select("pipeline_id", "task_id").distinct().collect()
    assert [(r.pipeline_id, r.task_id) for r in sysr] == [("p-jdbc", 3)]


class TestDatabaseManager:
    """Driver-side text2sql DatabaseManager (reference
    utils/text2sql/database_manager.py shape) over real sqlite files."""

    @staticmethod
    def _mkdb(tmp_path, name="school"):
        import sqlite3

        p = str(tmp_path / f"{name}.sqlite")
        conn = sqlite3.connect(p)
        conn.execute("CREATE TABLE students (id INTEGER PRIMARY KEY, "
                     "name TEXT, grade REAL)")
        conn.executemany("INSERT INTO students VALUES (?, ?, ?)",
                         [(1, "ann", 3.5), (2, "bob", 2.0)])
        conn.commit(); conn.close()
        return p

    def test_discovery_execute_and_schema(self, tmp_path):
        from dataflow_spark.sources.database_manager import DatabaseManager

        self._mkdb(tmp_path)
        mgr = DatabaseManager(db_type="sqlite",
                              config={"root_path": str(tmp_path)})
        assert mgr.list_databases() == ["school"]
        res = mgr.execute_query("school",
                                "SELECT name FROM students ORDER BY id")
        assert res.success and [r["name"] for r in res.data] == ["ann", "bob"]
        bad = mgr.execute_query("school", "SELECT nope FROM students")
        assert not bad.success and "OperationalError" in bad.error
        creates, inserts = \
            mgr.get_create_statements_and_insert_statements("school")
        assert any("CREATE TABLE students" in c for c in creates)
        assert any("INSERT INTO students" in i for i in inserts)
        assert "students" in mgr.get_db_details("school")

    def test_batch_and_compare(self, tmp_path):
        from dataflow_spark.sources.database_manager import DatabaseManager

        self._mkdb(tmp_path)
        mgr = DatabaseManager(db_type="sqlite",
                              config={"root_path": str(tmp_path)})
        out = mgr.batch_execute_queries([
            ("school", "SELECT count(*) AS n FROM students"),
            ("school", "SELECT 1 AS one")])
        assert [r.success for r in out] == [True, True]
        cmp_ = mgr.compare_queries(
            "school",
            "SELECT name FROM students ORDER BY id",
            "SELECT name FROM students ORDER BY name DESC")
        assert cmp_["equal"]  # order-insensitive comparison
        ex = mgr.batch_explain_queries(
            [("school", "SELECT * FROM students WHERE id = 1")])
        assert ex[0].success

    def test_sqlite_vec_fallback_is_functional(self, tmp_path):
        """Without the native extension, the connector emulates the
        vec0 contract in pure python: non-vector SQL just runs and
        returns the standard QueryResult shape."""
        from dataflow_spark.sources.database_manager import DatabaseManager

        self._mkdb(tmp_path)
        mgr = DatabaseManager(db_type="sqlite-vec",
                              config={"root_path": str(tmp_path)})
        res = mgr.execute_query("school", "SELECT 1 AS one")
        assert res.success and res.data == [{"one": 1}]
        assert res.columns == ["one"] and res.row_count == 1

    def test_lembed_rewrite(self):
        from dataflow_spark.serving.mock import HashEmbeddingServing
        from dataflow_spark.sources.database_manager import SQLiteVecConnector

        c = SQLiteVecConnector(embedder=HashEmbeddingServing(dim=4))
        out = c.preprocess_sql(
            "SELECT * FROM t WHERE emb MATCH lembed('hello') LIMIT 5")
        assert "lembed" not in out and out.count(",") >= 3
        # reference two-arg form: lembed('model', "semantic text")
        # (prompts/text2sql.py:708 — first arg is the model name)
        out2 = c.preprocess_sql(
            "SELECT * FROM t WHERE emb MATCH "
            "lembed('all-MiniLM-L6-v2', \"a coffee shop\") AND k = 3")
        assert "lembed" not in out2 and "all-MiniLM" not in out2

    def test_vec_knn_query_end_to_end_without_extension(self, tmp_path):
        """The reference's canonical VecSQL shape (MATCH lembed(...)
        plus `AND k = n` or LIMIT, prompts/text2sql.py:690-725) runs on
        plain sqlite3 through the fallback: l2 top-k with the implicit
        `distance` column, standard QueryResult shape."""
        import json
        import sqlite3

        from dataflow_spark.serving.mock import HashEmbeddingServing
        from dataflow_spark.sources.database_manager import DatabaseManager

        embedder = HashEmbeddingServing(dim=8)
        qvec = embedder.embed_batch(["the query"])[0]
        # three docs: one exactly at the query vector, two offset
        conn = sqlite3.connect(tmp_path / "vecdb.sqlite")
        conn.execute("CREATE TABLE docs(name TEXT, content_embedding TEXT)")
        rows = [("exact", qvec),
                ("near", [x + 0.1 for x in qvec]),
                ("far", [x + 5.0 for x in qvec])]
        for name, v in rows:
            conn.execute("INSERT INTO docs VALUES (?, ?)",
                         (name, json.dumps([round(x, 6) for x in v])))
        conn.commit()
        conn.close()

        mgr = DatabaseManager(db_type="sqlite-vec",
                              config={"root_path": str(tmp_path)},
                              connector_kwargs={"embedder": embedder})
        res = mgr.execute_query(
            "vecdb",
            "SELECT name, distance FROM docs "
            "WHERE content_embedding MATCH lembed('the query') AND k = 2")
        assert res.success, res.error
        assert res.columns[0] == "name" and res.row_count == 2
        assert [r["name"] for r in res.data] == ["exact", "near"]
        d = [list(r.values())[1] for r in res.data]
        assert d[0] < 1e-6 and d[0] < d[1]
        # LIMIT form of the same query
        res2 = mgr.execute_query(
            "vecdb",
            "SELECT name FROM docs WHERE content_embedding MATCH "
            "lembed('the query') LIMIT 1")
        assert res2.success and [r["name"] for r in res2.data] == ["exact"]

    def test_unknown_type_rejected(self):
        import pytest

        from dataflow_spark.sources.database_manager import DatabaseManager

        with pytest.raises(ValueError):
            DatabaseManager(db_type="oracle")


class TestClickHousePaging:
    def test_pool_is_documented_seam(self):
        import pytest

        from dataflow_spark.sources.clickhouse import ClickHouseConnectionPool

        with pytest.raises(ImportError, match="clickhouse-driver"):
            ClickHouseConnectionPool("h", 9000, "u", "p", "db")

    def test_paged_query_contract(self):
        from dataflow_spark.sources.clickhouse import paged_query

        sql = paged_query("docs", page_size=100, page_num=3,
                          where="lang = 'en'", order_by="id")
        assert sql.endswith("LIMIT 100 OFFSET 300")
        assert "WHERE lang = 'en'" in sql and "ORDER BY id" in sql

    def test_jdbc_page_predicates_cover_range(self):
        from dataflow_spark.sources.clickhouse import jdbc_page_predicates

        preds = jdbc_page_predicates("id", 0, 249, page_size=100)
        assert len(preds) == 3
        assert preds[0] == "id >= 0 AND id <= 99"
        assert preds[-1] == "id >= 200 AND id <= 249"


class _FakeCHClient:
    """Stands in for clickhouse_driver.Client: counts live sockets."""

    live = []

    def __init__(self, **kw):
        self.disconnected = False
        _FakeCHClient.live.append(self)

    def execute(self, sql):
        return [(1,)]

    def disconnect(self):
        self.disconnected = True


class TestClickHousePoolLifecycle:
    def _pool(self, monkeypatch, **kw):
        import sys
        import types

        fake = types.ModuleType("clickhouse_driver")
        fake.Client = _FakeCHClient
        errs = types.ModuleType("clickhouse_driver.errors")
        errs.Error = RuntimeError
        fake.errors = errs
        monkeypatch.setitem(sys.modules, "clickhouse_driver", fake)
        monkeypatch.setitem(sys.modules, "clickhouse_driver.errors", errs)
        _FakeCHClient.live = []
        from dataflow_spark.sources.clickhouse import ClickHouseConnectionPool

        return ClickHouseConnectionPool("h", 9000, "u", "p", "db", **kw)

    def test_checkout_return_reuses_client(self, monkeypatch):
        pool = self._pool(monkeypatch, min_connections=1, max_connections=2)
        with pool.get_connection() as c1:
            pass
        with pool.get_connection() as c2:
            pass
        assert c1 is c2
        assert pool.get_status()["total_created"] == 1

    def test_close_while_checked_out_disconnects_client(self, monkeypatch):
        """Advisor-reported socket leak: close() drains only the idle
        list, so a client checked out during close() used to be dropped
        on return without disconnect."""
        pool = self._pool(monkeypatch, min_connections=1, max_connections=2)
        with pool.get_connection() as c:
            pool.close()
        assert c.disconnected
        assert all(cl.disconnected for cl in _FakeCHClient.live)

    def test_total_created_counter_matches_instances(self, monkeypatch):
        import threading

        pool = self._pool(monkeypatch, min_connections=0,
                          max_connections=16)

        def work():
            for _ in range(20):
                with pool.get_connection():
                    pass

        ts = [threading.Thread(target=work) for _ in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert pool.get_status()["total_created"] == len(_FakeCHClient.live)
