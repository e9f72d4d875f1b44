"""SnapshotDiffOperator / UpsertLatestOperator + ORC round-trip."""

import pytest

from dataflow_spark.core.registry import get_operator


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        ["doc_id", "text", "score"])
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
        ["doc_id", "text", "score"])
    op = get_operator("SnapshotDiffOperator", {"key": "doc_id"})
    got = {r["doc_id"]: r["change"] for r in op.run(old, new=new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}

    # restricting compare columns hides the text change
    op2 = get_operator("SnapshotDiffOperator", {
        "key": "doc_id", "compare_columns": ["score"]})
    got2 = {r["doc_id"]: r["change"] for r in op2.run(old, new=new).collect()}
    assert got2 == {3: "removed", 4: "added"}

    with pytest.raises(ValueError):
        op.run(old)


def test_snapshot_diff_null_vs_empty(spark):
    # null and '' must fingerprint differently
    old = spark.createDataFrame([(1, None)], "doc_id: long, text: string")
    new = spark.createDataFrame([(1, "")], "doc_id: long, text: string")
    op = get_operator("SnapshotDiffOperator", {"key": "doc_id"})
    assert [r["change"] for r in op.run(old, new=new).collect()] == ["changed"]


def test_upsert_latest(spark):
    base = spark.createDataFrame(
        [(1, "old", 0), (2, "keep", 5), (3, "old", 0)],
        ["doc_id", "text", "version"])
    upd = spark.createDataFrame(
        [(1, "new", 1),      # higher version wins
         (2, "stale", 1),    # lower than base's 5 -> loses
         (3, "tie", 0)],     # equal version -> update wins
        ["doc_id", "text", "version"])
    op = get_operator("UpsertLatestOperator", {"key": "doc_id"})
    got = {r["doc_id"]: (r["text"], r["version"])
           for r in op.run(base, updates=upd).collect()}
    assert got == {1: ("new", 1), 2: ("keep", 5), 3: ("tie", 0)}
    with pytest.raises(ValueError):
        op.run(base)


def test_orc_roundtrip(spark, tmp_path):
    from dataflow_spark.sources.readers import read_any
    from dataflow_spark.sources.writers import write_any

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation.orc")
    write_any(df, out, fmt="orc")
    back = read_any(spark, out, fmt="orc")
    assert sorted(back.collect()) == sorted(df.collect())
