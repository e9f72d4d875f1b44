"""Format readers/writers and the streaming-batch runner."""

from pyspark.sql import functions as F

from dataflow_spark.sources.readers import read_any
from dataflow_spark.sources.writers import write_any


def test_roundtrip_formats(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", 0.5), (2, "world", 1.5)], ["i", "text", "score"])
    for fmt, ext in [("parquet", "parquet"), ("json", "jsonl"), ("csv", "csv")]:
        path = str(tmp_path / f"out_{fmt}")
        write_any(df, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt)
        if fmt == "csv":
            back = back.select(F.col("i").cast("long"), "text",
                               F.col("score").cast("double"))
        got = sorted(tuple(r) for r in back.select("i", "text", "score").collect())
        assert got == [(1, "hello", 0.5), (2, "world", 1.5)], fmt


def test_read_any_by_extension(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["i", "s"])
    p = str(tmp_path / "data.parquet")
    df.write.parquet(p)
    assert read_any(spark, p).count() == 1


def test_pickle_write_read_roundtrip(spark, tmp_path):
    from dataflow_spark.sources.readers import read_any
    from dataflow_spark.sources.writers import write_any

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    p = str(tmp_path / "export.pkl")
    write_any(df, p)
    back = read_any(spark, p)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_xlsx_write_gated(spark, tmp_path):
    import pytest

    from dataflow_spark.sources.writers import write_xlsx

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="openpyxl"):
            write_xlsx(df, str(tmp_path / "x.xlsx"))
    else:
        write_xlsx(df, str(tmp_path / "x.xlsx"))
        assert (tmp_path / "x.xlsx").exists()
