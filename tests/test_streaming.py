"""Structured Streaming surface: foreachBatch pipeline resume, watermark
windows on a real stream, and applyInPandasWithState keyed state."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.pipeline import Pipeline
from dataflow_spark.core.registry import get_operator
from dataflow_spark.streaming.batched import stream_pipeline, tumbling_counts
from dataflow_spark.streaming.stateful import running_user_stats


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    # stage the events table as a streamable directory with a known schema
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(src.dtypes).get("ts") == "bigint":
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    out = str(tmp_path / "events_in")
    src.write.parquet(out)
    return out


def test_stream_pipeline_foreachbatch(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    pipe = Pipeline([
        get_operator("GeneralFilter", {"predicates": [F.col("value") > 0]}),
    ])
    out_path, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = stream_pipeline(stream, pipe, out_path, chk, trigger_once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out_path).count()
    want = spark.read.parquet(events_dir).filter(F.col("value") > 0).count()
    assert got == want

    # restart with the same checkpoint: no new data -> no duplicate output
    stream2 = spark.readStream.schema(schema).parquet(events_dir)
    q2 = stream_pipeline(stream2, pipe, out_path, chk, trigger_once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == want


def test_tumbling_counts_streaming_matches_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = tumbling_counts(stream, ts_key="ts", window="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win"]["start"], r["n_events"])
           for r in spark.sql("select * from win_counts").collect()}
    batch = tumbling_counts(spark.read.parquet(events_dir), ts_key="ts",
                            window="1 hour")
    want = {(r["win"]["start"], r["n_events"]) for r in batch.collect()}
    assert got == want


def test_running_user_stats_state(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    stats = running_user_stats(stream)
    q = (stats.writeStream.format("memory").queryName("user_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # final state per user must equal the batch aggregate
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
           for r in spark.sql(
               "select * from (select *, row_number() over "
               "(partition by user_id order by n_events desc) rn from user_stats) "
               "where rn = 1").collect()}
    want = {r["user_id"]: (r["n"], round(r["t"], 6))
            for r in spark.read.parquet(events_dir).groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("t")).collect()}
    assert got == want
