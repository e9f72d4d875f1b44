from dataflow_spark.streaming.batched import BatchedRunner, stream_pipeline

__all__ = ["BatchedRunner", "stream_pipeline"]
