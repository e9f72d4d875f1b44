from dataflow_spark.streaming.batched import (BatchedRunner,
                                              stream_bloom_dedup,
                                              stream_pipeline)

__all__ = ["BatchedRunner", "stream_bloom_dedup", "stream_pipeline"]
