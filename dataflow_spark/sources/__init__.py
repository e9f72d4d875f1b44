from dataflow_spark.sources.bucketed import read_bucketed, write_bucketed
from dataflow_spark.sources.readers import read_any, read_table
from dataflow_spark.sources.writers import write_any

__all__ = ["read_any", "read_table", "write_any"]
