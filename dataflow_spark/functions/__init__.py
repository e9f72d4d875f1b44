from dataflow_spark.functions import text, vector, hashing  # noqa: F401
