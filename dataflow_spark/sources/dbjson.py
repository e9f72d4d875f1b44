"""MyScale/ClickHouse storage contract: system columns + a ``data`` JSON
string column holding all user fields.

Reference: MyScaleDBStorage packs user fields into a JSON ``data``
column next to system columns (pipeline_id, task_id, raw_data_id, ...)
on write and JSON-expands them back to columns on read
(/root/reference/dataflow/utils/storage.py:845-901, merge rules
``safe_merge`` storage.py:743-747). Spark mapping (SURVEY.md §1.2):
``to_json(struct(*user_cols))`` / ``from_json`` — the actual DB hop is
a JDBC writer/reader configured by the caller; these helpers implement
the column contract so any JDBC-capable store (or a Delta/Parquet table
partitioned by (pipeline_id, task_id)) gets identical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SYSTEM_COLUMNS = [
    "pipeline_id", "task_id", "raw_data_id", "min_hashes", "file_id",
    "filename", "parent_pipeline_id",
]


def pack_data_column(df: DataFrame, pipeline_id: str, task_id: int = 0,
                     data_key: str = "data") -> DataFrame:
    """User columns -> one JSON string column + populated system columns.

    Row identity (`raw_data_id`) follows the reference's running-int
    semantics via a stable zipWithIndex-free monotonically id; pass-through
    system columns already present are preserved.
    """
    user_cols = [c for c in df.columns if c not in SYSTEM_COLUMNS]
    out = df.withColumn(data_key, F.to_json(F.struct(*[F.col(c) for c in user_cols])))
    out = out.drop(*user_cols)
    if "pipeline_id" not in df.columns:
        out = out.withColumn("pipeline_id", F.lit(pipeline_id))
    if "task_id" not in df.columns:
        out = out.withColumn("task_id", F.lit(task_id))
    if "raw_data_id" not in df.columns:
        out = out.withColumn("raw_data_id", F.monotonically_increasing_id())
    return out


def unpack_data_column(df: DataFrame, schema: StructType | None = None,
                       data_key: str = "data") -> DataFrame:
    """JSON ``data`` column -> user columns (reference read path,
    storage.py:845-853).

    ``schema``: target struct; when omitted it is inferred from the data
    (one extra pass — fine for interactive use, pass a schema in
    production plans).
    """
    if schema is None:
        inferred = df.sparkSession.read.json(
            df.select(data_key).rdd.map(lambda r: r[0] or "{}"))
        schema = inferred.schema
    parsed = df.withColumn("_d", F.from_json(F.col(data_key), schema))
    for f in schema.fieldNames():
        parsed = parsed.withColumn(f, F.col("_d." + f))
    return parsed.drop("_d", data_key)
