"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (floats to 1e-9). Queries without an
oracle get a rows-only check (runs, returns >= 0 rows, stable schema).

Both sides are materialized through pandas (Spark ``toPandas()``, DuckDB
``.df()``) and every cell carries a *type-class tag* (int / float / bool /
str / ...) so that value-equal but dtype-different results FAIL, exactly
like the driver's hash canonicalizer: DuckDB ``sum(BIGINT)`` returns
HUGEINT which pandas materializes as float64, and ``130.0`` must not
match Spark's int64 ``130`` (round-9 q_heavy_weighted regression).

Usage:
    python tools/verify_oracle.py [--sf /root/testdata/sf0.001] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Normalize one pandas cell to a (type-tag, value) pair.

    The tag makes the comparison dtype-strict the way the driver's hash
    canonicalizer is: int64 130 != float64 130.0. numpy scalars are
    reduced to their Python equivalents first so np.int64 == int tags
    identically across the Spark/DuckDB pandas paths.
    """
    import numpy as np

    import pandas as pd

    if v is None or v is pd.NA or v is pd.NaT \
            or (isinstance(v, float) and math.isnan(v)) \
            or (isinstance(v, np.floating) and math.isnan(float(v))):
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 9))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(norm_cell(x) for x in v))
    if isinstance(v, str):
        return ("s", v)
    # Decimal, date, datetime, bytes... keep the concrete class in the tag
    # so Decimal('1.5') never matches float 1.5 or str '1.5'.
    return (type(v).__name__, str(v))


def to_rows(pdf):
    """Canonicalize a pandas frame: sort columns by name, tag+sort rows."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = [tuple(norm_cell(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument("--vanilla", action="store_true",
                    help="use a plain SparkSession like the driver harness")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod

    if args.vanilla:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("verify-oracle-vanilla").getOrCreate())
    else:
        from dataflow_spark import get_spark
        spark = get_spark("verify-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written parquet directory (sf1 replica)
            p += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            # The driver's pandas canonicalizer cannot hash array/map/
            # struct cells (TypeError: unhashable type). Fail loudly so
            # this class of contract bug can never re-enter the suite.
            bad = [f.name for f in sdf.schema.fields
                   if f.dataType.typeName() in ("array", "map", "struct")]
            if bad:
                print(f"FAIL  {name}: non-scalar output columns {bad} "
                      "(array/map/struct break the driver canonicalizer; "
                      "stringify with concat_ws/to_json)")
                n_fail += 1
                failures.append(name)
                continue
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        sc, srows = to_rows(spdf)
        dc, drows = to_rows(dpdf)
        ok = True
        msgs = []
        if sc != dc:
            ok = False
            msgs.append(f"schema {sc} != {dc}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount {len(srows)} != {len(drows)}")
        if ok and srows != drows:
            ok = False
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)[:400]}")
            n_fail += 1
            failures.append(name)

    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    if failures:
        print("failures:", ",".join(failures))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
