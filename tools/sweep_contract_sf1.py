"""Full-contract scale sweep: every queries() entry vs its DuckDB twin
at the sf1 replica (10x the bench headline scale).

Same compare as tools/verify_oracle.py (row count + schema +
order-insensitive values, floats to 1e-9), plus what a 10x sweep needs:

- a per-query watchdog on the DuckDB side (``con.interrupt()`` from a
  timer thread) so one oracle whose SQL twin is super-linear at sf1
  (e.g. a quadratic recursion) cannot wedge the whole sweep — it is
  recorded as ORACLE-TIMEOUT, distinct from a FAIL;
- a per-query watchdog on the Spark side (cancelJobGroup) recorded as
  ENGINE-TIMEOUT;
- JSONL output (one line per query) so a killed run keeps its partial
  results and a re-run with --resume skips recorded names.

Usage:
    python tools/sweep_contract_sf1.py [--sf .bench_data/sf1]
        [--only a,b] [--oracle-timeout 300] [--engine-timeout 600]
        [--out SWEEP_SF1.jsonl] [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_oracle import TABLES, to_rows  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".bench_data/sf1")
    ap.add_argument("--only", default="")
    ap.add_argument("--oracle-timeout", type=float, default=300.0)
    ap.add_argument("--engine-timeout", type=float, default=600.0)
    ap.add_argument("--out", default="/tmp/sweep_sf1.jsonl")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    done: set[str] = set()
    if args.resume and os.path.exists(args.out):
        with open(args.out) as fh:
            done = {json.loads(line)["name"] for line in fh if line.strip()}

    spark = get_spark("sweep-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_sweep_sf1'")
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    out = open(args.out, "a")

    def record(name, status, detail="", secs=None):
        row = {"name": name, "status": status, "detail": detail[:300]}
        if secs is not None:
            row["sec"] = round(secs, 1)
        out.write(json.dumps(row) + "\n")
        out.flush()
        print(f"{status:>14}  {name}"
              + (f" ({row['sec']}s)" if secs is not None else "")
              + (f": {row['detail']}" if detail else ""), flush=True)

    for name, fn in qs.items():
        if (only and name not in only) or name in done:
            continue
        t0 = time.time()
        # ---- engine side, with a cancel watchdog ----
        sc.setJobGroup(name, name, interruptOnCancel=True)
        timer = threading.Timer(args.engine_timeout,
                                lambda: sc.cancelJobGroup(name))
        timer.start()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srec = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            timer.cancel()
            timed_out = time.time() - t0 >= args.engine_timeout - 1
            record(name, "ENGINE-TIMEOUT" if timed_out else "ENGINE-FAIL",
                   str(e), time.time() - t0)
            continue
        timer.cancel()
        t_engine = time.time() - t0
        if name not in oracles:
            record(name, "rows-only", f"{len(srec)} rows", t_engine)
            continue
        # ---- oracle side, with an interrupt watchdog ----
        t1 = time.time()
        timer = threading.Timer(args.oracle_timeout, con.interrupt)
        timer.start()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drec = res.fetchall()
        except Exception as e:  # noqa: BLE001
            timer.cancel()
            timed_out = time.time() - t1 >= args.oracle_timeout - 1
            record(name, "ORACLE-TIMEOUT" if timed_out else "ORACLE-FAIL",
                   str(e), time.time() - t1)
            continue
        timer.cancel()
        sc_, srows = to_rows(scols, srec)
        dc_, drows = to_rows(dcols, drec)
        msgs = []
        if sc_ != dc_:
            msgs.append(f"schema {sc_} != {dc_}")
        elif len(srows) != len(drows):
            msgs.append(f"rowcount {len(srows)} != {len(drows)}")
        elif srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
            msgs.append(f"values differ: {diff}")
        if msgs:
            record(name, "FAIL", "; ".join(msgs), time.time() - t0)
        else:
            record(name, "PASS", f"{len(srows)} rows", time.time() - t0)

    out.close()
    spark.stop()


if __name__ == "__main__":
    main()
