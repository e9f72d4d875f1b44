"""Isolated floor decomposition for driver scale-check flags (r8).

Policy (ORACLE_SWEEP.md, r7): a BENCH scale_check flag is investigated
— isolated n>=3 rerun at both scales plus a bare-scan floor over the
query's base table — before it is treated as a plan defect. A flag
whose isolated ratio is <= 3.0 (or whose growth is fully explained by
a flat amortized floor) is recorded as measurement noise; only
reproducible flags get plan work.

This generalizes tools/floor_decompose_bm25_decon.py to any set of
contract names. For each query: median-of-n wall at sf0.1 and sf1
(noop write, plans warmed once), plus bare-scan floors for the tables
it reads, printed as one JSON line per name for the ORACLE_SWEEP
record.

Usage:
    python tools/floor_decompose_flags.py \
        [--names q_cohort_retention,q_kmeans,...] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_data", "sf1")

# base table(s) each flagged query scans — for the bare-scan floor
TABLES = {
    "q_cohort_retention": ["events"],
    "q_kmeans": ["embeddings"],
    "q_global_shuffle": ["documents"],
    "q_funnel": ["events"],
    "q_sessionize": ["events"],
    "d_exact_hash": ["documents"],
    "q5_regional_revenue": ["lineitem", "orders", "customer",
                            "supplier", "nation", "region"],
    "q3_shipping_priority": ["lineitem", "orders", "customer"],
    "q_anti_join_customers": ["customer", "orders"],
    "q_semi_join_orders": ["orders", "lineitem"],
    "d_minhash_lsh": ["documents"],
    "d_simhash": ["documents"],
    "q_events_hourly": ["events"],
}
DEFAULT = ",".join(TABLES)


def timed(df, n: int) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm plan+JIT
    ts = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=DEFAULT)
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()
    names = [s for s in args.names.split(",") if s]

    import __spark_entry__ as em
    from dataflow_spark import get_spark

    spark = get_spark("floor-flags", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    floors: dict[tuple[str, str], float] = {}
    for sf_name, sf in (("sf0.1", SF01), ("sf1", SF1)):
        for t in sorted({t for nm in names for t in TABLES.get(nm, [])}):
            df = spark.read.parquet(os.path.join(sf, f"{t}.parquet"))
            floors[(sf_name, t)] = timed(df.selectExpr("*"), args.n)

    for nm in names:
        if nm not in qs:
            print(json.dumps({"name": nm, "err": "unknown query"}))
            continue
        t01 = timed(qs[nm](spark, SF01), args.n)
        t1 = timed(qs[nm](spark, SF1), args.n)
        fl = {f"floor_{sf}_{t}": floors[(sf, t)]
              for sf in ("sf0.1", "sf1") for t in TABLES.get(nm, [])}
        ratio = round(t1 / t01, 2) if t01 else None
        # ratio above the amortized floor: subtract the bare-scan floor
        # from both numerators (growth attributable to the query's own
        # work, not to fixed stage/scan overhead)
        f01 = sum(floors[("sf0.1", t)] for t in TABLES.get(nm, []))
        f1 = sum(floors[("sf1", t)] for t in TABLES.get(nm, []))
        over = (round((t1 - f1) / (t01 - f01), 2)
                if (t01 - f01) > 0.05 else None)
        print(json.dumps({
            "name": nm, "sf0.1": t01, "sf1": t1, "ratio": ratio,
            "ratio_over_floor": over, **fl,
            "verdict": ("noise" if ratio is not None and ratio <= 3.0
                        else "investigate")}))
    spark.stop()


if __name__ == "__main__":
    main()
