"""Dump .explain('formatted') for headline queries to plans/r10/.

Usage: python tools/dump_plans_r10.py before|after [names...]
Writes plans/r10/<query>_<tag>.txt for each headline query (or the
given subset). AQE disabled for stable codegen ids, mirroring
tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from dataflow_spark import get_spark
    from dataflow_spark.plans import formatted_plan

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans",
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    for name in (names or HEADLINE):
        plan = formatted_plan(qs[name](spark, sf_dir))
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
