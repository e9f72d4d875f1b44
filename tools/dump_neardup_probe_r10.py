"""Dump the near-dup CC edge-probe plan (the eager build-phase query).

The returned survivors frame of d_minhash_lsh is just scan+join — the
interesting plan (signature pass, collapse window, banding, verify) is
the edges frame the connected-components probe executes. This wraps
``connected_components`` to capture that frame's formatted plan at call
time, so the dump is the real executed shape, not a reconstruction.

Usage: python tools/dump_neardup_probe_r10.py <tag> [repo_root] [query]
Writes plans/r10/neardup_probe_<tag>.txt (always into THIS repo's
plans/r10, even when dumping from another checkout). ``query`` defaults
to d_minhash_lsh; e.g. pass d_simhash with a tag like simhash_after.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(os.path.dirname(HERE), "plans", "r10")


def main() -> None:
    tag = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(HERE)
    sys.path.insert(0, root)
    os.chdir(root)

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark
    from dataflow_spark.operators.filters import dedup as D
    from dataflow_spark.plans import formatted_plan

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-probe",
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    captured: list[str] = []
    orig = D.connected_components

    def capture(edges, *a, **kw):
        captured.append(formatted_plan(edges))
        return orig(edges, *a, **kw)

    query = sys.argv[3] if len(sys.argv) > 3 else "d_minhash_lsh"
    D.connected_components = capture
    try:
        qs = entrymod.queries()
        qs[query](spark, sf_dir)
    finally:
        D.connected_components = orig

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"neardup_probe_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(captured[0])
    print(f"wrote {path} ({len(captured[0])} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
