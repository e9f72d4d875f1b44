"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution is forced with the noop sink (full computation, no driver
collect overhead) so timings reflect engine work, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
    "q_top_customers", "q_window_rank", "q_rollup_lineitem",
    "q_semi_join_orders", "q_anti_join_customers",
    # events / time
    "q_events_hourly", "q_sessionize", "q_count_distinct_users",
    # text pipeline
    "q_explode_words", "t_quality_score", "t_langid", "t_token_count",
    "t_ngram_ratio",
    # dedup
    "d_exact_hash", "d_ccnet_norm", "d_minhash_lsh", "d_simhash",
    # similarity
    "s_knn_brute", "s_knn_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from dataflow_spark import get_spark

    # local sf files are ~1-10 MB: split smaller than the cluster-default
    # 128 MB so scans engage multiple cores (row-group bounded)
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024))
    spark = get_spark("bench", extra_conf={
        "spark.sql.files.maxPartitionBytes": mpb,
        # keep stdout/stderr clean: the driver records a bounded tail of
        # this process's output and must find exactly one JSON line
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the session: JVM + parquet reader codegen + python UDF workers
    # (not counted — timings measure query work, not session bring-up)
    from pyspark.sql import functions as F

    spark.range(1000).count()
    for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        except Exception:  # warm-up only; queries handle their own reads
            pass
    warm = spark.createDataFrame([("w",)] * 256, ["text"]).repartition(32)

    @F.pandas_udf("long")
    def _wlen(s):
        return s.str.len()

    warm.select(_wlen("text").alias("n")).agg(F.sum("n")).collect()

    # 1 warm-up + n timed runs per query, report the MEDIAN: the
    # warm-up pays one-time Catalyst planning + whole-stage codegen
    # compilation (~1.5s/query), which amortizes to noise on real
    # workloads but would dominate and misrepresent engine throughput
    # at sf0.1 scale; the median (same statistical honesty as the sf1
    # scale check) keeps a single GC/JIT hiccup from reading as a
    # round-over-round plan regression. Raw per-iteration samples and
    # mins land in .bench_last_full.json.
    # failure isolation: one broken query costs one {"err": ...} row,
    # never the whole bench run
    import statistics

    head_iters = max(3, int(os.environ.get("SPARK_GRAFT_HEADLINE_ITERS", "3")))

    def run_one(fn, data_dir: str):
        try:
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(head_iters):
                t0 = time.time()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            return {"med": round(statistics.median(samples), 3),
                    "min": round(min(samples), 3),
                    "samples": [round(s, 3) for s in samples]}
        except Exception as e:  # noqa: BLE001
            return {"err": f"{type(e).__name__}: {str(e)[:160]}"}

    head_stats: dict[str, dict] = {}
    timings: dict[str, object] = {}
    for name in HEADLINE:
        r = run_one(qs[name], sf_dir)
        head_stats[name] = r
        timings[name] = r["med"] if "med" in r else r

    total = round(sum(v for v in timings.values() if isinstance(v, float)), 3)
    result = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        # per-query MEDIAN of head_iters timed runs (stat: see
        # headline_stat key; value = sum of medians)
        "queries": timings,
        "headline_stat": {"stat": "median", "n": head_iters},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # scaling check: the scale-critical subset on a 10x replica of sf0.1
    # (generated once into .bench_data/sf1) — catches O(n^2) regressions
    # while still local. Disable with SPARK_GRAFT_SCALE_CHECK=0.
    # Statistically honest since r5: n>=3 timed iterations per query at
    # BOTH scales, ratio = median(sf1) / median(sf0.1), so a single
    # GC/JIT hiccup can't masquerade as a scaling regression. Any ratio
    # > 3 for 10x data is flagged on the wire for investigation.
    full_scale: dict = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CHECK", "1") == "1":
        import statistics

        from tools.make_scaled_data import ensure_scaled_data

        sf1_dir = ensure_scaled_data(spark, src=sf_dir)
        scale_queries = [
            "q1_pricing_summary", "q5_regional_revenue", "q_events_hourly",
            "q_sessionize", "d_exact_hash", "d_minhash_lsh", "d_simhash",
            "s_knn_lsh", "t_quality_score", "q_pipeline_training_prep",
            "x_decontaminate", "r_segment_dedup", "q_pipeline_corpus_curation",
            "q_rolling_features", "q_cohort_retention",
            "q_kmeans", "q_bm25_topk", "q_global_shuffle",
            "q_funnel", "q_pipeline_code_filter", "r_unicode_nfc",
        ]
        n_iter = max(3, int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "3")))

        def run_n(fn, data_dir: str):
            """1 warm-up + n_iter timed runs; {'med','min'} or {'err'}."""
            try:
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                samples = []
                for _ in range(n_iter):
                    t0 = time.time()
                    fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                    samples.append(time.time() - t0)
                return {"med": round(statistics.median(samples), 3),
                        "min": round(min(samples), 3),
                        "samples": [round(s, 3) for s in samples]}
            except Exception as e:  # noqa: BLE001
                return {"err": f"{type(e).__name__}: {str(e)[:160]}"}

        s_stats = {k: run_n(qs[k], sf1_dir) for k in scale_queries}
        base_stats = {k: run_n(qs[k], sf_dir) for k in scale_queries}
        ratios = {}
        for k in scale_queries:
            s, b = s_stats[k], base_stats[k]
            ok = "med" in s and "med" in b and b["med"] > 0
            ratios[k] = round(s["med"] / b["med"], 2) if ok else None
        flagged = sorted(k for k, r in ratios.items()
                         if r is not None and r > 3.0)
        # compact on the wire: totals + per-query median ratios + flags
        # (raw per-iteration samples land in .bench_last_full.json)
        # key semantics: n = timed iterations per query per scale;
        # value = sum of sf1 per-query MEDIANS; scaleup_ratio =
        # median(sf1)/median(sf0.1); flagged = ratios > 3 for 10x data.
        # Interpreting a flag: on FIXED local cores, 10x data at perfect
        # linear scaling costs 10x time — a ratio in (3, 10) means the
        # query's compute now dominates its fixed per-query overhead
        # (sub-second absolutes at sf0.1 are mostly scheduling/planning),
        # which is healthy; only ratios >= ~10 indicate superlinear work
        # and demand a plan fix. The flags exist so a round-over-round
        # JUMP in a stable median is visible, not because 3x is bad.
        result["scale_check"] = {
            "sf": 1.0, "factor_vs_headline": 10, "n": n_iter,
            "value": round(sum(v["med"] for v in s_stats.values()
                               if "med" in v), 2),
            "scaleup_ratio": ratios,
            "flagged": flagged,
        }
        full_scale = {"sf1_stats": s_stats, "sf01_stats": base_stats}

    # verbose artifact for local debugging (raw sf1 timings, sf0.1
    # bases); untracked — see .gitignore
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_last_full.json"), "w") as fh:
        json.dump({**result, "headline_stats": head_stats, **full_scale},
                  fh, indent=1)

    # the driver keeps only a ~2000-char tail of this process's output and
    # parses the last JSON line — emit exactly ONE compact line (<=1500
    # chars), nothing after it
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1500 and "scale_check" in result:
        # shed the per-query ratios first; keep n / total / flags
        result["scale_check"].pop("scaleup_ratio", None)
        line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1500:
        result.pop("scale_check", None)
        line = json.dumps(result, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
