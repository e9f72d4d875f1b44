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

    # two runs per query, report the second: the first pays one-time
    # Catalyst planning + whole-stage codegen compilation (~1.5s/query),
    # which amortizes to noise on real workloads but would dominate and
    # misrepresent engine throughput at sf0.1 scale
    # failure isolation: one broken query costs one {"err": ...} row,
    # never the whole bench run
    def run_one(fn, data_dir: str):
        try:
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            return {"err": f"{type(e).__name__}: {str(e)[:160]}"}

    timings: dict[str, object] = {}
    for name in HEADLINE:
        timings[name] = run_one(qs[name], sf_dir)

    total = round(sum(v for v in timings.values() if isinstance(v, float)), 3)
    result = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # scaling check: the scale-critical subset on a 10x replica of sf0.1
    # (generated once into .bench_data/sf1) — catches O(n^2) regressions
    # while still local. Disable with SPARK_GRAFT_SCALE_CHECK=0.
    full_scale: dict = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CHECK", "1") == "1":
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
        s_timings: dict[str, object] = {}
        for name in scale_queries:
            s_timings[name] = run_one(qs[name], sf1_dir)
        # scale-only queries (not in HEADLINE) get a dedicated sf0.1 base
        # run so their scaleup ratio is still meaningful
        base: dict[str, object] = {}
        for k in scale_queries:
            b = timings.get(k)
            if not isinstance(b, float):
                b = run_one(qs[k], sf_dir)
            base[k] = b if isinstance(b, float) else None
        # compact on the wire: total sf1 seconds + per-query 10x-data
        # scale-up ratios (raw sf1 timings land in .bench_last_full.json)
        result["scale_check"] = {
            "sf": 1.0, "factor_vs_headline": 10,
            "value": round(sum(v for v in s_timings.values()
                               if isinstance(v, float)), 2),
            "scaleup_ratio": {
                k: round(s_timings[k] / base[k], 2)
                if isinstance(s_timings[k], float)
                and isinstance(base[k], float) and base[k] > 0 else None
                for k in scale_queries},
        }
        full_scale = {"sf1_queries": s_timings, "sf01_base": base}

    # verbose artifact for local debugging (raw sf1 timings, sf0.1
    # bases); untracked — see .gitignore
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_last_full.json"), "w") as fh:
        json.dump({**result, **full_scale}, fh, indent=1)

    # the driver keeps only a ~2000-char tail of this process's output and
    # parses the last JSON line — emit exactly ONE compact line (<=1500
    # chars), nothing after it
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1500:
        result.pop("scale_check", None)
        line = json.dumps(result, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
