"""``python -m dataflow_spark.cli`` — reference-parity CLI verbs.

Reference: the Typer app (/root/reference/dataflow/cli.py:19-24) with
``init`` (scaffold a pipeline), ``env`` (diagnostics), plus registry
introspection used by the WebUI. Ours uses stdlib argparse (no extra
dependency) and adds ``ops``/``desc``/``run``.
"""

from __future__ import annotations

import argparse
import os
import sys

SCAFFOLD = '''"""Scaffolded dataflow_spark pipeline (edit me)."""

from dataflow_spark import get_spark, Pipeline, get_operator

spark = get_spark("my-pipeline")

df = spark.read.parquet("INPUT_PATH")
pipe = Pipeline([
    get_operator("RemoveExtraSpacesRefiner", {"input_key": "text"}),
    get_operator("WordNumberFilter", {"input_key": "text", "min_words": 5}),
    get_operator("HashDeduplicateFilter", {"input_keys": "text"}),
])
pipe.compile(df.columns)  # key-flow validation before any job runs
out = pipe.forward(df)
out.write.mode("overwrite").parquet("OUTPUT_PATH")
'''


def cmd_init(args: argparse.Namespace) -> int:
    path = os.path.join(args.dir, "pipeline.py")
    if os.path.exists(path) and not args.force:
        print(f"refusing to overwrite {path} (use --force)", file=sys.stderr)
        return 1
    os.makedirs(args.dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(SCAFFOLD)
    print(f"wrote {path}")
    return 0


def cmd_env(args: argparse.Namespace) -> int:
    import pyspark

    print(f"python     {sys.version.split()[0]}")
    print(f"pyspark    {pyspark.__version__}")
    print(f"JAVA_HOME  {os.environ.get('JAVA_HOME', '(unset)')}")
    for mod in ["pandas", "numpy", "pyarrow", "duckdb"]:
        try:
            m = __import__(mod)
            print(f"{mod:<10} {m.__version__}")
        except ImportError:
            print(f"{mod:<10} MISSING")
    return 0


def cmd_ops(args: argparse.Namespace) -> int:
    import dataflow_spark  # noqa: F401 — registers operators
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    names = sorted(OPERATOR_REGISTRY.keys())
    if args.grep:
        names = [n for n in names if args.grep.lower() in n.lower()]
    for n in names:
        print(n)
    print(f"-- {len(names)} operators", file=sys.stderr)
    return 0


def cmd_desc(args: argparse.Namespace) -> int:
    import dataflow_spark  # noqa: F401
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    cls = OPERATOR_REGISTRY.get(args.name)
    print(f"{args.name}: {cls.get_desc()}")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    import runpy

    runpy.run_path(args.script, run_name="__main__")
    return 0


def _read_any(spark, path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext in (".json", ".jsonl"):
        return spark.read.json(path)
    if ext == ".csv":
        return spark.read.option("header", "true").option(
            "inferSchema", "true").csv(path)
    raise ValueError(f"unsupported input extension: {ext}")


def cmd_eval(args: argparse.Namespace) -> int:
    """Benchmark-accuracy evaluation (reference:
    cli_funcs/cli_eval.py:32-464 — its answer-generation stage needs GPU
    model serving; the evaluation stage over an answers file is this
    verb, built on UnifiedBenchDatasetEvaluator)."""
    import json

    from dataflow_spark import get_spark
    from dataflow_spark.core.registry import get_operator

    spark = get_spark("dataflow-eval")
    spark.sparkContext.setLogLevel("ERROR")
    df = _read_any(spark, args.input)
    op = get_operator("UnifiedBenchDatasetEvaluator", {
        "answer_key": args.answer_key, "gt_key": args.gt_key,
        "match_mode": args.match_mode, "group_key": args.group_key})
    rows = [r.asDict() for r in op.run(df).collect()]
    result = {
        "bench": args.bench_name or os.path.basename(args.input),
        "input_file": args.input,
        "match_mode": args.match_mode,
        "answer_key": args.answer_key,
        "gt_key": args.gt_key,
    }
    if args.group_key:
        result["groups"] = rows
    else:
        result.update(rows[0])
    out_path = args.output
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, default=str)
    print(json.dumps(result, default=str))
    print(f"wrote {out_path}", file=sys.stderr)
    return 0


def _webui_index_html() -> str:
    import dataflow_spark  # noqa: F401 — registers operators
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    rows = "".join(
        f"<tr><td><code>{name}</code></td><td>{cls.get_desc()}</td></tr>"
        for name, cls in OPERATOR_REGISTRY.items())
    return ("<html><head><title>dataflow_spark operators</title></head>"
            "<body><h1>dataflow_spark operator registry</h1>"
            f"<table border=1>{rows}</table></body></html>")


def cmd_webui(args: argparse.Namespace) -> int:
    """Minimal registry browser (reference webui/ is a Gradio app over
    the same introspection surface: registry names + get_desc)."""
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import dataflow_spark  # noqa: F401
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    index = _webui_index_html().encode()
    ops = json.dumps(OPERATOR_REGISTRY.describe()).encode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib contract
            body, ctype = ((ops, "application/json")
                           if self.path.startswith("/ops")
                           else (index, "text/html"))
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer((args.host, args.port), Handler)
    print(f"serving operator registry on http://{args.host}:{args.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dataflow-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init", help="scaffold a pipeline script")
    sp.add_argument("dir", nargs="?", default=".")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("env", help="environment diagnostics")
    sp.set_defaults(fn=cmd_env)

    sp = sub.add_parser("ops", help="list registered operators")
    sp.add_argument("--grep", default=None)
    sp.set_defaults(fn=cmd_ops)

    sp = sub.add_parser("desc", help="describe one operator")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_desc)

    sp = sub.add_parser("run", help="execute a pipeline script")
    sp.add_argument("script")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("eval", help="benchmark accuracy over an answers file")
    sp.add_argument("input", help="answers file (.parquet/.json/.jsonl/.csv)")
    sp.add_argument("--answer-key", default="answer")
    sp.add_argument("--gt-key", default="gold")
    sp.add_argument("--match-mode", default="exact",
                    choices=["exact", "contains", "numeric"])
    sp.add_argument("--group-key", default=None)
    sp.add_argument("--bench-name", default=None)
    sp.add_argument("--output", default="eval_results/accuracy.json")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("webui", help="serve the operator registry browser")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7862)
    sp.set_defaults(fn=cmd_webui)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
