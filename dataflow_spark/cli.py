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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
