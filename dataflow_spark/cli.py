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


def cmd_prompts(args: argparse.Namespace) -> int:
    from dataflow_spark.prompts import PROMPT_REGISTRY

    names = sorted(PROMPT_REGISTRY.keys())
    if args.grep:
        names = [n for n in names if args.grep.lower() in n.lower()]
    for n in names:
        if args.desc:
            print(f"{n}: {PROMPT_REGISTRY.get(n).get_desc()}")
        else:
            print(n)
    print(f"-- {len(names)} prompt templates", file=sys.stderr)
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
    # aggregated result: 1 row, or one per group. Stream partitions to
    # the driver (toLocalIterator = one partition in memory at a time)
    # and cap the materialized group list — an unbounded collect() here
    # would OOM the driver if group_key were high-cardinality.
    limit = args.limit
    rows = []
    for r in op.run(df).toLocalIterator():
        rows.append(r.asDict())
        if len(rows) > limit:
            print(f"warning: more than --limit={limit} groups; result "
                  "truncated — raise --limit or aggregate coarser",
                  file=sys.stderr)
            rows = rows[:limit]
            break
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


def _webui_builder_html() -> str:
    """Interactive pipeline builder (reference webui/operator_pipeline.py
    assembles operator chains drag-drop in Gradio; this is the same
    loop — pick operators, set args, validate key flow — as a
    zero-dependency HTML page over the /ops and /compile APIs)."""
    return """<!doctype html><html><head><meta charset="utf-8">
<title>dataflow_spark pipeline builder</title><style>
body{font-family:sans-serif;margin:2em;max-width:70em}
table{border-collapse:collapse}td,th{border:1px solid #999;padding:4px 8px}
textarea,input{font-family:monospace}#out{white-space:pre-wrap;
background:#f4f4f4;padding:1em;border:1px solid #ccc}</style></head><body>
<h1>pipeline builder</h1>
<p>source columns (comma-separated):
<input id="cols" size="60" value="text,doc_id"></p>
<p>operator: <select id="op"></select>
args (JSON): <input id="args" size="40" value="{}">
<button onclick="addStep()">add step</button></p>
<table id="steps"><tr><th>#</th><th>operator</th><th>args</th><th></th></tr>
</table>
<p><button onclick="compile()">validate pipeline</button></p>
<div id="out"></div>
<script>
let steps=[];
fetch('/ops').then(r=>r.json()).then(d=>{
  const sel=document.getElementById('op');
  Object.keys(d).sort().forEach(n=>{
    const o=document.createElement('option');o.value=o.textContent=n;
    sel.appendChild(o);});});
function render(){
  const t=document.getElementById('steps');
  t.innerHTML='<tr><th>#</th><th>operator</th><th>args</th><th></th></tr>';
  steps.forEach((s,i)=>{const r=t.insertRow();
    r.insertCell().textContent=i;
    r.insertCell().textContent=s.op;
    r.insertCell().textContent=JSON.stringify(s.args);
    const b=document.createElement('button');b.textContent='x';
    b.onclick=()=>{steps.splice(i,1);render();};
    r.insertCell().appendChild(b);});}
function addStep(){
  let a;try{a=JSON.parse(document.getElementById('args').value)}
  catch(e){alert('args must be JSON');return}
  steps.push({op:document.getElementById('op').value,args:a});render();}
function compile(){
  const cols=document.getElementById('cols').value
    .split(',').map(s=>s.trim()).filter(Boolean);
  fetch('/compile',{method:'POST',
    body:JSON.stringify({source_columns:cols,steps:steps})})
  .then(r=>r.json())
  .then(d=>{document.getElementById('out').textContent=
    JSON.stringify(d,null,2);});}
</script></body></html>"""


def compile_pipeline_spec(spec: dict) -> dict:
    """Pipeline-builder backend (reference webui/operator_pipeline.py:
    48-130 assembles operator chains in Gradio; this is the same
    capability as a JSON API).

    spec = {"source_columns": [...],
            "steps": [{"op": name, "args": {...}}, ...]}
    Returns {"ok": true, "nodes": [...], "dot": "..."} or
    {"ok": false, "error": "..."} with per-step diagnostics.
    """
    from dataflow_spark.core.pipeline import Pipeline, PipelineKeyError
    from dataflow_spark.core.registry import get_operator

    try:
        steps = [get_operator(s["op"], s.get("args") or {})
                 for s in spec.get("steps", [])]
        pipe = Pipeline(steps)
        nodes = pipe.compile(list(spec.get("source_columns") or []))
        return {"ok": True, "nodes": nodes, "dot": pipe.graph()}
    except PipelineKeyError as e:
        return {"ok": False, "error": str(e), "kind": "key_validation"}
    except Exception as e:  # noqa: BLE001 — surface builder errors as data
        return {"ok": False, "error": f"{type(e).__name__}: {e}",
                "kind": "construction"}


def cmd_webui(args: argparse.Namespace) -> int:
    """Registry browser + pipeline-builder API (reference webui/ is a
    Gradio app over the same two surfaces: registry introspection and
    operator-chain assembly/validation).

    GET  /          operator table (HTML)
    GET  /builder   interactive pipeline builder (HTML+JS over the APIs)
    GET  /ops       registry descriptions (JSON)
    GET  /pipelines ready-made pipeline builders (JSON)
    POST /compile   pipeline spec -> key validation + DOT graph (JSON)
    """
    import inspect
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import dataflow_spark  # noqa: F401
    from dataflow_spark import pipelines as pl
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    index = _webui_index_html().encode()
    builder_page = _webui_builder_html().encode()
    ops = json.dumps(OPERATOR_REGISTRY.describe()).encode()
    pipes = json.dumps({
        name: {"signature": str(inspect.signature(fn)),
               "doc": (fn.__doc__ or "").strip().split("\n")[0]}
        for name, fn in sorted(pl.PIPELINES.items())}).encode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib contract
            routes = {"/ops": (ops, "application/json"),
                      "/pipelines": (pipes, "application/json"),
                      "/builder": (builder_page, "text/html")}
            body, ctype = index, "text/html"
            for prefix, hit in routes.items():
                if self.path.startswith(prefix):
                    body, ctype = hit
                    break
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 — stdlib contract
            if not self.path.startswith("/compile"):
                self.send_response(404)
                self.end_headers()
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                spec = json.loads(self.rfile.read(n) or b"{}")
                result = compile_pipeline_spec(spec)
            except Exception as e:  # noqa: BLE001
                result = {"ok": False, "error": str(e), "kind": "request"}
            body = json.dumps(result).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
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


def _prepare_sft_dataset(spark, df, text_key: str, output: str,
                         serving=None) -> int:
    """Shared text2model/pdf2model data stage: clean -> filter -> dedup
    -> chunk -> QA-generate -> SFT-format jsonl. Returns row count."""
    from dataflow_spark.core.registry import get_operator
    from dataflow_spark.serving import MockLLMServing

    # default serving is the deterministic mock (no model weights in this
    # container); a real OpenAI-compatible LLMServing slots in unchanged
    serving = serving or MockLLMServing(
        mode="template",
        template="Q: What does this passage say? A: {prompt:.120s}")
    from pyspark.sql import functions as F

    pipe_ops = [
        get_operator("RemoveExtraSpacesRefiner", {"input_key": text_key}),
        get_operator("ContentNullFilter", {"input_key": text_key}),
        get_operator("WordNumberFilter", {"input_key": text_key,
                                          "min_words": 5}),
        get_operator("HashDeduplicateFilter", {"input_keys": text_key}),
        get_operator("ChunkGenerator", {"input_key": text_key,
                                        "chunk_size": 2000}),
        get_operator("Text2QAGenerator", {
            "serving": serving, "input_key": "chunk",
            "prompt_template": "Generate QA pairs for:\n{chunk}"}),
    ]
    out = df
    for op in pipe_ops:
        out = op.run(out)
    sft = out.select(
        F.col("question").alias("instruction"),
        F.col("answer").alias("output"))
    import json as _json

    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    # stream to the single user-named jsonl file: toLocalIterator pulls
    # one partition at a time, so driver memory stays bounded no matter
    # how large the generated SFT set is (the old collect() was a
    # scale-killer on a real corpus)
    n = 0
    with open(output, "w") as f:
        for r in sft.toLocalIterator():
            f.write(_json.dumps(r.asDict(), default=str) + "\n")
            n += 1
    return n


def cmd_text2model(args: argparse.Namespace) -> int:
    """Data stage of the reference's text2model flow (cli.py:386-408):
    raw text -> cleaned/deduped/chunked -> QA pairs -> SFT jsonl. The
    train step hands off to an external trainer (the reference shells
    out to LlamaFactory — model training is outside the data engine)."""
    if args.action == "train":
        try:
            import llamafactory  # noqa: F401  # pragma: no cover
        except ImportError:
            print("training backends (LlamaFactory) are not bundled with the "
                  "data engine; run `text2model prepare` to produce the SFT "
                  "dataset, then point your trainer at it", file=sys.stderr)
            return 1
    from dataflow_spark import get_spark
    from dataflow_spark.sources.readers import read_any

    spark = get_spark("text2model")
    spark.sparkContext.setLogLevel("ERROR")
    df = read_any(spark, args.input)
    n = _prepare_sft_dataset(spark, df, args.text_key, args.output)
    print(f"wrote {n} SFT rows to {args.output}")
    return 0


def cmd_pdf2model(args: argparse.Namespace) -> int:
    """Data stage of the reference's pdf2model/kbc flow (cli.py:326-383):
    pdf/html/markdown files -> markdown -> cleaned/chunked -> QA pairs ->
    SFT jsonl. PDF parsing needs the pdf_converter seam (no PDF library
    bundled) — such rows are skipped with a warning."""
    if args.action == "train":
        try:
            import llamafactory  # noqa: F401  # pragma: no cover
        except ImportError:
            print("training backends are not bundled; run `pdf2model prepare` "
                  "then point your trainer at the SFT dataset", file=sys.stderr)
            return 1
    import glob as globmod

    from pyspark.sql import functions as F

    from dataflow_spark import get_spark
    from dataflow_spark.core.registry import get_operator

    spark = get_spark("pdf2model")
    spark.sparkContext.setLogLevel("ERROR")
    files = sorted(
        p for pat in ("*.pdf", "*.md", "*.markdown", "*.html", "*.htm", "*.txt")
        for p in globmod.glob(os.path.join(args.input, pat)))
    if not files:
        print(f"no convertible files under {args.input}", file=sys.stderr)
        return 1
    src = spark.createDataFrame([(p,) for p in files], ["source"])
    conv = get_operator("FileOrURLToMarkdownConverterLocal", {
        "intermediate_dir": os.path.join(args.cache, "intermediate")}).run(src)
    conv = conv.cache()
    n_failed = conv.filter(F.col("text_path") == "").count()
    if n_failed:
        print(f"warning: {n_failed} file(s) not converted (PDF needs a "
              "pdf_converter backend)", file=sys.stderr)
    ok = conv.filter(F.col("text_path") != "")

    # read markdown executor-side (shared FS contract, same as converter)
    def read_md(batches):
        for b in batches:
            b = b.copy()
            b["text"] = [open(p, encoding="utf-8", errors="replace").read()
                         for p in b["text_path"]]
            yield b[["source", "text_path", "text"]]

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("source", StringType()),
                         StructField("text_path", StringType()),
                         StructField("text", StringType())])
    md = ok.select("source", "text_path").mapInPandas(
        lambda it: read_md(it), schema=schema)
    cleaned = get_operator("KBCTextCleaner", {"input_key": "text"}).run(md)
    n = _prepare_sft_dataset(spark, cleaned, "text", args.output)
    print(f"wrote {n} SFT rows to {args.output}")
    return 0


def cmd_pipeline(args: argparse.Namespace) -> int:
    """Run a ready-made pipeline from dataflow_spark.pipelines on an
    input file (the reference user's statics/pipelines entry points)."""
    import inspect

    from dataflow_spark import get_spark
    from dataflow_spark import pipelines as pl
    from dataflow_spark.serving import MockLLMServing
    from dataflow_spark.sources.readers import read_any
    from dataflow_spark.sources.writers import write_any

    if args.name not in pl.PIPELINES:
        print(f"unknown pipeline {args.name!r}; available: "
              f"{', '.join(sorted(pl.PIPELINES))}", file=sys.stderr)
        return 1
    builder = pl.PIPELINES[args.name]
    params = inspect.signature(builder).parameters
    kwargs = {}
    if "serving" in params:
        # mock serving keeps the pipeline runnable offline; a real
        # OpenAI-compatible LLMServing slots in programmatically
        kwargs["serving"] = MockLLMServing(mode="hash")
    missing = [n for n, p in params.items()
               if p.default is inspect.Parameter.empty and n not in kwargs]
    if missing:
        print(f"pipeline {args.name!r} needs arguments {missing} — "
              "build it programmatically via dataflow_spark.pipelines",
              file=sys.stderr)
        return 1
    pipe = builder(**kwargs) if kwargs else builder()
    spark = get_spark(f"pipeline-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    out = pipe.forward(read_any(spark, args.input))
    if args.output:
        write_any(out, args.output)
        print(f"wrote {args.output}")
    else:
        print(f"{out.count()} rows, columns: {out.columns}")
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

    sp = sub.add_parser("prompts", help="list registered prompt templates")
    sp.add_argument("--grep", default=None)
    sp.add_argument("--desc", action="store_true")
    sp.set_defaults(fn=cmd_prompts)

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
    sp.add_argument("--limit", type=int, default=100_000,
                    help="max per-group rows materialized on the driver")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("webui", help="serve the operator registry browser")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7862)
    sp.set_defaults(fn=cmd_webui)

    sp = sub.add_parser("pipeline", help="run a ready-made pipeline")
    sp.add_argument("name")
    sp.add_argument("input")
    sp.add_argument("--output", default=None)
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("text2model",
                        help="text -> SFT dataset (train hands off)")
    sp.add_argument("action", choices=["prepare", "train"])
    sp.add_argument("input", help="text file (.jsonl/.json/.csv/.parquet)")
    sp.add_argument("--text-key", default="text")
    sp.add_argument("--output", default="sft_dataset.jsonl")
    sp.set_defaults(fn=cmd_text2model)

    sp = sub.add_parser("pdf2model",
                        help="pdf/markdown dir -> SFT dataset (train hands off)")
    sp.add_argument("action", choices=["prepare", "train"])
    sp.add_argument("input", help="directory of pdf/md/html files")
    sp.add_argument("--cache", default=".cache")
    sp.add_argument("--output", default="sft_dataset.jsonl")
    sp.set_defaults(fn=cmd_pdf2model)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
