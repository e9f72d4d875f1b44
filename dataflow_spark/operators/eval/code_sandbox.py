"""Sandboxed code execution scorer.

Reference: CodeSandboxSampleEvaluator + PythonExecutor persistent worker
pool (code/eval/python_executor.py:1-674). Spark shape: mapInPandas with
a per-task subprocess per snippet, hard wall-clock timeout, captured
pass/fail + error class — the reference's strict timeout semantics with
executor-side parallelism instead of a driver pool.

Security note: runs ONLY user-supplied pipeline data through an
interpreter subprocess with -I (isolated mode), cwd=tmp, and a kill
timeout; intended for scoring generated code in controlled pipelines,
same threat model as the reference.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class CodeSandboxSampleEvaluator(Operator):
    def __init__(self, input_key: str = "code", timeout_s: float = 5.0,
                 ok_key: str = "exec_ok", err_key: str = "exec_error"):
        self.input_key = input_key
        self.timeout_s = timeout_s
        self.ok_key, self.err_key = ok_key, err_key
        self.input_keys = (input_key,)
        self.output_keys = (ok_key, err_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        schema = StructType(df.schema.fields + [
            StructField(self.ok_key, BooleanType()),
            StructField(self.err_key, StringType()),
        ])
        key, timeout = self.input_key, self.timeout_s
        ok_key, err_key = self.ok_key, self.err_key

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tmpdir = tempfile.mkdtemp(prefix="dfspark_sandbox_")
            for pdf in batches:
                oks, errs = [], []
                for code in pdf[key]:
                    if not code or not code.strip():
                        oks.append(False)
                        errs.append("empty")
                        continue
                    try:
                        proc = subprocess.run(
                            [sys.executable, "-I", "-c", code],
                            capture_output=True, text=True,
                            timeout=timeout, cwd=tmpdir,
                        )
                        if proc.returncode == 0:
                            oks.append(True)
                            errs.append(None)
                        else:
                            oks.append(False)
                            tail = (proc.stderr or "").strip().splitlines()
                            errs.append(tail[-1][:200] if tail else f"exit {proc.returncode}")
                    except subprocess.TimeoutExpired:
                        oks.append(False)
                        errs.append("timeout")
                pdf = pdf.copy()
                pdf[ok_key] = oks
                pdf[err_key] = errs
                yield pdf

        return df.mapInPandas(gen, schema=schema)


@OPERATOR_REGISTRY.register()
class CodeSandboxFilter(Operator):
    """Evaluator + predicate composition: keep rows whose code executes."""

    def __init__(self, input_key: str = "code", timeout_s: float = 5.0):
        self.evaluator = CodeSandboxSampleEvaluator(input_key, timeout_s)
        self.input_keys = (input_key,)
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = self.evaluator.run(df)
        return out.filter(F.col(self.evaluator.ok_key)).drop(
            self.evaluator.ok_key, self.evaluator.err_key)
