"""dataflow_spark — a PySpark-native analytics/data-prep engine.

A brand-new engine with the query and data-processing capabilities of
OpenDCAI/DataFlow (operator-based LLM data preparation), re-expressed
Spark-first: operators declare lazy DataFrame transformations, Catalyst
optimizes, and execution is distributed by partitioning rather than the
reference's single-node pandas loop (see SURVEY.md for the mapping).

Public surface:
    from dataflow_spark import get_spark, Pipeline, StepStore
    from dataflow_spark.core import OPERATOR_REGISTRY, Operator
"""

from dataflow_spark.session import get_spark
from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY, get_operator
from dataflow_spark.core.pipeline import Pipeline
from dataflow_spark.core.storage import StepStore

# Importing the operators package registers every operator; core modules
# above must already be loaded (operators import from core).
from dataflow_spark import operators as _operators  # noqa: E402,F401
# Importing the prompts package registers the 98 named prompt classes.
from dataflow_spark.prompts import PROMPT_REGISTRY, get_prompt  # noqa: E402
from dataflow_spark.plans import audit, assert_scalable, PlanScaleError  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Operator",
    "OPERATOR_REGISTRY",
    "get_operator",
    "PROMPT_REGISTRY",
    "get_prompt",
    "Pipeline",
    "StepStore",
    "audit",
    "assert_scalable",
    "PlanScaleError",
    "__version__",
]
