from dataflow_spark.core.operator import Operator, FilterOperator, RefineOperator
from dataflow_spark.core.registry import OPERATOR_REGISTRY, Registry, get_operator
from dataflow_spark.core.pipeline import Pipeline, PipelineStep
from dataflow_spark.core.storage import StepStore

__all__ = [
    "Operator",
    "FilterOperator",
    "RefineOperator",
    "OPERATOR_REGISTRY",
    "Registry",
    "get_operator",
    "Pipeline",
    "PipelineStep",
    "StepStore",
]
