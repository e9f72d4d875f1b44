"""Reasoning prompt families (reference: dataflow/prompts/reasoning/)."""

from dataflow_spark.prompts.reasoning import diy, general, math  # noqa: F401
