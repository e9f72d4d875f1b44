"""Name-level parity with the reference operator registry.

``reference_operator_names.txt`` is the frozen list of every class the
reference registers via @OPERATOR_REGISTRY.register() (grep over
dataflow/operators/**). Every name must resolve in this engine's
registry — directly or through the alias table — so pipelines written
against the reference import unchanged.
"""

import os

import pytest

from dataflow_spark.core.registry import OPERATOR_REGISTRY

NAMES_FILE = os.path.join(os.path.dirname(__file__),
                          "reference_operator_names.txt")


def _names():
    with open(NAMES_FILE) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_names_file_is_complete():
    assert len(_names()) == 197


@pytest.mark.parametrize("name", _names())
def test_reference_name_resolves(name):
    import dataflow_spark.operators  # noqa: F401 — triggers registration

    assert name in OPERATOR_REGISTRY, f"{name} does not resolve"
