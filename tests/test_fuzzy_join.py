"""FuzzyJoinOperator: exact cross-table set-similarity join."""

import itertools

import pytest

from dataflow_spark.core.registry import get_operator


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame([
        (0, "acme corporation limited"),
        (2, "global widgets incorporated"),
        (4, "zebra systems"),
    ], ["doc_id", "text"])
    right = spark.createDataFrame([
        (1, "acme corporation ltd"),
        (3, "globex widgets incorporated"),
        (5, "completely different payload"),
    ], ["doc_id", "text"])
    return left, right


def test_matches_quadratic_reference(spark, tables):
    left, right = tables
    op = get_operator("FuzzyJoinOperator", {
        "threshold": 0.4, "mode": "char", "shingle_n": 3})
    got = {(r["left_id"], r["right_id"]): r["jaccard"]
           for r in op.run(left, right=right).collect()}

    def sh(t):
        return ({t[i:i + 3] for i in range(len(t) - 2)}
                if len(t) >= 3 else {t})

    want = {}
    for (li, lt), (ri, rt) in itertools.product(
            [(r["doc_id"], r["text"]) for r in left.collect()],
            [(r["doc_id"], r["text"]) for r in right.collect()]):
        j = _jaccard(sh(lt), sh(rt))
        if j >= 0.4:
            want[(li, ri)] = round(j, 6)
    assert got == want
    assert got  # the fixture plants at least one genuine match


def test_words_mode(spark, tables):
    left, right = tables
    op = get_operator("FuzzyJoinOperator", {
        "threshold": 0.5, "mode": "words"})
    got = {(r["left_id"], r["right_id"]) for r in
           op.run(left, right=right).collect()}
    # 'acme corporation {limited,ltd}': 2/4 words shared -> j=0.5
    # 'global(ex) widgets incorporated': 2/4 -> j=0.5
    assert got == {(0, 1), (2, 3)}


def test_no_cartesian_product(spark, tables):
    left, right = tables
    op = get_operator("FuzzyJoinOperator", {"threshold": 0.6})
    plan = (op.run(left, right=right)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_requires_right(tables):
    left, _ = tables
    op = get_operator("FuzzyJoinOperator", {})
    with pytest.raises(ValueError):
        op.run(left)
