"""BM25RetrievalOperator: ranking semantics + distributed plan shape."""

import math

import pytest

from dataflow_spark.core.registry import get_operator


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "banana banana banana cherry"),
        (4, "durian elderberry"),
    ], ["doc_id", "text"])


def test_scores_match_closed_form(corpus):
    op = get_operator("BM25RetrievalOperator", {
        "queries": ["apple"], "top_k": 10})
    rows = {r["doc_id"]: r for r in op.run(corpus).collect()}
    # closed form: N=4, df(apple)=2, avgdl=(3+2+4+2)/4=2.75
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.75)), 6)

    assert set(rows) == {1, 2}  # only docs containing 'apple'
    assert rows[1]["score"] == pytest.approx(s(2, 3), abs=1e-6)
    assert rows[2]["score"] == pytest.approx(s(1, 2), abs=1e-6)
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2


def test_multi_term_and_missing_term(corpus):
    op = get_operator("BM25RetrievalOperator", {
        "queries": ["banana cherry", "zzz"], "top_k": 2})
    out = op.run(corpus).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query"], []).append(r)
    # 'zzz' matches nothing -> no rows for that query
    assert "zzz" not in by_q
    got = sorted(by_q["banana cherry"], key=lambda r: r["rank"])
    assert len(got) == 2  # top_k caps the per-query result
    assert got[0]["doc_id"] == 3  # banana*3 + cherry dominates


def test_query_side_is_broadcast(corpus):
    op = get_operator("BM25RetrievalOperator", {"queries": ["apple"]})
    plan = op.run(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # doc-side explode must not sit under a cartesian/nested-loop join
    assert "CartesianProduct" not in plan


def test_validates_args():
    with pytest.raises(ValueError):
        get_operator("BM25RetrievalOperator", {"queries": []})
    with pytest.raises(ValueError):
        get_operator("BM25RetrievalOperator", {"queries": ["x"], "top_k": 0})
