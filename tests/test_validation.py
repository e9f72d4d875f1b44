"""ExpectationSuiteOperator: declarative data-quality checks."""

import pytest

from dataflow_spark.core.registry import get_operator


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(1, "alpha", "en", 5), (2, None, "en", 7), (2, "gamma", "xx", -1)],
        ["doc_id", "text", "lang", "n_chars"])
    orders = spark.createDataFrame([(10, 1), (11, 2), (12, 99)],
                                   ["o_orderkey", "o_custkey"])
    customer = spark.createDataFrame([(1,), (2,)], ["c_custkey"])
    return docs, orders, customer


def _by_check(rows):
    return {(r["check"], r["column"]): r for r in rows}


def test_failing_and_passing_checks(frames):
    docs, _, _ = frames
    op = get_operator("ExpectationSuiteOperator", {"checks": [
        {"check": "row_count", "at_least": 1, "at_most": 10},
        {"check": "not_null", "column": "text"},
        {"check": "not_null", "column": "text", "max_null_frac": 0.5},
        {"check": "unique", "column": "doc_id"},
        {"check": "min", "column": "n_chars", "at_least": 0},
        {"check": "accepted_values", "column": "lang", "values": ["en"]},
        {"check": "matches_regex", "column": "lang", "pattern": "^[a-w]+$"},
    ]})
    rows = op.run(docs).collect()
    got = _by_check(rows)
    assert got[("row_count", "*")]["passed"] == 1
    assert got[("row_count", "*")]["metric"] == 3.0
    # 1/3 rows null: strict not_null fails, 0.5-tolerance passes
    strict, lax = [r for r in rows if r["check"] == "not_null"]
    assert {strict["passed"], lax["passed"]} == {0, 1}
    assert got[("unique", "doc_id")]["metric"] == 1.0
    assert got[("unique", "doc_id")]["passed"] == 0
    assert got[("min", "n_chars")]["passed"] == 0  # min is -1
    assert got[("accepted_values", "lang")]["metric"] == 1.0  # one 'xx'
    assert got[("matches_regex", "lang")]["metric"] == 1.0  # 'xx' has x
    assert len(rows) == 7


def test_ref_integrity(frames):
    docs, orders, customer = frames
    op = get_operator("ExpectationSuiteOperator", {"checks": [
        {"check": "ref_integrity", "column": "o_custkey",
         "ref": "customer", "ref_column": "c_custkey"},
    ]})
    [row] = op.run(orders, refs={"customer": customer}).collect()
    assert row["metric"] == 1.0 and row["passed"] == 0  # custkey 99 orphan
    with pytest.raises(KeyError):
        op.run(orders).collect()


def test_single_scan_plan(frames):
    """All column checks compile into one aggregate over one scan."""
    docs, _, _ = frames
    op = get_operator("ExpectationSuiteOperator", {"checks": [
        {"check": "row_count", "at_least": 1},
        {"check": "not_null", "column": "text"},
        {"check": "min", "column": "n_chars", "at_least": 0},
        {"check": "accepted_values", "column": "lang", "values": ["en"]},
    ]})
    plan = op.run(docs)._jdf.queryExecution().optimizedPlan().toString()
    # no distinct agg in this suite -> a single Aggregate node, no join
    assert plan.count("Aggregate") == 1
    assert "Join" not in plan


def test_percentile_rank(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 40),
         (5, "b", 7)], ["doc_id", "grp", "x"])
    op = get_operator("PercentileRankEvaluator", {
        "input_key": "x", "group_key": "grp", "output_key": "pr"})
    got = {r["doc_id"]: r["pr"] for r in op.run(df).collect()}
    assert got[1] == 0.0
    assert got[2] == got[3] == pytest.approx(1 / 3)  # ties share rank
    assert got[4] == 1.0
    assert got[5] == 0.0  # singleton group


def test_histogram(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    op = get_operator("HistogramOperator", {"input_key": "x", "bins": 10})
    rows = {r["bin"]: r for r in op.run(df).collect()}
    assert len(rows) == 10
    assert all(rows[b]["n_rows"] == 10 for b in range(10))
    assert rows[0]["lo"] == 0.0 and rows[9]["hi"] == 99.0
    # max value lands in the last bin, not a phantom 11th
    assert max(rows) == 9


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 4, ["x"])
    op = get_operator("HistogramOperator", {"input_key": "x", "bins": 5})
    [row] = op.run(df).collect()
    assert row["bin"] == 0 and row["n_rows"] == 4


def test_normalize_scores_methods(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 10.0), (3, "a", 20.0),
         (4, "b", 5.0), (5, "b", 5.0)],  # degenerate group
        ["doc_id", "grp", "x"])
    for method, expect in [
        ("minmax", {1: 0.0, 2: 0.5, 3: 1.0, 4: 0.0, 5: 0.0}),
        ("zscore", {2: 0.0}),    # mean row
        ("robust", {2: 0.0}),    # median row
    ]:
        op = get_operator("NormalizeScoresOperator", {
            "input_key": "x", "group_key": "grp", "method": method,
            "output_key": "n"})
        got = {r["doc_id"]: r["n"] for r in op.run(df).collect()}
        for k, v in expect.items():
            assert got[k] == pytest.approx(v), (method, k)
        # degenerate group always maps to 0
        assert got[4] == got[5] == 0.0
    with pytest.raises(ValueError):
        get_operator("NormalizeScoresOperator", {"method": "nope"})


def test_unpivot_operator(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "a", "b"])
    op = get_operator("UnpivotOperator", {
        "id_columns": ["id"], "value_columns": ["a", "b"]})
    got = {(r["id"], r["variable"]): r["value"]
           for r in op.run(df).collect()}
    assert got == {(1, "a"): 10.0, (1, "b"): 20.0}
    with pytest.raises(ValueError):
        get_operator("UnpivotOperator", {"id_columns": ["id"],
                                         "value_columns": []})


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [(1, "x", 5), (2, "x", 9), (3, "x", 9), (4, "x", 1), (5, "y", 2)],
        ["doc_id", "grp", "score"])
    op = get_operator("TopKPerGroupOperator", {
        "group_key": "grp", "order_key": "score", "k": 2,
        "tie_key": "doc_id", "rank_key": "r"})
    got = {(r["grp"], r["r"]): r["doc_id"] for r in op.run(df).collect()}
    # ties (9, 9) break by doc_id asc
    assert got == {("x", 1): 2, ("x", 2): 3, ("y", 1): 5}
