"""Relational verbs, similarity search, text analysis, streaming helpers."""

import pytest

from pyspark.sql import functions as F

from dataflow_spark.core.registry import get_operator


def test_join_union_explode(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, 10), (3, 30)], ["k", "w"])
    j = get_operator("JoinOperator", {"on": ["k"], "how": "inner",
                                      "broadcast_other": True})
    assert j.run(left, other=right).count() == 1

    u = get_operator("UnionOperator", {})
    assert u.run(left, other=spark.createDataFrame([(9, "z")], ["k", "v"])).count() == 3

    arr = spark.createDataFrame([(1, ["x", "y"])], ["k", "items"])
    e = get_operator("ExplodeOperator", {"input_key": "items", "output_key": "item"})
    assert [r["item"] for r in e.run(arr).collect()] == ["x", "y"]


def test_aggregate_rollup(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["g", "x"])
    op = get_operator("AggregateOperator", {
        "group_by": ["g"], "aggs": [F.sum("x").alias("sx")], "mode": "rollup"})
    rows = {r["g"]: r["sx"] for r in op.run(df).collect()}
    assert rows["a"] == 3 and rows["b"] == 3 and rows[None] == 6


def test_brute_force_knn_exact(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    op = get_operator("BruteForceKNN", {"k": 2})
    out = op.run(df, queries=df.filter("vec_id = 1"))
    got = [(r["neighbor_id"], round(r["cosine_sim"], 3)) for r in out.collect()]
    assert got[0] == (2, 0.994) and got[1][0] == 3


def test_lsh_knn_self_recall(spark):
    import random

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    op = get_operator("LSHKNN", {"k": 5, "num_planes": 8, "num_bands": 4})
    out = op.run(df, queries=df.filter("vec_id < 3")).collect()
    assert len(out) > 0  # buckets non-empty; approximate contract


def test_langid(spark):
    df = spark.createDataFrame([
        (1, "the cat is in the house and it is warm"),
        (2, "der hund ist nicht mit der katze auf dem sofa"),
        (3, "le chat est dans la maison pour la nuit"),
        (4, "el perro es una mascota para la familia"),
        (5, "这是一段中文文本内容"),
        (6, "xyzzy qwerty"),
    ], ["id", "text"])
    out = {r["id"]: r["pred_lang"] for r in
           get_operator("LanguageIdEvaluator", {"input_key": "text"}).run(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und"}


def test_token_and_quality(spark):
    df = spark.createDataFrame([(1, "Hello world, 42 times!")], ["id", "text"])
    t = get_operator("TokenCountEvaluator", {"input_key": "text"}).run(df).first()
    assert t["n_words"] == 4 and t["n_tokens"] == 6  # Hello world , 42 times !
    qr = get_operator("QualityScoreEvaluator", {"input_key": "text"}).run(df).first()
    assert 0.0 <= qr["quality_score"] <= 1.0


def test_accuracy_evaluator(spark):
    df = spark.createDataFrame(
        [("A", "a"), ("b", "B"), ("c", "x")], ["model_answer", "golden_answer"])
    out = get_operator("AccuracyDatasetEvaluator", {}).run(df).first()
    assert out["n_rows"] == 3 and out["n_correct"] == 2
    assert out["accuracy"] == pytest.approx(2 / 3)


def test_sessionize(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 100, base),
        (2, 100, base + dt.timedelta(minutes=10)),   # same session
        (3, 100, base + dt.timedelta(minutes=50)),   # gap > 30 -> new session
        (4, 200, base),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    from dataflow_spark.streaming.batched import sessionize

    out = sessionize(df, gap_minutes=30, tie_breaker="event_id")
    n = out.groupBy("user_id").agg(F.countDistinct("session_id").alias("n")).collect()
    got = {r["user_id"]: r["n"] for r in n}
    assert got == {100: 2, 200: 1}


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, bytearray(b"fakepngbytes"))], ["id", "content"])
    meta = get_operator("MediaMetadataExtractor", {"decode": "fake"}).run(df).first()["media_meta"]
    assert meta["media_type"] == "image" and len(meta["sha256"]) == 64
    assert meta["width"] >= 64 and meta["height"] >= 64
    # headers mode: unrecognized signature -> null dims, sha still real
    hmeta = get_operator("MediaMetadataExtractor", {}).run(df).first()["media_meta"]
    assert hmeta["width"] is None and len(hmeta["sha256"]) == 64

    feats = get_operator("MediaFeatureExtractor", {"dim": 8}).run(df).first()["features"]
    assert len(feats) == 8

    frames = get_operator("FrameSampler", {"n_frames": 3}).run(df).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]


def test_media_header_parsing():
    from dataflow_spark.operators.multimodal import parse_media_header

    png = bytes.fromhex("89504e470d0a1a0a0000000d49484452000000140000001e")
    assert parse_media_header(png) == {
        "format": "png", "media_type": "image", "width": 20, "height": 30,
        "duration_ms": 0}
    gif = bytes.fromhex("4749463839612800320000")
    assert parse_media_header(gif)["width"] == 40
    bmp = bytes.fromhex("424d" + "00" * 16 + "3c00000046000000")
    assert (parse_media_header(bmp)["width"], parse_media_header(bmp)["height"]) == (60, 70)
    jpg = bytes.fromhex("ffd8ffc0001108005a005000")
    got = parse_media_header(jpg)
    assert (got["width"], got["height"]) == (80, 90)
    wav = bytes.fromhex(
        "52494646240000005741564?".replace("?", "5")  # RIFF....WAVE
        + "666d74201000000001000100803e0000803e000001000800"
        + "64617461007d0000")
    w = parse_media_header(wav)
    assert w["media_type"] == "audio" and w["duration_ms"] == 2000
    assert parse_media_header(b"not media") is None
    assert parse_media_header(b"") is None


def test_stepstore_lineage(tmp_path, spark):
    from dataflow_spark import StepStore

    store = StepStore(str(tmp_path / "s"))
    df = spark.range(10)
    store.write(df, 0, "seed")
    store.write(df.filter("id < 5"), 1, "filter")
    assert store.last_step == 1
    assert store.read(spark).count() == 5
    assert [s["op"] for s in store.lineage()] == ["seed", "filter"]


def test_brute_force_knn_broadcast_guard(spark):
    import pytest

    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"))
    op = get_operator("BruteForceKNN", {"k": 3, "max_broadcast_queries": 50})
    with pytest.raises(ValueError, match="broadcast"):
        op.run(df)  # self-kNN: query side = 100 rows > 50 bound
    # under the bound: fine
    small = df.filter(F.col("vec_id") < 10)
    assert op.run(df, queries=small).count() == 30


def test_vendi_order2_matches_eigen_definition(spark):
    """VS_2 closed form n^2/||K||_F^2 equals 1/sum(eigenvalues^2)."""
    import numpy as np

    rng = np.random.RandomState(0)
    X = rng.standard_normal((20, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(20)],
        "vec_id long, embedding array<double>")
    out = get_operator("VendiDatasetEvaluator",
                       {"order": 2, "id_key": "vec_id"}).run(df).first()
    # fallback path (synthesized ids) must agree with the id_key path
    out_noid = get_operator("VendiDatasetEvaluator",
                            {"order": 2}).run(df.select("embedding")).first()
    assert abs(out_noid["vendi_score"] - out["vendi_score"]) < 1e-6
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ev = np.linalg.eigvalsh((Xn @ Xn.T) / 20)
    expected = 1.0 / (ev ** 2).sum()
    assert out["n"] == 20
    assert abs(out["vendi_score"] - expected) < 1e-3


def test_task2vec_order2_matches_renyi2_definition(spark):
    """-ln(||cov||_F^2/tr^2) equals Renyi-2 entropy of cov eigenvalues."""
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.standard_normal((30, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")
    out = get_operator("Task2VecDatasetEvaluator",
                       {"order": 2, "id_key": "vec_id"}).run(df).first()
    cov = np.cov(X, rowvar=False)
    ev = np.linalg.eigvalsh(cov)
    p = ev / ev.sum()
    expected = -np.log((p ** 2).sum())
    assert out["n"] == 30
    assert abs(out["task2vec_diversity"] - expected) < 1e-3


class TestCentroidSimilarity:
    def test_group_centroid(self, spark):
        from dataflow_spark.core.registry import get_operator

        rows = [
            (1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "a"),
            (3, [2.0, 2.0], "b"), (4, [4.0, 4.0], "b"),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        op = get_operator("CentroidSimilarityEvaluator",
                          {"group_key": "label"})
        out = {r["vec_id"]: r["centroid_sim"] for r in op.run(df).collect()}
        # group a centroid = [.5,.5]: both members at 45 degrees
        assert abs(out[1] - 0.7071067811865475) < 1e-9
        assert abs(out[2] - 0.7071067811865475) < 1e-9
        # group b members are collinear with their centroid
        assert abs(out[3] - 1.0) < 1e-9
        assert abs(out[4] - 1.0) < 1e-9

    def test_global_centroid_and_schema(self, spark):
        from dataflow_spark.core.registry import get_operator

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0])], ["vec_id", "embedding"])
        out = get_operator("CentroidSimilarityEvaluator", {}).run(df)
        assert set(out.columns) == {"vec_id", "embedding", "centroid_sim"}
        assert all(abs(r["centroid_sim"] - 1.0) < 1e-9
                   for r in out.collect())


class TestGroupZScore:
    def test_group_normalization(self, spark):
        from dataflow_spark.core.registry import get_operator

        rows = [(1, "a", 0.0), (2, "a", 10.0),
                (3, "b", 100.0), (4, "b", 100.0)]
        df = spark.createDataFrame(rows, ["id", "grp", "value"])
        op = get_operator("GroupZScoreEvaluator", {"group_key": "grp"})
        out = {r["id"]: r["z_score"] for r in op.run(df).collect()}
        # group a: mean 5, sample std ~7.071 -> z = -/+ 0.7071
        assert abs(out[1] + 0.7071067811865475) < 1e-9
        assert abs(out[2] - 0.7071067811865475) < 1e-9
        # constant group: std 0 -> null, no division blow-up
        assert out[3] is None and out[4] is None

    def test_global_mode(self, spark):
        from dataflow_spark.core.registry import get_operator

        df = spark.createDataFrame([(1, 0.0), (2, 2.0)], ["id", "value"])
        out = {r["id"]: r["z_score"]
               for r in get_operator("GroupZScoreEvaluator", {}).run(df).collect()}
        assert abs(out[1] + 0.7071067811865475) < 1e-9


class TestTableProfile:
    def test_profile(self, spark):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        from dataflow_spark.core.registry import get_operator

        schema = StructType([StructField("id", LongType()),
                             StructField("s", StringType())])
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (4, "b")], schema)
        out = {r["column"]: r for r in
               get_operator("TableProfileOperator", {}).run(df).collect()}
        assert out["id"]["n_rows"] == 4
        assert out["id"]["null_frac"] == 0.0
        assert out["id"]["n_distinct"] == 4
        assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"
        assert out["s"]["null_frac"] == 0.25
        assert out["s"]["n_distinct"] == 2  # nulls not counted

    def test_profile_non_identifier_column_names(self, spark):
        """CSV-inferred schemas carry spaces/dots/quotes: raw names must
        never enter the stack() SQL string (positional aliases)."""
        from pyspark.sql.types import (DoubleType, StringType, StructField,
                                       StructType)

        from dataflow_spark.core.registry import get_operator

        schema = StructType([
            StructField("order id", StringType()),
            StructField("price.usd", DoubleType()),
            StructField("it's a name", StringType()),
        ])
        df = spark.createDataFrame(
            [("a", 1.5, "x"), ("b", 2.5, None)], schema)
        out = {r["column"]: r for r in
               get_operator("TableProfileOperator", {}).run(df).collect()}
        assert set(out) == {"order id", "price.usd", "it's a name"}
        assert out["order id"]["n_distinct"] == 2
        assert out["price.usd"]["min_value"] == "1.5"
        assert out["it's a name"]["null_frac"] == 0.5


class TestTwoLevelAggregate:
    """AggregateOperator partial_aggs/final_aggs form (r7): long
    partials per (group, partition), widened merge — must be value-
    identical to the single-level decimal plan in every grouping mode."""

    def _df(self, spark):
        rows = [("a", i % 3, float(i) + 0.25) for i in range(100)] + \
               [("b", i % 2, float(i) * 2 + 0.5) for i in range(50)]
        return (spark.createDataFrame(rows, ["g", "sub", "v"])
                .repartition(7))  # several partitions -> real partials

    def _single(self, mode):
        return get_operator("AggregateOperator", {
            "group_by": ["g"], "mode": mode,
            "aggs": [F.sum(F.col("v").cast("decimal(38,2)")).alias("s"),
                     F.count(F.lit(1)).alias("n")]})

    def _two(self, mode):
        return get_operator("AggregateOperator", {
            "group_by": ["g"], "mode": mode,
            "partial_aggs": [
                F.sum((F.col("v") * 100).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n")],
            "final_aggs": [
                (F.sum(F.col("s").cast("decimal(38,0)")) / 100)
                .cast("decimal(38,2)").alias("s"),
                F.sum("n").alias("n")]})

    @pytest.mark.parametrize("mode", ["groupby", "rollup", "cube"])
    def test_matches_single_level(self, spark, mode):
        df = self._df(spark)
        one = {tuple(r) for r in self._single(mode).run(df).collect()}
        two = {tuple(r) for r in self._two(mode).run(df).collect()}
        assert one == two

    def test_pair_required(self):
        with pytest.raises(ValueError):
            get_operator("AggregateOperator", {
                "group_by": ["g"],
                "partial_aggs": [F.count(F.lit(1)).alias("n")]})

    def test_rollup_expand_on_intermediate(self, spark):
        # the Expand (grouping-set multiplier) must sit ABOVE the first
        # aggregate, i.e. apply to the pre-aggregated intermediate, not
        # the raw scan
        df = self._df(spark)
        plan = (self._two("rollup").run(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Expand" in plan
        pre, _, post = plan.partition("Expand")
        # below Expand there is already a HashAggregate (the partial)
        assert "HashAggregate" in post
