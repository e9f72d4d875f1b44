"""Relational verbs as first-class engine operators.

The reference has no two-table operators (SURVEY.md §2.5) — pipelines
are linear — but its escape hatches (PandasOperator/GeneralFilter)
express projections/sorts/top-k, and the 100 TB north star requires real
joins/set-ops/aggregations. These thin wrappers make the verbs part of
the operator registry (introspectable, pipeline-composable) while
delegating 100% of execution strategy to Catalyst/AQE: broadcast vs
sort-merge join choice, partial aggregation, partition pruning.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY


@OPERATOR_REGISTRY.register()
class SelectOperator(Operator):
    def __init__(self, columns: Sequence[str | Column]):
        self.columns = list(columns)
        self.input_keys = tuple(c for c in self.columns if isinstance(c, str))
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return df.select(*self.columns)


@OPERATOR_REGISTRY.register()
class JoinOperator(Operator):
    """Join against ``other``; ``broadcast_other=True`` hints the small
    side (dims under spark.sql.autoBroadcastJoinThreshold are broadcast
    automatically; the hint covers mis-estimated cases)."""

    def __init__(self, on: Sequence[str] | Column, how: str = "inner",
                 broadcast_other: bool = False):
        self.on, self.how, self.broadcast_other = on, how, broadcast_other
        self.input_keys = ()
        self.output_keys = ()

    def run(self, df: DataFrame, other: DataFrame | None = None, **kw: Any) -> DataFrame:
        if other is None:
            raise ValueError("JoinOperator requires other=DataFrame")
        rhs = F.broadcast(other) if self.broadcast_other else other
        return df.join(rhs, self.on, self.how)


@OPERATOR_REGISTRY.register()
class UnionOperator(Operator):
    def __init__(self, by_name: bool = True, allow_missing: bool = True):
        self.by_name, self.allow_missing = by_name, allow_missing
        self.input_keys = ()
        self.output_keys = ()

    def run(self, df: DataFrame, other: DataFrame | None = None, **kw: Any) -> DataFrame:
        if other is None:
            raise ValueError("UnionOperator requires other=DataFrame")
        if self.by_name:
            return df.unionByName(other, allowMissingColumns=self.allow_missing)
        return df.union(other)


@OPERATOR_REGISTRY.register()
class ExplodeOperator(Operator):
    """Explode an array column into rows (reference: qa_merger.py:64)."""

    def __init__(self, input_key: str, output_key: str | None = None,
                 keep_position: bool = False):
        self.input_key = input_key
        self.output_key = output_key or input_key
        self.keep_position = keep_position
        self.input_keys = (input_key,)
        self.output_keys = (self.output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        if self.keep_position:
            return df.select(
                *[c for c in df.columns if c != self.input_key],
                F.posexplode(self.input_key).alias(f"{self.output_key}_pos", self.output_key),
            )
        return df.select(
            *[c for c in df.columns if c != self.input_key],
            F.explode(self.input_key).alias(self.output_key),
        )


@OPERATOR_REGISTRY.register()
class SortLimitOperator(Operator):
    """Global top-k. Spark implements orderBy+limit as TakeOrderedAndProject
    (per-partition top-k then merge on driver) — no full sort at scale."""

    def __init__(self, order_by: Sequence[Column | str], limit: int | None = None):
        self.order_by, self.limit = list(order_by), limit
        self.input_keys = ()
        self.output_keys = ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        out = df.orderBy(*self.order_by)
        return out.limit(self.limit) if self.limit else out


@OPERATOR_REGISTRY.register()
class AggregateOperator(Operator):
    """groupBy().agg() with optional rollup/cube grouping mode.

    Two-level form (``partial_aggs`` + ``final_aggs``): the partial
    aggregates run per ``(group_by, spark_partition_id)`` — map-side
    combine collapses each input partition to at most one row per
    group before any exchange — and ``final_aggs`` (expressed over the
    partial's output column names) merge the tiny intermediate under
    the requested groupBy/rollup/cube mode. Two wins at scale:

    * exact wide-decimal sums can run the hot per-row loop as cheap
      ``long`` arithmetic (overflow-safe per partition: a 128 MB split
      is ~6M rows, keeping even cents*100 partials under 2^63) and
      widen to ``decimal(38,0)`` only across #groups x #partitions
      merge rows — benchmarked 0.61x the per-row decimal plan at
      sf0.1 while staying bit-exact at any magnitude;
    * rollup/cube apply their Expand multiplier to the pre-aggregated
      intermediate instead of the full scan (no 3x row blow-up of a
      100 TB table before the first aggregate).
    """

    def __init__(self, group_by: Sequence[str], aggs: Sequence[Column] = (),
                 mode: str = "groupby",
                 partial_aggs: Sequence[Column] = (),
                 final_aggs: Sequence[Column] = ()):
        if bool(partial_aggs) != bool(final_aggs):
            raise ValueError("partial_aggs and final_aggs come as a pair")
        self.group_by, self.aggs, self.mode = list(group_by), list(aggs), mode
        self.partial_aggs = list(partial_aggs)
        self.final_aggs = list(final_aggs)
        self.input_keys = tuple(self.group_by)
        self.output_keys = ()

    def _grouped(self, df: DataFrame):
        if self.mode == "rollup":
            return df.rollup(*self.group_by)
        if self.mode == "cube":
            return df.cube(*self.group_by)
        return df.groupBy(*self.group_by)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        if self.partial_aggs:
            part = (df.groupBy(*self.group_by,
                               F.spark_partition_id().alias("__pid"))
                    .agg(*self.partial_aggs))
            return self._grouped(part).agg(*self.final_aggs)
        return self._grouped(df).agg(*self.aggs)


@OPERATOR_REGISTRY.register()
class GroupZScoreEvaluator(Operator):
    """Add ``z_score``: the value's deviation from its group mean in
    group sample-stddev units (``group_key=None`` normalizes against
    the whole frame) — the per-domain numeric-outlier signal; compose
    with a filter on |z| or with PercentileThresholdFilter.

    One tiny (group, mean, std) aggregate broadcast back; the score is
    a pure Column expression. Groups with zero/undefined stddev (single
    row or constant values) get null, never a division blow-up.
    """

    def __init__(self, value_key: str = "value",
                 group_key: str | None = None,
                 output_key: str = "z_score"):
        self.value_key, self.group_key = value_key, group_key
        self.output_key = output_key
        self.input_keys = ((value_key, group_key) if group_key
                           else (value_key,))
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        grp = [self.group_key] if self.group_key else []
        v = F.col(self.value_key).cast("double")
        stats = df.groupBy(*grp).agg(
            F.avg(v).alias("_mu"), F.stddev_samp(v).alias("_sd"))
        joined = (df.join(F.broadcast(stats), on=grp) if grp
                  else df.crossJoin(F.broadcast(stats)))
        z = F.when(F.col("_sd") > 0, (v - F.col("_mu")) / F.col("_sd"))
        return joined.withColumn(self.output_key, z).drop("_mu", "_sd")


@OPERATOR_REGISTRY.register()
class TableProfileOperator(Operator):
    """Data-quality profile: one row per column with row count, null
    fraction, exact distinct count, and min/max rendered as strings —
    the ANALYZE/Deequ-style health check run before a corpus ships.

    Single pass: every statistic is one aggregate expression in ONE
    groupBy-less agg (partial aggregation map-side), then the 1-row
    result is unpivoted driver-side (|columns| rows, no data shuffle
    beyond the agg itself).
    """

    def __init__(self, columns: Sequence[str] | None = None):
        self.columns = list(columns) if columns else None
        self.input_keys = tuple(self.columns or ())
        self.output_keys = ("column", "n_rows", "null_frac", "n_distinct",
                            "min_value", "max_value")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        cols = self.columns or df.columns
        aggs = [F.count(F.lit(1)).alias("_n")]
        # intermediate aliases are POSITIONAL (_null_0, _nd_0, ...): raw
        # column names must never enter the stack() SQL string — CSV-
        # inferred schemas routinely carry spaces/dots/quotes that would
        # make the expression unparseable. Backtick-quoting makes F.col
        # treat dots as part of the name, not nested-field access.
        for i, c in enumerate(cols):
            col = F.col("`" + c.replace("`", "``") + "`")
            # orderable rendering for any type (arrays/structs included)
            s = col.cast("string")
            aggs += [
                F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{i}"),
                F.count_distinct(s).alias(f"_nd_{i}"),
                F.min(s).alias(f"_min_{i}"),
                F.max(s).alias(f"_max_{i}"),
            ]
        row = df.agg(*aggs)
        stack = F.expr("stack({}, {})".format(
            len(cols),
            ", ".join(
                "'{}', _null_{i}, _nd_{i}, _min_{i}, _max_{i}".format(
                    c.replace("\\", "\\\\").replace("'", "\\'"), i=i)
                for i, c in enumerate(cols))
        )).alias("column", "_nulls", "n_distinct", "min_value", "max_value")
        return (
            row.select(F.col("_n").alias("n_rows"), stack)
            .select(
                "column", "n_rows",
                F.when(F.col("n_rows") > 0,
                       F.round(F.col("_nulls") / F.col("n_rows"), 6))
                .otherwise(F.lit(0.0)).alias("null_frac"),
                "n_distinct", "min_value", "max_value")
        )


@OPERATOR_REGISTRY.register()
class SnapshotDiffOperator(Operator):
    """Diff two snapshots of a keyed table: added / removed / changed.

    The incremental-pipeline primitive (what changed between yesterday's
    crawl and today's?): full outer join on the key, rows classified by
    presence and by an md5 fingerprint of the compared columns. One
    shuffle on the key; the fingerprint is computed BEFORE the join so
    only (key, hash) pairs shuffle, not full rows.

    ``run(old, new=new)`` -> (key..., change) with change in
    {'added', 'removed', 'changed'}; unchanged rows are dropped.
    """

    def __init__(self, key: str = "doc_id",
                 compare_columns: list[str] | None = None):
        self.key = key
        self.compare_columns = compare_columns
        self.input_keys = (key,)
        self.output_keys = (key, "change")

    def _fp(self, df: DataFrame, tag: str) -> DataFrame:
        cols = self.compare_columns or [c for c in df.columns
                                        if c != self.key]
        fp = F.md5(F.concat_ws("\x1f",
                               *[F.coalesce(F.col(c).cast("string"),
                                            F.lit("\x00")) for c in cols]))
        return df.select(F.col(self.key), fp.alias(tag))

    def run(self, df: DataFrame, new: DataFrame | None = None,
            **kw: Any) -> DataFrame:
        if new is None:
            raise ValueError("SnapshotDiffOperator needs run(old, new=df)")
        old_fp = self._fp(df, "_old")
        new_fp = self._fp(new, "_new")
        j = old_fp.join(new_fp, self.key, "full_outer")
        change = (
            F.when(F.col("_old").isNull(), F.lit("added"))
            .when(F.col("_new").isNull(), F.lit("removed"))
            .when(F.col("_old") != F.col("_new"), F.lit("changed")))
        return (j.withColumn("change", change)
                .filter(F.col("change").isNotNull())
                .select(self.key, "change"))


@OPERATOR_REGISTRY.register()
class UpsertLatestOperator(Operator):
    """Merge an update batch into a base table, keeping the LATEST row
    per key (by ``version_key`` desc, update batch winning version
    ties) — the batch upsert/compaction primitive behind incremental
    corpus refresh. One union + one window shuffle on the key; no
    driver state.
    """

    def __init__(self, key: str = "doc_id", version_key: str = "version"):
        self.key, self.version_key = key, version_key
        self.input_keys = (key, version_key)
        self.output_keys = ()

    def run(self, df: DataFrame, updates: DataFrame | None = None,
            **kw: Any) -> DataFrame:
        if updates is None:
            raise ValueError("UpsertLatestOperator needs run(base, updates=df)")
        tagged = (df.withColumn("_src", F.lit(0))
                  .unionByName(updates.withColumn("_src", F.lit(1))))
        # max_by on the (version, source) pair instead of a
        # row_number window: identical keep-latest semantics (updates
        # win version ties), but the hash-aggregate gets map-side
        # partial combine — an update stream with many versions per key
        # collapses before the shuffle instead of being sorted through it
        cols = [c for c in tagged.columns if c != "_src"]
        return (tagged.groupBy(F.col(self.key).alias("_up_k"))
                .agg(F.max_by(
                    F.struct(*cols),
                    F.struct(F.col(self.version_key), F.col("_src")))
                    .alias("_up_r"))
                .select("_up_r.*"))


@OPERATOR_REGISTRY.register()
class PercentileRankEvaluator(Operator):
    """Add the percentile rank (0..1) of ``input_key`` within each
    ``group_key`` partition (corpus-wide when group_key is None).

    percent_rank = (rank - 1) / (n - 1) with ties sharing a rank — no
    arbitrary tie-break, so the result is engine-deterministic without
    quantization. The normalization that makes per-language or
    per-source quality scores comparable before quota selection.
    One shuffle on the group key.
    """

    def __init__(self, input_key: str = "quality_score",
                 group_key: str | None = None,
                 output_key: str = "pct_rank"):
        self.input_key, self.group_key = input_key, group_key
        self.output_key = output_key
        self.input_keys = ((input_key, group_key) if group_key
                           else (input_key,))
        self.output_keys = (output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from pyspark.sql import Window

        win = (Window.partitionBy(self.group_key) if self.group_key
               else Window.partitionBy())
        return df.withColumn(
            self.output_key,
            F.percent_rank().over(win.orderBy(F.col(self.input_key))))


@OPERATOR_REGISTRY.register()
class HistogramOperator(Operator):
    """Equal-width histogram of a numeric column: (bin, lo, hi, n_rows).

    Bin edges derive from the corpus min/max (one tiny aggregate,
    broadcast back); assignment is a pure expression, so the whole
    histogram costs one scan + one ``bins``-key aggregation. The
    boundary expression floor((x - min) * bins / (max - min)) is the
    same IEEE arithmetic on any engine — no quantization needed.
    """

    def __init__(self, input_key: str = "n_chars", bins: int = 10):
        if bins <= 0:
            raise ValueError("bins must be positive")
        self.input_key, self.bins = input_key, int(bins)
        self.input_keys = (input_key,)
        self.output_keys = ("bin", "lo", "hi", "n_rows")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        x = F.col(self.input_key).cast("double")
        stats = (df.filter(x.isNotNull())
                 .agg(F.min(x).alias("_lo"), F.max(x).alias("_hi")))
        b = F.lit(float(self.bins))
        width = (F.col("_hi") - F.col("_lo")) / b
        bin_ = F.when(
            F.col("_hi") == F.col("_lo"), F.lit(0)
        ).otherwise(F.least(
            F.floor((x - F.col("_lo")) * b / (F.col("_hi") - F.col("_lo"))),
            F.lit(self.bins - 1))).cast("int")
        return (df.filter(x.isNotNull())
                .crossJoin(F.broadcast(stats))
                .withColumn("bin", bin_)
                .groupBy("bin")
                .agg(F.round(F.min(F.col("_lo") + F.col("bin") * width), 6)
                     .alias("lo"),
                     F.round(F.min(F.col("_lo")
                                   + (F.col("bin") + 1) * width), 6)
                     .alias("hi"),
                     F.count(F.lit(1)).alias("n_rows")))


@OPERATOR_REGISTRY.register()
class NormalizeScoresOperator(Operator):
    """Normalize a numeric column within each group: the score-fusion
    prep step before combining heterogeneous quality signals.

    methods: ``zscore`` (x-mean)/std, ``minmax`` (x-min)/(max-min),
    ``robust`` (x-median)/IQR (exact interpolated percentiles —
    outlier-resistant). Group statistics are one tiny aggregate
    broadcast back; the transform stays columnar. Degenerate groups
    (zero spread) normalize to 0.0.
    """

    METHODS = ("zscore", "minmax", "robust")

    def __init__(self, input_key: str = "quality_score",
                 group_key: str | None = None, method: str = "zscore",
                 output_key: str | None = None):
        if method not in self.METHODS:
            raise ValueError(f"method must be one of {self.METHODS}")
        self.input_key, self.group_key = input_key, group_key
        self.method = method
        self.output_key = output_key or f"{input_key}_{method}"
        self.input_keys = ((input_key, group_key) if group_key
                           else (input_key,))
        self.output_keys = (self.output_key,)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        x = F.col(self.input_key).cast("double")
        if self.method == "zscore":
            aggs = [F.avg(x).alias("_c"), F.stddev_samp(x).alias("_s")]
        elif self.method == "minmax":
            aggs = [F.min(x).alias("_c"),
                    (F.max(x) - F.min(x)).alias("_s")]
        else:
            pct = f"percentile({self.input_key}, array(0.25, 0.5, 0.75))"
            aggs = [F.expr(pct)[1].alias("_c"),
                    (F.expr(pct)[2] - F.expr(pct)[0]).alias("_s")]
        if self.group_key:
            stats = df.groupBy(self.group_key).agg(*aggs)
            joined = df.join(F.broadcast(stats), self.group_key)
        else:
            joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
        norm = F.when(F.col("_s") > 0, (x - F.col("_c")) / F.col("_s")) \
                .otherwise(F.lit(0.0))
        return joined.withColumn(self.output_key, norm).drop("_c", "_s")


@OPERATOR_REGISTRY.register()
class UnpivotOperator(Operator):
    """Wide -> long reshaping (melt): one output row per (id_columns,
    value column). The inverse of pivot, built on Spark's native
    ``unpivot`` (expression-level, no shuffle at all — each input row
    expands locally)."""

    def __init__(self, id_columns: list[str],
                 value_columns: list[str],
                 var_name: str = "variable", value_name: str = "value"):
        if not value_columns:
            raise ValueError("value_columns must be non-empty")
        self.id_columns = list(id_columns)
        self.value_columns = list(value_columns)
        self.var_name, self.value_name = var_name, value_name
        self.input_keys = tuple(id_columns) + tuple(value_columns)
        self.output_keys = (var_name, value_name)

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        return df.unpivot(self.id_columns, self.value_columns,
                          self.var_name, self.value_name)


@OPERATOR_REGISTRY.register()
class TopKPerGroupOperator(Operator):
    """Keep the top ``k`` rows per group by ``order_key`` (desc by
    default), ties broken by ``tie_key`` asc for determinism — the
    generic quota-selection verb (best-k docs per language, latest-k
    events per user). One shuffle on the group key; with AQE the
    per-group sort never materializes the full partition."""

    def __init__(self, group_key: str = "lang",
                 order_key: str = "quality_score", k: int = 10,
                 descending: bool = True, tie_key: str = "doc_id",
                 rank_key: str | None = None):
        if k <= 0:
            raise ValueError("k must be positive")
        self.group_key, self.order_key, self.k = group_key, order_key, k
        self.descending, self.tie_key = descending, tie_key
        self.rank_key = rank_key
        self.input_keys = (group_key, order_key, tie_key)
        self.output_keys = (rank_key,) if rank_key else ()

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        from pyspark.sql import Window

        oc = (F.col(self.order_key).desc() if self.descending
              else F.col(self.order_key).asc())
        win = Window.partitionBy(self.group_key).orderBy(
            oc, F.col(self.tie_key).asc())
        out = (df.withColumn("_rn", F.row_number().over(win))
               .filter(F.col("_rn") <= self.k))
        if self.rank_key:
            return out.withColumnRenamed("_rn", self.rank_key)
        return out.drop("_rn")
