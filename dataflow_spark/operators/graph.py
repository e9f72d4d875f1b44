"""Graph analytics over edge DataFrames: components + PageRank.

The near-dup dedup family already runs large-star/small-star connected
components internally (operators/filters/dedup.py:44); this pack makes
graph analytics a PUBLIC surface over arbitrary edge frames — entity
graphs, incident-correlation graphs, citation graphs — because corpus
curation keeps producing them (duplicate clusters, cross-references,
co-occurrence).

Scale posture:

- ``ConnectedComponentsOperator`` delegates to the adaptive components
  kernel: in-driver union-find below an edge bound, alternating
  large-star/small-star contraction (O(log^2 n) rounds, lineage
  truncated per round) above it.
- ``PageRankOperator`` runs a FIXED number of power iterations as pure
  DataFrame ops — per iteration one join edges->ranks (shuffle on src),
  one aggregation on dst, one left join back to the node set. No driver
  round-trips at all: the returned frame is a single lazy plan.
  Per-iteration rank quantization (``round_digits``) keeps results
  engine-deterministic (the DuckDB oracle unrolls the same iterations).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.operators.filters.dedup import connected_components


@OPERATOR_REGISTRY.register()
class ConnectedComponentsOperator(Operator):
    """(src, dst) undirected edge frame -> (id, component).

    component = the minimum node id reachable from ``id``; every node
    that appears in the edge frame is present in the output (pass
    isolated nodes as self-loops if they must appear too).
    """

    def __init__(self, src: str = "src", dst: str = "dst"):
        self.src, self.dst = src, dst
        self.input_keys = (src, dst)
        self.output_keys = ("id", "component")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        edges = df.select(F.col(self.src).cast("long").alias("src"),
                          F.col(self.dst).cast("long").alias("dst"))
        comp = connected_components(edges)
        nodes = (edges.select(F.col("src").alias("id"))
                 .unionByName(edges.select(F.col("dst").alias("id")))
                 .distinct())
        return (nodes.join(comp, "id", "left")
                .select("id", F.coalesce("component", F.col("id"))
                        .alias("component")))


@OPERATOR_REGISTRY.register()
class PageRankOperator(Operator):
    """(src, dst) directed edge frame -> (node, pagerank).

    Standard damped PageRank, ``n_iter`` power iterations from the
    uniform vector; dangling nodes (no out-edges) keep their mass
    (no redistribution), the common simplification. Parallel edges are
    collapsed (the graph is simple). Ranks are quantized to
    ``round_digits`` decimals after every iteration so the fixed-point
    trajectory is identical on any engine.
    """

    def __init__(self, src: str = "src", dst: str = "dst",
                 damping: float = 0.85, n_iter: int = 3,
                 round_digits: int = 9):
        if not 0.0 < damping < 1.0:
            raise ValueError("damping must be in (0, 1)")
        if n_iter < 0:
            raise ValueError("n_iter must be >= 0")
        self.src, self.dst = src, dst
        self.damping, self.n_iter = float(damping), int(n_iter)
        self.round_digits = round_digits
        self.input_keys = (src, dst)
        self.output_keys = ("node", "pagerank")

    def run(self, df: DataFrame, **kw: Any) -> DataFrame:
        d = self.damping
        edges = df.select(F.col(self.src).cast("long").alias("_s"),
                          F.col(self.dst).cast("long").alias("_t")).distinct()
        nodes = (edges.select(F.col("_s").alias("node"))
                 .unionByName(edges.select(F.col("_t").alias("node")))
                 .distinct())
        nstat = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        deg = edges.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
        # out-degree rides along with the edge list: computed once
        eo = edges.join(deg, "_s")

        pr = (nodes.crossJoin(F.broadcast(nstat))
              .select("node", F.round(F.lit(1.0) / F.col("_n"),
                                      self.round_digits).alias("pagerank")))
        for _ in range(self.n_iter):
            contrib = (eo.join(pr.withColumnRenamed("node", "_s"), "_s")
                       .groupBy("_t")
                       .agg(F.sum(F.col("pagerank") / F.col("_deg"))
                            .alias("_in")))
            pr = (nodes.join(contrib.withColumnRenamed("_t", "node"),
                             "node", "left")
                  .crossJoin(F.broadcast(nstat))
                  .select("node", F.round(
                      (1.0 - d) / F.col("_n")
                      + d * F.coalesce(F.col("_in"), F.lit(0.0)),
                      self.round_digits).alias("pagerank")))
        return pr
