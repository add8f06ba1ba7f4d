"""Hypergraph PageRank as the same two-phase gather-scatter the LP kernel
uses (north rule sibling algorithm; spec: Page et al. 1999 + the standard
two-step hypergraph random walk).

Walk semantics (matching oracle_hypergraph_pagerank): from vertex v pick
an incident hyperedge uniformly (1/degree), then a member uniformly
(1/edge_size).  Dangling (degree-0) vertices redistribute their mass
uniformly.  Scores sum to 1; convergence on L1 delta.

Scale shape per iteration: two joins against the frozen incidence
layouts + two sum-aggregations — identical shuffle structure to one LP
superstep, with float mass instead of label counts.  Sum is algebraic,
so map-side partial aggregation absorbs hyperedge skew exactly as in
the majority kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex_id, rank)
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)


def pagerank_iteration(
    hg: Hypergraph,
    ranks: DataFrame,
    inv_degree: DataFrame,
    damping: float,
) -> DataFrame:
    """One power iteration; returns (vertex_id, rank) for every vertex."""
    n = hg.num_vertices
    # contribution r_v / deg_v; dangling vertices contribute via the
    # dangling-mass term instead (inv_degree has no row for them)
    contrib = ranks.join(inv_degree, "vertex_id").select(
        "vertex_id", (F.col("rank") * F.col("inv_degree")).alias("contrib")
    )
    # phase 1: edge mass m_e = (sum_{v in e} contrib_v) / |e|
    edge_mass = (
        hg.incidence_by_vertex.join(contrib, "vertex_id")
        .groupBy("edge_id")
        .agg(F.sum("contrib").alias("mass_sum"), F.count("*").alias("sz"))
        .select("edge_id", (F.col("mass_sum") / F.col("sz")).alias("mass"))
    )
    # phase 2: gather r'_v = sum_{e incident to v} m_e
    gathered = (
        hg.incidence_by_edge.join(edge_mass, "edge_id")
        .groupBy("vertex_id")
        .agg(F.sum("mass").alias("gathered"))
    )
    dangling = (
        ranks.join(inv_degree, "vertex_id", "left_anti")
        .agg(F.sum("rank"))
        .collect()[0][0]
        or 0.0
    )
    base = (1.0 - damping) / n + damping * dangling / n
    return ranks.select("vertex_id").join(gathered, "vertex_id", "left").select(
        "vertex_id",
        (F.lit(base) + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))).alias("rank"),
    )


def hypergraph_pagerank(
    hg: Hypergraph,
    damping: float = 0.85,
    max_iterations: int = 100,
    tol: float = 1e-10,
) -> PageRankResult:
    """Power-iterate to convergence (L1 delta < tol).  ``tol=1e-10``
    comfortably clears the north rule's allclose(1e-6) bar."""
    n = hg.num_vertices
    inv_degree = (
        hg.incidence_by_vertex.groupBy("vertex_id")
        .agg((F.lit(1.0) / F.count("*")).alias("inv_degree"))
        .persist()
    )
    ranks = hg.vertices().select(
        "vertex_id", F.lit(1.0 / n).cast("double").alias("rank")
    ).localCheckpoint(eager=True)

    deltas: list[float] = []
    converged = False
    iterations = 0
    for it in range(max_iterations):
        new = pagerank_iteration(hg, ranks, inv_degree, damping).localCheckpoint(eager=True)
        delta = (
            new.join(ranks.select("vertex_id", F.col("rank").alias("_old")), "vertex_id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))))
            .collect()[0][0]
        )
        ranks.unpersist()
        ranks = new
        iterations = it + 1
        deltas.append(float(delta))
        if delta < tol:
            converged = True
            break
    inv_degree.unpersist()
    return PageRankResult(ranks=ranks, iterations=iterations, converged=converged, deltas=deltas)
