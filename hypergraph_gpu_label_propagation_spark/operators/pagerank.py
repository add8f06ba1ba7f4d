"""Hypergraph PageRank as the same two-phase gather-scatter the LP kernel
uses (north rule sibling algorithm; spec: Page et al. 1999 + the standard
two-step hypergraph random walk).

Walk semantics (matching oracle_hypergraph_pagerank): from vertex v pick
an incident hyperedge uniformly (1/degree), then a member uniformly
(1/edge_size).  Dangling (degree-0) vertices redistribute their mass
uniformly.  Scores sum to 1; convergence on L1 delta.

Scale/iteration design (mirrors the LP driver loop):
- the state frame carries (vertex_id, rank, inv_degree) — inv_degree
  is joined ONCE at init and rides along, null marking dangling
  vertices, so no per-iteration degree join or anti-join;
- exactly two Spark actions per iteration: the eager localCheckpoint
  (which also truncates lineage — without it plan depth grows per
  iteration and driver time explodes) and one combined aggregate that
  returns BOTH the L1 delta and the next iteration's dangling mass;
- the two gathers hit the frozen incidence layouts; sum is algebraic so
  map-side partial aggregation absorbs hyperedge skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.plans.tuning import loop_conf, loop_partitions


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex_id, rank)
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)


def pagerank_state_init(hg: Hypergraph) -> DataFrame:
    """(vertex_id, rank=1/n, inv_degree|null) for every vertex."""
    inv_degree = hg.incidence_by_vertex.groupBy("vertex_id").agg(
        (F.lit(1.0) / F.count("*")).alias("inv_degree")
    )
    return hg.vertices().join(inv_degree, "vertex_id", "left").select(
        "vertex_id",
        F.lit(1.0 / hg.num_vertices).cast("double").alias("rank"),
        "inv_degree",
    )


def _walk_gather(hg: Hypergraph, state: DataFrame) -> DataFrame:
    """The shared two-phase hypergraph walk: (vertex_id, gathered) =
    sum over incident edges of the edge's averaged member contribution."""
    contrib = state.filter(F.col("inv_degree").isNotNull()).select(
        "vertex_id", (F.col("rank") * F.col("inv_degree")).alias("contrib")
    )
    # phase 1: edge mass m_e = (sum_{v in e} contrib_v) / |e|
    # gather_to_* (r08, guide §2.4): small one-row-per-id frames are
    # broadcast against the layout partitioned by the aggregation key,
    # so both gathers run with ZERO E-sized exchanges per iteration;
    # big frames (or salted layouts) fall back to the co-partitioned
    # shuffle path — exact either way, sum/count are algebraic.  The
    # FP sum order within each edge/vertex group is the same
    # partial/final aggregation either way (one partition holds the
    # whole group pre-aggregation under broadcast), and every board
    # row rounds to 6 decimals with tol bounds far below that.
    edge_mass = (
        hg.gather_to_edge(contrib)
        .groupBy("edge_id")
        .agg((F.sum("contrib") / F.count("*")).alias("mass"))
    )
    # phase 2: gather r'_v = sum_{e incident to v} m_e
    return (
        hg.gather_to_vertex(edge_mass)
        .groupBy("vertex_id")
        .agg(F.sum("mass").alias("gathered"))
    )


def pagerank_step(
    hg: Hypergraph,
    state: DataFrame,
    dangling_mass: float,
    damping: float,
) -> DataFrame:
    """One power iteration.  Returns (vertex_id, rank, inv_degree, _old)
    for every vertex; caller supplies the current dangling mass (sum of
    rank over degree-0 vertices) as a scalar."""
    n = hg.num_vertices
    gathered = _walk_gather(hg, state)
    base = (1.0 - damping) / n + damping * dangling_mass / n
    return state.join(gathered, "vertex_id", "left").select(
        "vertex_id",
        (F.lit(base) + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))).alias("rank"),
        "inv_degree",
        F.col("rank").alias("_old"),
    )


def hypergraph_pagerank(
    hg: Hypergraph,
    damping: float = 0.85,
    max_iterations: int = 100,
    tol: float = 1e-9,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    initial_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Power-iterate to L1 delta < tol.  The default tol=1e-9 bounds the
    per-vertex error well under the north rule's allclose(1e-6) bar
    (per-vertex |err| <= L1 delta / (1 - damping) at convergence).

    ``initial_ranks`` (vertex_id, rank) warm-starts the iteration —
    e.g. the previous run's ranks after the graph grew.  Sound because
    the PageRank map is an L1 contraction with factor ``damping`` to a
    UNIQUE fixed point, so ANY start converges to the same ranks; the
    initial delta then equals the perturbation's size rather than the
    uniform start's full distance (iteration savings are spectral, not
    guaranteed — see streaming.lp_stream.run_incremental_pagerank).
    Vertices missing from ``initial_ranks`` start at 1/n and the vector
    is renormalized to sum 1 (the L1 contraction also tolerates an
    unnormalized start, but a probability vector keeps the delta-vs-tol
    semantics identical to a cold run's)."""
    from hypergraph_gpu_label_propagation_spark.plans.checkpointing import (
        find_latest_snapshot,
        write_snapshot,
    )

    start = 0
    state = None
    if resume and checkpoint_dir:
        found = find_latest_snapshot(hg.spark, checkpoint_dir, "pagerank")
        if found is not None:
            state, start = found
            state = state.select("vertex_id", "rank", "inv_degree")
    if state is None and initial_ranks is not None:
        state = pagerank_state_init(hg).alias("s").join(
            initial_ranks.select(
                "vertex_id", F.col("rank").alias("_warm")
            ).alias("w"),
            "vertex_id",
            "left",
        ).select(
            "vertex_id",
            F.coalesce("_warm", F.col("s.rank")).alias("rank"),
            "inv_degree",
        )
    if state is None:
        state = pagerank_state_init(hg)
    # the dangling-mass init rides the eager-localCheckpoint job via
    # observe() — no separate driver collect (observed metrics fire on
    # eager localCheckpoint, same mechanism as the loop body)
    obs0 = Observation("pr_init")
    state = state.observe(
        obs0,
        F.sum(F.when(F.col("inv_degree").isNull(), F.col("rank"))).alias("dang"),
        F.sum("rank").alias("total"),
    ).localCheckpoint(eager=True)
    row0 = obs0.get
    dangling = float(row0["dang"] or 0.0)
    total = float(row0["total"] or 1.0)
    if abs(total - 1.0) > 1e-12:
        # renormalize a warm start over a grown vertex set to a
        # probability vector; lazy — materialized by iteration 1's
        # checkpoint, no extra action (dangling scales with it)
        state = state.withColumn("rank", F.col("rank") / F.lit(total))
        dangling /= total
    deltas: list[float] = []
    converged = False
    iterations = start
    # loop-scoped tuning (plans/tuning.py): AQE off, data-sized partitions
    cores = hg.spark.sparkContext.defaultParallelism
    with loop_conf(hg.spark, loop_partitions(hg.count_incidence(), cores)):
        for it in range(start, max_iterations):
            obs = Observation(f"pr_{it}")
            new = (
                pagerank_step(hg, state, dangling, damping)
                .observe(
                    obs,
                    F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
                    F.sum(F.when(F.col("inv_degree").isNull(), F.col("rank"))).alias("dang"),
                )
                .localCheckpoint(eager=True)
            )
            row = obs.get
            delta = float(row["delta"] or 0.0)
            dangling = float(row["dang"] or 0.0)
            state.unpersist()  # no-op for checkpoint frames; see LP loop note
            state = new.drop("_old")
            iterations = it + 1
            deltas.append(delta)
            if checkpoint_dir:
                write_snapshot(
                    state, checkpoint_dir, "pagerank", iterations,
                    {"op": "pagerank", "superstep": iterations, "l1_delta": delta},
                )
            if delta < tol:
                converged = True
                break
    return PageRankResult(
        ranks=state.select("vertex_id", "rank"),
        iterations=iterations,
        converged=converged,
        deltas=deltas,
    )


# backwards-compatible single-step API used by __spark_entry__'s
# fixed-iteration oracle query
def pagerank_iteration(
    hg: Hypergraph,
    ranks: DataFrame,
    inv_degree: DataFrame,
    damping: float,
) -> DataFrame:
    """One iteration from a bare (vertex_id, rank) frame.  Fully lazy
    and loop-safe: the dangling mass is a broadcast scalar subquery in
    the SAME plan (1-row aggregate cross-joined in), so composing k
    iterations costs zero driver actions."""
    state = ranks.join(inv_degree, "vertex_id", "left").select(
        "vertex_id", "rank", "inv_degree"
    )
    n = hg.num_vertices
    gathered = _walk_gather(hg, state)
    dang = state.agg(
        F.coalesce(
            F.sum(F.when(F.col("inv_degree").isNull(), F.col("rank"))), F.lit(0.0)
        ).alias("_dm")
    )
    return (
        state.join(gathered, "vertex_id", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "vertex_id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("_dm") / F.lit(float(n))
                + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))
            ).alias("rank"),
        )
    )


def ppr_state_init(hg: Hypergraph, seeds: list[int]) -> DataFrame:
    """(vertex_id, rank=s, inv_degree|null, s) where s is the restart
    vector: 1/|seeds| on seed vertices, 0 elsewhere.  The restart weight
    RIDES THE STATE (baked in once as a literal isin) so no per-iteration
    seed join or broadcast is needed."""
    if not seeds:
        raise ValueError("personalized pagerank needs a non-empty seed set")
    inv_degree = hg.incidence_by_vertex.groupBy("vertex_id").agg(
        (F.lit(1.0) / F.count("*")).alias("inv_degree")
    )
    s = (
        F.when(F.col("vertex_id").isin([int(x) for x in seeds]), 1.0 / len(seeds))
        .otherwise(0.0)
        .cast("double")
    )
    return hg.vertices().join(inv_degree, "vertex_id", "left").select(
        "vertex_id", s.alias("rank"), "inv_degree", s.alias("s")
    )


def ppr_step(
    hg: Hypergraph, state: DataFrame, dangling_mass: float, damping: float
) -> DataFrame:
    """One personalized power iteration: rank'(v) =
    (1-d + d*dangling_mass) * s(v) + d * gathered(v) — restart AND
    dangling mass both return to the seed distribution (standard PPR
    with dangling-to-restart semantics)."""
    gathered = _walk_gather(hg, state)
    coef = (1.0 - damping) + damping * dangling_mass
    return state.join(gathered, "vertex_id", "left").select(
        "vertex_id",
        (F.lit(coef) * F.col("s")
         + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))).alias("rank"),
        "inv_degree",
        "s",
        F.col("rank").alias("_old"),
    )


def personalized_pagerank(
    hg: Hypergraph,
    seeds: list[int],
    damping: float = 0.85,
    max_iterations: int = 100,
    tol: float = 1e-9,
) -> PageRankResult:
    """PPR to L1 delta < tol (same loop discipline as
    hypergraph_pagerank: one observe()-fused action per iteration,
    localCheckpoint lineage truncation, loop-scoped conf)."""
    obs0 = Observation("ppr_init")
    state = (
        ppr_state_init(hg, seeds)
        .observe(
            obs0,
            F.sum(F.when(F.col("inv_degree").isNull(), F.col("rank"))).alias("dang"),
        )
        .localCheckpoint(eager=True)
    )
    dangling = float(obs0.get["dang"] or 0.0)
    deltas: list[float] = []
    converged = False
    iterations = 0
    cores = hg.spark.sparkContext.defaultParallelism
    with loop_conf(hg.spark, loop_partitions(hg.count_incidence(), cores)):
        for it in range(max_iterations):
            obs = Observation(f"ppr_{it}")
            new = (
                ppr_step(hg, state, dangling, damping)
                .observe(
                    obs,
                    F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
                    F.sum(F.when(F.col("inv_degree").isNull(), F.col("rank"))).alias("dang"),
                )
                .localCheckpoint(eager=True)
            )
            row = obs.get
            delta = float(row["delta"] or 0.0)
            dangling = float(row["dang"] or 0.0)
            state.unpersist()  # no-op for checkpoint frames; see LP loop note
            state = new.drop("_old")
            iterations = it + 1
            deltas.append(delta)
            if delta < tol:
                converged = True
                break
    return PageRankResult(
        ranks=state.select("vertex_id", "rank"),
        iterations=iterations,
        converged=converged,
        deltas=deltas,
    )
