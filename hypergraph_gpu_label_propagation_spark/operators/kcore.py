"""k-core of the hypergraph's co-occurrence graph (iterative peeling).

Definition (standard k-core, cf. Batagelj & Zaversnik 2003): on the
clique-expanded co-occurrence graph (u ~ v iff they share a hyperedge,
operators/triangles.clique_expansion), repeatedly remove vertices with
fewer than k alive neighbors until a fixed point; the survivors are the
k-core.  Output covers every vertex with an ``in_core`` flag so the
result has a stable one-row-per-vertex shape.

Execution shape (same discipline as LP/CC, label_propagation.py):
- adjacency built once, localCheckpointed (GC-reclaimed);
- per round: one degree aggregation over alive edges + one semi-join —
  both algebraic/narrow, skew absorbed by partial aggregation;
- one observe()-fused action per round (removed-count rides the
  checkpoint job); loop-scoped conf via plans/tuning.py;
- O(rounds) = O(peeling depth), each round strictly shrinks or stops.

The DuckDB oracle twin replicates the peel as a recursive CTE carrying
the alive set, emitting the next round only while the alive count still
shrinks (same guard pattern as the pagerank_converged twin).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.triangles import clique_expansion
from hypergraph_gpu_label_propagation_spark.plans.tuning import loop_conf, loop_partitions


@dataclass
class KCoreResult:
    membership: DataFrame  # (vertex_id, in_core: int)
    iterations: int
    core_size: int
    removed_per_iter: list[int] = field(default_factory=list)


def k_core(hg: Hypergraph, k: int, max_iterations: int = 200) -> KCoreResult:
    """Vertices of the k-core of the co-occurrence graph."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # symmetric adjacency (both directions) so degree = neighbor count
    half = clique_expansion(hg)
    adj = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)

    alive = adj.select("u").distinct().localCheckpoint(eager=True)
    n_alive = alive.count()
    removed_per_iter: list[int] = []
    iterations = 0
    cores = hg.spark.sparkContext.defaultParallelism
    with loop_conf(hg.spark, loop_partitions(hg.count_incidence(), cores)):
        for _ in range(max_iterations):
            deg = (
                adj.join(alive, "u")
                .join(alive.select(F.col("u").alias("v")), "v")
                .groupBy("u")
                .agg(F.count("*").alias("_d"))
            )
            obs = Observation(f"kcore_{iterations}")
            survivors = (
                alive.join(deg.filter(F.col("_d") >= k).select("u"), "u", "left_semi")
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            n_alive_new = int(obs.get["n"] or 0)
            alive.unpersist()
            alive = survivors
            iterations += 1
            removed_per_iter.append(n_alive - n_alive_new)
            stable = n_alive_new == n_alive
            n_alive = n_alive_new
            if stable or n_alive_new == 0:
                break
    membership = (
        hg.vertices()
        .join(alive.select(F.col("u").alias("vertex_id"), F.lit(1).alias("_in")), "vertex_id", "left")
        .select("vertex_id", F.coalesce("_in", F.lit(0)).cast("int").alias("in_core"))
    )
    core_size = int(membership.agg(F.sum("in_core")).collect()[0][0] or 0)
    return KCoreResult(
        membership=membership,
        iterations=iterations,
        core_size=core_size,
        removed_per_iter=removed_per_iter,
    )
