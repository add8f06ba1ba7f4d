"""k-truss of the co-occurrence graph (edge-level decomposition).

Definition (Cohen 2008): the k-truss is the maximal subgraph in which
every edge participates in >= k-2 triangles WITHIN the subgraph;
computed by iteratively deleting under-supported edges until a fixed
point (the edge-based analog of the k-core vertex peel).

Execution shape (mirrors operators/kcore.py::k_core):
- per round, edge support = |N(u) ∩ N(v)| over the ALIVE edge set via
  one wedge join + one semi-join (the triangle machinery, bounded by
  the same max_edge_size cap clique_expansion applies);
- observe()-fused survivor count rides the checkpoint — one action per
  round; loop-scoped conf; rounds = peeling-cascade depth.

The DuckDB twin is a recursive CTE carrying the alive EDGE set with the
same shrink guard as the kcore twin (plus one final outside filter for
the stop-on-stable edge case).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.triangles import clique_expansion
from hypergraph_gpu_label_propagation_spark.plans.tuning import loop_conf


@dataclass
class KTrussResult:
    membership: DataFrame  # (u, v, in_truss: int) — one row per co-occurrence edge
    iterations: int
    truss_size: int
    removed_per_iter: list[int] = field(default_factory=list)


def k_truss(
    hg: Hypergraph,
    k: int,
    max_iterations: int = 200,
    adj: DataFrame | None = None,
) -> KTrussResult:
    """Edges (u < v) of the k-truss of the co-occurrence graph.

    ``adj``: optional precomputed clique expansion (distinct u < v
    pairs, already materialized) — see triangle_count."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k-2 triangles per edge)")
    # distinct u < v
    base = clique_expansion(hg).localCheckpoint(eager=True) if adj is None else adj
    alive = base
    n_alive = alive.count()
    removed_per_iter: list[int] = []
    iterations = 0
    cores = hg.spark.sparkContext.defaultParallelism
    # partitions sized from the EXPANSION, not the incidence (the sf1
    # audit measured the wedge-heavy peel 12.7x at 10x data under the
    # incidence-sized conf — same spill mechanism as triangle_count;
    # see triangles.PAIRS_PER_PARTITION and BENCH_SCALING.md r05)
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        _wedge_partitions,
    )

    with loop_conf(hg.spark, _wedge_partitions(hg.spark, n_alive), adaptive=True):
        for _ in range(max_iterations):
            sym = alive.unionByName(
                alive.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            # wedge (u, v, w) with w ~ u, then keep w ~ v: support count
            wedge = alive.join(
                sym.select("u", F.col("v").alias("w")), "u"
            )
            tri = wedge.join(
                sym.select(F.col("u").alias("v"), F.col("v").alias("w")),
                ["v", "w"],
                "left_semi",
            )
            supp = tri.groupBy("u", "v").agg(F.count("*").alias("_c"))
            obs = Observation(f"ktruss_{iterations}")
            survivors = (
                alive.join(
                    supp.filter(F.col("_c") >= k - 2).select("u", "v"),
                    ["u", "v"],
                    "left_semi",
                )
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            n_new = int(obs.get["n"] or 0)
            if alive is not base:
                alive.unpersist()
            alive = survivors
            iterations += 1
            removed_per_iter.append(n_alive - n_new)
            stable = n_new == n_alive
            n_alive = n_new
            if stable or n_new == 0:
                break
    membership = base.join(
        alive.select("u", "v", F.lit(1).alias("_in")), ["u", "v"], "left"
    ).select("u", "v", F.coalesce("_in", F.lit(0)).cast("int").alias("in_truss"))
    return KTrussResult(
        membership=membership,
        iterations=iterations,
        truss_size=n_alive,
        removed_per_iter=removed_per_iter,
    )
