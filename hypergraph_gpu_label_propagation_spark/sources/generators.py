"""Random hypergraph generators (reference src/common/hypergraph.cpp:91-285).

The reference draws from a single mt19937 stream, which is inherently
sequential; we replicate the *distributional* semantics with
partition-parallel, seed-deterministic generation (SURVEY.md section
2.3).  Results are identical at any partition count — the Spark analog
of the reference's seeded reproducibility (README.md:55-60).

G1/G2 (uniform/fixed) use a **hash-ranked sampler** built entirely from
column expressions (zero Python in the path): per edge,
``k = min + h60(seed:k:e) % span`` and the members are the first ``k``
distinct candidates ranked by an independent hash
``h60(seed:r:e:v)``.  Candidates are either ALL vertices (when
``num_vertices`` fits the candidate window — exact uniform k-subset) or
``4*max_edge_size + 32`` hash-drawn slots ``h60(seed:c:e:s) % V``
(i.i.d. uniform draws; conditioned on the distinct set, the
independent rank-hash again picks a uniform k-subset).  The shortfall
probability (fewer than ``k`` distinct among the window draws when
``V > window``) is bounded by ``C(W,2)^(W-k+1) / V^(W-k+1)`` —
astronomically small for ``W >= 4k``.  Because every step is md5
arithmetic, the DuckDB oracle reproduces the generator EXACTLY
(``__spark_entry__._sql_gen_uniform``), and generation throughput is
JVM-bound rather than per-edge-Python-rng-bound.

Planted/hSBM keep the Arrow ``mapInPandas`` per-edge rng (their
rejection/top-up logic is control-flow heavy); they remain pure
functions of ``(seed, edge_id)``.

Generators:
- uniform:  per edge k ~ U[min,max] (>=2), k distinct vertices uniform
  without replacement (hypergraph.cpp:129-145);
- fixed:    d-uniform Erdos-Renyi, all edges exactly edge_size
  (hypergraph.cpp:147-160);
- planted:  community(v) = v % C; with prob p_intra pick a size-weighted
  community and sample inside it, topping up from outside when the
  community is smaller than k; else uniform global sample
  (hypergraph.cpp:163-227);
- hsbm:     rejection sampling — uniform k-set accepted w.p. p_intra if
  monochromatic (all members same community) else p_inter
  (hypergraph.cpp:238-285); Spark form generates surplus candidates and
  keeps the first num_edges accepted in candidate order (stable, so
  deterministic);
- random_labels: label ~ U[0, classes) per vertex from a separate
  label_seed (hypergraph.cpp:229-236).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

INC_SCHEMA = "edge_id long, vertex_id long"


def _edge_rng(seed: int, edge_id: int, tag: int = 0) -> np.random.Generator:
    return np.random.default_rng([seed, tag, edge_id])


def _sample_distinct(rng: np.random.Generator, population: int, k: int) -> np.ndarray:
    k = min(k, population)
    return rng.choice(population, size=k, replace=False)


def candidate_window(max_edge_size: int) -> int:
    """Candidate-slot count for the hash-ranked sampler; shared with the
    DuckDB twin so both engines draw the identical candidate sets."""
    return 4 * max_edge_size + 32


def uniform_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    min_edge_size: int = 2,
    max_edge_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Hash-ranked uniform sampler — pure column expressions, exact
    SQL twin (see module docstring).  k ~ U[min,max] per edge, members
    distinct (k capped at num_vertices, hypergraph.cpp:129-145)."""
    if min_edge_size < 2 or max_edge_size < min_edge_size:
        raise ValueError("edge size bounds invalid (reference hypergraph.cpp:130-133)")
    from hypergraph_gpu_label_propagation_spark.operators.dedup import h60

    span = max_edge_size - min_edge_size + 1
    window = candidate_window(max_edge_size)
    eid = F.col("edge_id").cast("string")
    k = (
        F.lit(min_edge_size)
        + F.pmod(h60(F.concat(F.lit(f"{seed}:k:"), eid)), F.lit(span))
    ).cast("int")
    if num_vertices <= window:
        n_slots, cand = num_vertices, F.col("slot").cast("long")
    else:
        n_slots = window
        cand = F.pmod(
            h60(F.concat(F.lit(f"{seed}:c:"), eid, F.lit(":"), F.col("slot").cast("string"))),
            F.lit(num_vertices),
        )
    cands = (
        spark.range(num_edges)
        .select(F.col("id").alias("edge_id"), k.alias("k"))
        .select(
            "edge_id", "k",
            F.explode(F.sequence(F.lit(0), F.lit(n_slots - 1))).alias("slot"),
        )
        .select("edge_id", "k", cand.alias("vertex_id"))
        .distinct()  # k is functionally dependent on edge_id
    )
    rank_h = h60(
        F.concat(F.lit(f"{seed}:r:"), eid, F.lit(":"), F.col("vertex_id").cast("string"))
    )
    # per-edge window over <= max(window, num_vertices) rows — bounded,
    # partitioned by edge_id, so it parallelizes across edges at any scale
    w = Window.partitionBy("edge_id").orderBy(rank_h.asc(), F.col("vertex_id").asc())
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("k"))
        .select("edge_id", "vertex_id")
    )


def fixed_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    edge_size: int = 4,
    seed: int = 42,
) -> DataFrame:
    return uniform_hypergraph(spark, num_vertices, num_edges, edge_size, edge_size, seed)


def planted_partition_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    communities: int = 8,
    p_intra: float = 0.85,
    min_edge_size: int = 2,
    max_edge_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """community(v) = v % communities (hypergraph.cpp:178-179).  Members
    of community c are the arithmetic progression c, c+C, c+2C, ... so
    in-community sampling needs no materialized pool."""
    C = communities

    def comm_size(c: int) -> int:
        return (num_vertices - c + C - 1) // C

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            eids, vids = [], []
            for e in pdf["id"].to_numpy():
                rng = _edge_rng(seed, int(e))
                k = int(rng.integers(min_edge_size, max_edge_size + 1))
                if rng.random() < p_intra:
                    # size-weighted community pick = community of a uniform vertex
                    c = int(rng.integers(0, num_vertices)) % C
                    size_c = comm_size(c)
                    take = min(k, size_c)
                    inside = rng.choice(size_c, size=take, replace=False) * C + c
                    members = inside
                    if take < k:  # top up from outside (hypergraph.cpp:206-217)
                        outside_pop = num_vertices - size_c
                        extra_idx = rng.choice(outside_pop, size=k - take, replace=False)
                        # map index over non-community vertices to vertex ids
                        extras = []
                        for x in extra_idx:
                            # x-th vertex whose id % C != c
                            block, off = divmod(int(x), C - 1)
                            vid = block * C + (off if off < c else off + 1)
                            extras.append(vid)
                        members = np.concatenate([inside, np.array(extras, dtype=np.int64)])
                else:
                    members = _sample_distinct(rng, num_vertices, k)
                eids.extend([int(e)] * len(members))
                vids.extend(np.asarray(members, dtype=np.int64).tolist())
            yield pd.DataFrame({"edge_id": eids, "vertex_id": vids})

    return spark.range(num_edges).mapInPandas(gen, INC_SCHEMA)


def hsbm_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    communities: int = 8,
    p_intra: float = 0.9,
    p_inter: float = 0.05,
    min_edge_size: int = 3,
    max_edge_size: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Rejection sampling (hypergraph.cpp:238-285): keep the first
    ``num_edges`` accepted candidates in candidate order, re-numbered
    densely.  The driver doubles the candidate pool until enough accept
    (the reference instead aborts after max(20m, 1000) attempts)."""
    C = communities

    def accepted(candidates: int) -> DataFrame:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                cids, eids, vids = [], [], []
                for cand in pdf["id"].to_numpy():
                    rng = _edge_rng(seed, int(cand), tag=1)
                    k = int(rng.integers(min_edge_size, max_edge_size + 1))
                    members = _sample_distinct(rng, num_vertices, k)
                    mono = len(set(int(v) % C for v in members)) == 1
                    p = p_intra if mono else p_inter
                    if rng.random() < p:
                        cids.extend([int(cand)] * len(members))
                        vids.extend(members.tolist())
                yield pd.DataFrame({"cand_id": cids, "vertex_id": vids})

        return spark.range(candidates).mapInPandas(gen, "cand_id long, vertex_id long")

    n_cand = max(4 * num_edges, 1000)
    n_acc = 0
    for _ in range(8):
        acc = accepted(n_cand)
        n_acc = acc.select("cand_id").distinct().count()
        if n_acc >= num_edges:
            break
        n_cand *= 2
    if n_acc < num_edges:
        # mirror the reference's failure behavior (hypergraph.cpp:238-285
        # aborts after max(20m, 1000) rejected attempts) instead of silently
        # returning a smaller hypergraph than requested
        raise RuntimeError(
            f"hsbm_hypergraph: only {n_acc}/{num_edges} hyperedges accepted after "
            f"8 candidate-pool doublings ({n_cand} candidates); raise p_intra/p_inter "
            "or lower num_edges"
        )
    # dense renumbering WITHOUT a single-partition global window: the
    # two-step range-partitioned rank (sources/source_files.py::dense_ids
    # — per-range row_number + broadcast cumulative offsets) assigns the
    # same ids as ROW_NUMBER() OVER (ORDER BY cand_id) at any scale
    from hypergraph_gpu_label_propagation_spark.sources.source_files import dense_ids

    kept = dense_ids(acc.select("cand_id").distinct(), ["cand_id"], "edge_id").filter(
        F.col("edge_id") < num_edges
    )
    return acc.join(kept, "cand_id").select("edge_id", "vertex_id")


def random_labels(
    spark: SparkSession, num_vertices: int, classes: int, label_seed: int = 42
) -> DataFrame:
    """label ~ U[0, classes) per vertex (hypergraph.cpp:229-236), as a
    pure column expression — no Python in the path."""
    return spark.range(num_vertices).select(
        F.col("id").alias("vertex_id"),
        F.pmod(F.xxhash64("id", F.lit(label_seed)), F.lit(classes)).cast("int").alias("label"),
    )
