"""Triangle counting on the clique-expanded projection of the hypergraph
(north rule sibling algorithm; spec: standard triple-join / node-iterator
triangle enumeration, cf. Suri & Vassilvitskii 2011).

Clique expansion: undirected simple edge {u,v} iff u != v co-occur in at
least one hyperedge.  We orient every edge low->high (u < v) so each
triangle u<v<w is counted exactly once by the two-hop join:

  wedges(u,v,w)   = adj(u,v) JOIN adj(v,w)
  triangles       = wedges SEMI-JOIN adj ON (u,w)

Scale notes:
- clique expansion of a size-k hyperedge is O(k^2) pairs — a monorepo
  hyperedge with millions of files would explode, so ``max_edge_size``
  caps which hyperedges are expanded (the standard practice for motif
  counting on hypergraphs; document the cap in results);
- the pair-generation self-join runs on the edge-partitioned layout
  (co-partitioned on edge_id -> no extra shuffle);
- counting uses a semi-join, so no triangle materialization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.plans.tuning import loop_conf

# target adjacency PAIRS per shuffle partition for the wedge join: the
# wedge intermediate (sum of C(out-degree, 2)) inflates well past the
# pair count, so the divisor is tighter than the loops' 500k-rows rule.
# Sized by the r05 sf1 A/B (11.96M pairs, local[32]): 32 partitions
# 183.7 s (spill-bound), 128 partitions 24.6 s, 256 partitions 175.6 s
# (over-split) — ~100k pairs/partition is the sweet spot, and the same
# formula leaves sf0.1 (1.2M pairs) at its measured-best 32.
PAIRS_PER_PARTITION = 100_000

# r08 broadcast wedge pass (guide §2.4/§3.1): below this adjacency row
# count, both triangle joins broadcast the (u,v) pair set — the wedge
# intermediate (tens of millions of rows, the dominant exchange of the
# old plan) is then never shuffled at all; the whole count runs as one
# scan stage over the adjacency partitions.  16M pairs ≈ 256 MB raw /
# under 1 GB as a hashed relation — fine for this session's 16 GiB
# driver (local mode holds ONE copy); on a memory-tight cluster lower
# `spark.graft.triangles.broadcast.maxRows`.  Above the threshold the
# measured r05 shuffle shape (wedge-partitioned sort-merge + semi)
# runs unchanged.
TRIANGLES_BROADCAST_MAX_ROWS = 16_000_000


def _triangles_broadcast_rows(spark) -> int:
    try:
        return int(
            spark.conf.get(
                "spark.graft.triangles.broadcast.maxRows",
                str(TRIANGLES_BROADCAST_MAX_ROWS),
            )
        )
    except Exception:  # noqa: BLE001 — conservative: keep default
        return TRIANGLES_BROADCAST_MAX_ROWS


def _oriented_triangles(
    adj: DataFrame, n_pairs: int, max_id: int | None = None
) -> DataFrame:
    """(u, v, w) oriented triangle rows (u < v < w, each triangle once)
    — broadcast wedge shape when the pair set fits (see
    TRIANGLES_BROADCAST_MAX_ROWS), else the shuffle wedge join.

    ``max_id``: exclusive upper bound on vertex ids when the caller
    knows it (hg.num_vertices); below 2^31 the closing-edge key is
    packed into one long so the broadcast relation is a
    LongHashedRelation (cheaper build + probe) instead of a
    composite-key map."""
    spark = adj.sparkSession
    right = adj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    closing = adj.select(F.col("u"), F.col("v").alias("w"))
    if n_pairs <= _triangles_broadcast_rows(spark):
        wedges = adj.join(F.broadcast(right), "v")
        if max_id is not None and 0 < max_id < 2**31:
            # (u << 32) | w is injective for dense non-negative ids
            closing_packed = adj.select(
                (F.shiftleft(F.col("u"), 32) + F.col("v")).alias("_uw")
            )
            return (
                wedges.withColumn(
                    "_uw", F.shiftleft(F.col("u"), 32) + F.col("w")
                )
                .join(F.broadcast(closing_packed), "_uw", "left_semi")
                .drop("_uw")
            )
        return wedges.join(F.broadcast(closing), ["u", "w"], "left_semi")
    wedges = adj.join(right, "v")
    return wedges.join(closing, ["u", "w"], "left_semi")


def _wedge_partitions(spark, n_pairs: int) -> int:
    cores = spark.sparkContext.defaultParallelism
    return max(cores, min(8 * cores, math.ceil(n_pairs / PAIRS_PER_PARTITION)))


def clique_expansion(hg: Hypergraph, max_edge_size: int | None = None) -> DataFrame:
    """Distinct undirected pairs (u, v) with u < v sharing a hyperedge."""
    inc = hg.incidence_by_edge
    if max_edge_size is not None:
        ok = (
            inc.groupBy("edge_id")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") <= max_edge_size)
            .select("edge_id")
        )
        inc = inc.join(ok, "edge_id")
    a = inc.select("edge_id", F.col("vertex_id").alias("u"))
    b = inc.select("edge_id", F.col("vertex_id").alias("v"))
    return (
        a.join(b, "edge_id")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def triangle_count(
    hg: Hypergraph,
    max_edge_size: int | None = None,
    adj: DataFrame | None = None,
    n_pairs: int | None = None,
) -> DataFrame:
    """Single-row DataFrame (n_triangles: long).

    ``adj``: optional precomputed clique expansion (distinct u < v
    pairs, already materialized) — the whole co-occurrence family
    (triangles / coreness / k-truss / modularity) accepts it so one
    persisted expansion serves every member (bench builds it once).
    ``n_pairs``: optional row count of ``adj`` (skips one cheap scan of
    the materialized expansion); used to size the wedge join's shuffle
    partitions (see PAIRS_PER_PARTITION — the r05 sf1 audit caught the
    fixed session default going 7.5x spill-slow at 10x data).
    """
    # persist()+count(), not eager localCheckpoint: the round-4 A/B
    # (tools/ab_triangles.py, 4 alternating reps at sf0.1, min/median)
    # measured A=localCheckpoint 5.68/9.04s, B=persist+count 5.53/5.70s,
    # C=none 9.04/9.65s — persist wins and is far more noise-robust.
    # The 1-row result is materialized eagerly (inside the partition
    # scope — the conf must be live at action time) so adj can be
    # unpersisted before returning (no CacheManager entry outlives the
    # call).
    own = None
    if adj is None:
        own = clique_expansion(hg, max_edge_size).persist(StorageLevel.MEMORY_AND_DISK)
        n_pairs = own.count()
        adj = own
    elif n_pairs is None:
        n_pairs = adj.count()
    with loop_conf(hg.spark, _wedge_partitions(hg.spark, n_pairs), adaptive=True):
        tri = _oriented_triangles(adj, n_pairs, max_id=hg.num_vertices)  # u < v < w by construction
        out = tri.agg(F.count("*").alias("n_triangles")).localCheckpoint(eager=True)
    if own is not None:
        own.unpersist()
    return out


def per_vertex_triangle_count(
    hg: Hypergraph,
    max_edge_size: int | None = None,
    adj: DataFrame | None = None,
    n_pairs: int | None = None,
) -> DataFrame:
    """(vertex_id, n_triangles) — triangles incident to each vertex;
    degree-0 / triangle-free vertices get 0.  Partition sizing as in
    :func:`triangle_count`."""
    own = None
    if adj is None:
        own = clique_expansion(hg, max_edge_size).persist(StorageLevel.MEMORY_AND_DISK)
        n_pairs = own.count()
        adj = own
    elif n_pairs is None:
        n_pairs = adj.count()
    with loop_conf(hg.spark, _wedge_partitions(hg.spark, n_pairs), adaptive=True):
        tri = _oriented_triangles(adj, n_pairs, max_id=hg.num_vertices)
        per = (
            tri.select(F.explode(F.array("u", "v", "w")).alias("vertex_id"))
            .groupBy("vertex_id")
            .agg(F.count("*").alias("cnt"))
        )
        out = (
            hg.vertices().join(per, "vertex_id", "left").select(
                "vertex_id",
                F.coalesce("cnt", F.lit(0)).cast("long").alias("n_triangles"),
            )
            .localCheckpoint(eager=True)  # vertex-sized — materialize in-scope
        )
    if own is not None:
        own.unpersist()
    return out


def modularity(hg, labels, adj: DataFrame | None = None):
    """Newman modularity of a vertex labeling on the clique-expanded
    co-occurrence graph: Q = sum_c [ e_c/m - (d_c/(2m))^2 ] with e_c =
    intra-community edges, d_c = total degree of community c, m = total
    edges.  One lazy plan (the edge count rides as a one-row frame, no
    driver collect), so it composes into contract queries and pipelines.

    ``labels``: (vertex_id, label) one row per vertex (e.g. LP output).
    Returns a one-row DataFrame (modularity: double).
    """
    from pyspark.sql import functions as F

    if adj is None:
        adj = clique_expansion(hg)  # distinct u < v pairs
    m = adj.agg(F.count("*").cast("double").alias("m"))
    deg = (
        adj.select(F.col("u").alias("x"))
        .unionAll(adj.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("double").alias("d"))
    )
    la = labels.select(F.col("vertex_id").alias("u"), F.col("label").alias("_la"))
    lb = labels.select(F.col("vertex_id").alias("v"), F.col("label").alias("_lb"))
    intra = (
        adj.join(la, "u").join(lb, "v")
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count("*").cast("double").alias("e"))
    )
    dc = (
        labels.join(deg, labels.vertex_id == deg.x)
        .groupBy("label")
        .agg(F.sum("d").alias("dsum"))
    )
    per_label = dc.join(intra, "label", "left").crossJoin(m).select(
        (F.coalesce("e", F.lit(0.0)) / F.col("m")
         - F.pow(F.col("dsum") / (2 * F.col("m")), 2)).alias("q")
    )
    return per_label.agg(F.round(F.sum("q"), 6).alias("modularity"))
