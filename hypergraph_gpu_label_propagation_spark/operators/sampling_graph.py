"""Deterministic neighborhood sampling over the hypergraph — the
GNN-training data-prep operator (GraphSAGE-style fanout sampling,
Hamilton et al. 2017, adapted to the bipartite incidence layout).

One hop = two half-hops on the incidence table:
  vertex --(sample <= fanout_edges incident edges)--> edge
        --(sample <= fanout_members members)--> vertex

Selection is HASH-RANKED, not rand(): within each (frontier vertex)
group, incident edges are ranked by ``h60(seed:hop:v:e)`` and the top
``fanout`` kept (same primitive as the generators), so the sample is a
pure function of (graph, seeds, fanouts, seed) — reproducible across
runs, engines, partitionings, and task retries, which is what a
training pipeline needs from "random" sampling.

Scale shape: each half-hop is one join against the frozen layout plus
one window partitioned by the frontier key (bounded by the fanout
cap after ranking); frontier frames stay one-row-per-(seed, vertex).
No collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.dedup import h60


_H60_SPACE = 1 << 60  # h60 values are uniform in [0, 2^60)


def _ranked_top(
    df: DataFrame,
    part_cols: list[str],
    rank_expr,
    k: int,
    tie_col: str,
    alpha: int = 8,
) -> DataFrame:
    """Exact top-``k`` rows per ``part_cols`` group ordered by
    ``(rank_expr, tie_col)`` — the tie column makes the kept set a pure
    function of the data even on a (2^-60-rare) hash collision, instead
    of partition-order-dependent (r04 advice).

    Hot-key bound (r04 verdict #5): a 10^6-degree vertex must not
    single-task-sort its whole incidence in the row_number window, so
    candidates are PRE-FILTERED by a rank-hash threshold before the
    window: a group of ``gsz`` rows keeps rows with
    ``h < (2^60 // gsz) * alpha * k`` — in expectation ~``alpha*k``
    survivors, and EXACTLY the right answer because (a) every excluded
    row hashes above every survivor, so if >= k rows survive the true
    top-k is inside the survivor set, and (b) groups where fewer than
    ``min(k, gsz)`` survive (Chernoff-tail rare at alpha=8) fall back
    to the full window.  All integer arithmetic — no FP boundary
    ambiguity; groups with ``gsz <= alpha*k`` skip the filter (and the
    threshold product then always fits in int64).  The group sizes ride
    one partially-aggregated groupBy, so no single task ever holds a
    hot group before the filter."""
    order = [F.col("_h").asc(), F.col(tie_col).asc()]
    # materialize the hashed candidate set ONCE: sizes/survivors/fallback
    # all branch off this frame, and without the checkpoint each branch
    # would recompute the upstream join — multiplicatively per hop in
    # sample_neighborhood (the multi-reference lineage blowup the LP
    # loop's per-superstep checkpoint exists to prevent)
    base = df.withColumn("_h", rank_expr).localCheckpoint(eager=True)
    sizes = base.groupBy(*part_cols).agg(F.count("*").alias("_gsz"))
    cand = base.join(sizes, part_cols)
    keep_all = F.col("_gsz") <= alpha * k
    # integer `div` (not `/`, which is DOUBLE division in Spark) so the
    # threshold really is the integer arithmetic the docstring promises
    # (r05 advice) — exactness never depended on the exact value (the
    # shortfall fallback covers any threshold), but keeping it integral
    # means future edits may rely on the stated bound literally
    thr = F.expr(f"CAST({_H60_SPACE} AS BIGINT) div _gsz") * (alpha * k)
    surv = cand.filter(keep_all | (F.col("_h") < thr))
    scnt = surv.groupBy(*part_cols).agg(F.count("*").alias("_scnt"))
    short = (
        sizes.join(scnt, part_cols, "left")
        .filter(
            (F.coalesce("_scnt", F.lit(0)) < k)
            & (F.coalesce("_scnt", F.lit(0)) < F.col("_gsz"))
        )
        .select(*part_cols)
    )
    pool = surv.join(short, part_cols, "left_anti").unionByName(
        cand.join(short, part_cols, "left_semi")
    )
    w = Window.partitionBy(*part_cols).orderBy(*order)
    return (
        pool.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_h", "_gsz")
    )


def sample_neighborhood(
    hg: Hypergraph,
    seeds: DataFrame,
    fanouts: list[tuple[int, int]],
    seed: int = 42,
) -> DataFrame:
    """Multi-hop sampled neighborhood for every seed vertex.

    ``seeds``: (seed_id: long) one row per sampling root (a vertex id).
    ``fanouts``: per hop, (fanout_edges, fanout_members) — at most
    fanout_edges incident hyperedges per frontier vertex, at most
    fanout_members members per chosen hyperedge.

    Returns (seed_id, hop, edge_id, vertex_id): the sampled incidence
    rows per seed per hop (hop is 1-based; a vertex reached in an
    earlier hop can re-appear in later hops — standard GraphSAGE
    semantics, dedup with .distinct() if a set is wanted).
    """
    if not fanouts:
        raise ValueError("fanouts must name at least one hop")
    frontier = seeds.select(
        F.col("seed_id").cast("long").alias("seed_id"),
        F.col("seed_id").cast("long").alias("vertex_id"),
    ).distinct()
    out = None
    for hop, (f_e, f_v) in enumerate(fanouts, start=1):
        if f_e < 1 or f_v < 1:
            raise ValueError(f"hop {hop}: fanouts must be >= 1")
        pre = f"{seed}:{hop}"
        # half-hop 1: sample <= f_e incident edges per frontier vertex
        cand_e = hg.incidence_by_vertex.join(frontier, "vertex_id").select(
            "seed_id", "vertex_id", "edge_id"
        )
        rank_e = h60(
            F.concat_ws(":", F.lit(pre + ":e"), "seed_id", "vertex_id", "edge_id")
        )
        picked_e = _ranked_top(cand_e, ["seed_id", "vertex_id"], rank_e, f_e, "edge_id").select(
            "seed_id", "edge_id"
        ).distinct()
        # half-hop 2: sample <= f_v members per chosen (seed, edge)
        cand_v = hg.incidence_by_edge.join(picked_e, "edge_id").select(
            "seed_id", "edge_id", "vertex_id"
        )
        rank_v = h60(
            F.concat_ws(":", F.lit(pre + ":v"), "seed_id", "edge_id", "vertex_id")
        )
        picked_v = _ranked_top(cand_v, ["seed_id", "edge_id"], rank_v, f_v, "vertex_id")
        hop_rows = picked_v.select(
            "seed_id", F.lit(hop).cast("int").alias("hop"), "edge_id", "vertex_id"
        )
        out = hop_rows if out is None else out.unionByName(hop_rows)
        frontier = picked_v.select("seed_id", "vertex_id").distinct()
    return out


def induced_subgraph(
    hg: Hypergraph, vertices: DataFrame, min_edge_size: int = 2
) -> DataFrame:
    """Incidence of the subgraph induced by ``vertices`` (vertex_id
    rows): keep incidence rows whose vertex is in the set, then drop
    hyperedges with fewer than ``min_edge_size`` surviving members
    (a 1-member hyperedge carries no propagation signal).  Two
    semi-join/filter passes, no collect — the step between
    :func:`sample_neighborhood` and training-batch export."""
    vs = vertices.select(F.col("vertex_id").cast("long")).distinct()
    kept = hg.incidence_by_vertex.join(vs, "vertex_id", "left_semi")
    ok_edges = (
        kept.groupBy("edge_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_edge_size)
        .select("edge_id")
    )
    return kept.join(ok_edges, "edge_id", "left_semi").select("edge_id", "vertex_id")


def random_walks(
    hg: Hypergraph,
    seeds: DataFrame,
    walk_length: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic hypergraph random walks (DeepWalk/node2vec-style
    corpus generation, Perozzi et al. 2014): from each seed vertex take
    ``walk_length`` steps of the two-step walk (uniform incident edge,
    then uniform member), with BOTH choices hash-ranked on
    (seed, walk position) — the walk corpus is a pure function of
    (graph, seeds, length, seed), reproducible across engines/retries.

    Returns (seed_id, step, vertex_id): step 0 is the seed itself.  A
    walk that reaches an isolated vertex stops (no self-padding).
    Each step is two joins against the frozen layouts + two
    first-choice windows partitioned by walk id — no collect, no
    Python, O(walk_length) supersteps like the LP loop.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    cur = seeds.select(
        F.col("seed_id").cast("long").alias("seed_id"),
        F.col("seed_id").cast("long").alias("vertex_id"),
    ).distinct()
    out = cur.select("seed_id", F.lit(0).cast("int").alias("step"), "vertex_id")
    for step in range(1, walk_length + 1):
        pre = f"{seed}:w{step}"
        # choose ONE incident edge per walk (min hash = uniform choice)
        e_rank = h60(F.concat_ws(":", F.lit(pre + ":e"), "seed_id", "edge_id"))
        picked_e = _ranked_top(
            hg.incidence_by_vertex.join(cur, "vertex_id").select("seed_id", "edge_id"),
            ["seed_id"], e_rank, 1, "edge_id",
        )
        # choose ONE member of that edge
        v_rank = h60(F.concat_ws(":", F.lit(pre + ":v"), "seed_id", "vertex_id"))
        cur = _ranked_top(
            hg.incidence_by_edge.join(picked_e, "edge_id").select(
                "seed_id", "vertex_id"
            ),
            ["seed_id"], v_rank, 1, "vertex_id",
        ).localCheckpoint(eager=True)  # O(1) plan depth, like the LP loop
        out = out.unionByName(
            cur.select("seed_id", F.lit(step).cast("int").alias("step"), "vertex_id")
        )
    return out
