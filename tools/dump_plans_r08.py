"""Dump `.explain("formatted")` for every query/operator the r08
optimization round touches, into plans/r08/<name>_<tag>.txt.

Usage: python tools/dump_plans_r08.py before|after [sf_dir]

For iterative operators (LP / CC / PageRank / coreness) the captured
plan is ONE superstep/round frame — the loop repeats the same shape, so
the per-round Exchange count is the claim being pinned.  hg_freeze and
lp_bucketed_build are write/materialize paths; for those the captured
plan is the frame that gets materialized (the Exchange/scan structure is
what the optimization changes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.plans.inspect import explain_str
from hypergraph_gpu_label_propagation_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans_r08")

    def dump(name: str, df) -> None:
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")

    from hypergraph_gpu_label_propagation_spark.operators.components import cc_superstep
    from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
        lp_superstep,
    )
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        pagerank_state_init,
        pagerank_step,
    )
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        clique_expansion,
        triangle_count,
    )
    from hypergraph_gpu_label_propagation_spark.plans.tuning import loop_conf, loop_partitions

    incidence = entrymod._incidence(spark, sf_dir)
    hg = Hypergraph.freeze(spark, incidence)
    cores = spark.sparkContext.defaultParallelism
    n_part = loop_partitions(hg.count_incidence(), cores)

    # hg_freeze: the two layout frames that freeze() materializes
    dump("hg_freeze_by_vertex", hg.incidence_by_vertex)
    dump("hg_freeze_by_edge", hg.incidence_by_edge)

    labels0 = entrymod._labels0(spark, hg.num_vertices).localCheckpoint(eager=True)
    with loop_conf(spark, n_part):
        # steady-state superstep (labels_in_range=True is every superstep
        # after the first inside label_propagation)
        dump("lp_superstep", lp_superstep(hg, labels0, 10, labels_in_range=True))
        comp0 = hg.vertices().select(
            "vertex_id", F.col("vertex_id").alias("component")
        ).localCheckpoint(eager=True)
        dump("connected_components", cc_superstep(hg, comp0))
        pr0 = pagerank_state_init(hg).localCheckpoint(eager=True)
        dump("pagerank_converged", pagerank_step(hg, pr0, 0.0, 0.85))

    # coreness: one full arr sweep + round merge (the loop body shape).
    from hypergraph_gpu_label_propagation_spark.operators import kcore as kcore_mod

    half = clique_expansion(hg).localCheckpoint(eager=True)
    if hasattr(kcore_mod, "coreness_round_frame"):
        round_frame = kcore_mod.coreness_round_frame(hg, half, n_part)
    else:
        # round-start tree (before the r08 refactor): replicate the
        # default arr/fused-4 round shape inline, byte-for-byte the
        # loop body of coreness() at r07
        from pyspark.sql import Window

        sym = half.unionByName(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).localCheckpoint(eager=True)
        adj = sym.repartition(n_part, "v").localCheckpoint(eager=True)
        state = (
            adj.groupBy("u")
            .agg(F.count("*").cast("int").alias("c"))
            .localCheckpoint(eager=True)
        )
        cur = state
        for _ in range(4):
            nb = adj.join(
                cur.select(F.col("u").alias("v"), "c").hint("shuffle_hash"), "v"
            ).select("u", "c")
            arr = nb.groupBy("u").agg(
                F.sort_array(F.collect_list("c"), asc=False).alias("_a")
            )
            cur = arr.select(
                "u",
                F.size(F.filter("_a", lambda x, i: x >= i + F.lit(1)))
                .cast("int").alias("c"),
            )
        round_frame = (
            state.select("u", F.col("c").alias("_c0"))
            .join(cur.hint("shuffle_hash"), "u")
            .select(
                "u", "c", "_c0",
                (F.col("c") != F.col("_c0")).cast("int").alias("_ch"),
            )
        )
    dump("coreness_round", round_frame)

    # triangle_count over the shared adjacency (bench shape): capture
    # the PRE-materialization agg plan (triangle_count() itself returns
    # a localCheckpointed one-row frame whose plan is just the scan)
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        _wedge_partitions,
    )

    from hypergraph_gpu_label_propagation_spark.operators import triangles as tri_mod

    adj = half
    n_pairs = adj.count()
    with loop_conf(spark, _wedge_partitions(spark, n_pairs), adaptive=True):
        if hasattr(tri_mod, "_oriented_triangles"):
            tri = tri_mod._oriented_triangles(adj, n_pairs)
        else:
            # round-start tree: the r07 shuffle wedge shape
            wedges = adj.join(
                adj.select(F.col("u").alias("v"), F.col("v").alias("w")), "v"
            )
            tri = wedges.join(
                adj.select(F.col("u"), F.col("v").alias("w")), ["u", "w"], "left_semi"
            )
        dump("triangle_count", tri.agg(F.count("*").alias("n_triangles")))

    # one-shot board entries
    dump("graph_profile", entrymod.q_graph_profile(spark, sf_dir))
    dump("minhash_lsh", entrymod.q_minhash_lsh(spark, sf_dir))
    dump("simhash", entrymod.q_simhash(spark, sf_dir))
    dump("embedding_near_dup", entrymod.q_embedding_near_dup(spark, sf_dir))
    dump("source_files_hypergraph", entrymod.q_source_files_hypergraph(spark, sf_dir))
    dump("ann_topk", entrymod.q_ann_topk(spark, sf_dir))
    dump("text_profile", entrymod.q_text_profile(spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
