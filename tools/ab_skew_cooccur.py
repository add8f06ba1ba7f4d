"""Skew evidence for the co-occurrence family (r05 verdict #7).

freeze(salt=N) covers LP/CC/PageRank; triangles/coreness/ktruss rely on
the ``max_edge_size`` cap + partial aggregation.  This harness MEASURES
that defense on a doubly-skewed kernel (generated in /tmp, derived from
nothing external):

- one "monorepo" hyperedge with HOT_EDGE members — clique expansion of
  that single edge alone is C(HOT_EDGE, 2) pairs, the quadratic blowup
  the cap exists to bound;
- one "everywhere-file" vertex incident to HOT_VERTEX edges — its
  expanded adjacency is a hot join/groupBy key for coreness rounds;
- remainder k=5 uniform.

A/B:
  A. clique_expansion WITHOUT cap  — timed pair count (the blowup).
  B. clique_expansion WITH cap     — same, hot edge excluded.
  C. triangle_count + coreness over the capped expansion with the hot
     VERTEX still present — the partial-agg/histogram-window defense.

Usage: python tools/ab_skew_cooccur.py [hot_edge] [hot_vertex] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.kcore import coreness
from hypergraph_gpu_label_propagation_spark.operators.triangles import (
    clique_expansion,
    triangle_count,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark

PATH = "/tmp/skew_cooccur_kernel.parquet"


def build_kernel(spark, hot_edge: int, hot_vertex: int, nv: int, n_edges: int):
    """Deterministic doubly-skewed incidence: edge 0 = monorepo edge,
    vertex 0 = everywhere-file, the rest hash-uniform k=5."""
    hub = spark.range(hot_edge).select(
        F.lit(0).cast("long").alias("edge_id"), F.col("id").alias("vertex_id")
    )
    ever = spark.range(1, hot_vertex + 1).select(
        F.col("id").alias("edge_id"), F.lit(0).cast("long").alias("vertex_id")
    )
    rest = spark.range(5 * n_edges).select(
        (F.lit(hot_vertex + 1) + (F.col("id") / 5).cast("long")).alias("edge_id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(nv)).alias("vertex_id"),
    )
    inc = hub.unionByName(ever).unionByName(rest).distinct()
    inc.write.mode("overwrite").parquet(PATH)
    return spark.read.parquet(PATH)


def main() -> None:
    hot_edge = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    hot_vertex = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_skew_cooccur", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    inc = build_kernel(spark, hot_edge, hot_vertex, nv=200_000, n_edges=400_000)
    n = inc.count()
    print(f"# kernel rows: {n}", file=sys.stderr)
    hg = Hypergraph.freeze(spark, inc)

    out: dict[str, list] = {"expand_nocap": [], "expand_cap": [],
                            "triangles_cap": [], "coreness_cap": []}
    for rep in range(reps):
        t0 = time.monotonic()
        pairs_nocap = clique_expansion(hg).count()
        out["expand_nocap"].append(round(time.monotonic() - t0, 2))

        t0 = time.monotonic()
        adj = clique_expansion(hg, max_edge_size=1000).localCheckpoint(eager=True)
        pairs_cap = adj.count()
        out["expand_cap"].append(round(time.monotonic() - t0, 2))

        t0 = time.monotonic()
        tri = triangle_count(hg, adj=adj).collect()[0][0]
        out["triangles_cap"].append(round(time.monotonic() - t0, 2))

        t0 = time.monotonic()
        cres = coreness(hg, adj=adj)
        cres.coreness.write.format("noop").mode("overwrite").save()
        out["coreness_cap"].append(round(time.monotonic() - t0, 2))
        print(json.dumps({"rep": rep, **{k: v[-1] for k, v in out.items()},
                          "pairs_nocap": pairs_nocap, "pairs_cap": pairs_cap,
                          "triangles": tri, "coreness_iters": cres.iterations}))
    print(json.dumps({
        "summary": {k: {"min": min(v), "med": sorted(v)[len(v) // 2]}
                    for k, v in out.items()},
        "hot_edge": hot_edge, "hot_vertex": hot_vertex, "rows": n,
    }))


if __name__ == "__main__":
    main()
