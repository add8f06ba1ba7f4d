"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "lp": {...supersteps/sec, edges/sec...}}

The per-query timings include plan construction + execution to a
collected result (the driver-visible latency).  LP throughput metrics
(supersteps/sec, edges-processed/sec to convergence) implement
BASELINE.json's metric; tools/bench_scaling.py runs this file at two
parallelism levels for the N->4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Observation
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.label_propagation import label_propagation
from hypergraph_gpu_label_propagation_spark.session import get_spark

HEADLINE = [
    "lp_superstep",
    "lp_converged",
    "lp_converged_bucketed",
    "coreness",
    "pagerank_converged",
    "connected_components",
    "triangle_count",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "embedding_near_dup",
    "text_quality",
    "agg_pushdown",
    "events_stream",
    "events_user_stats",
    "graph_profile",
    "source_files_hypergraph",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus)

    queries = entrymod.queries()
    # untimed session warm-up: C2 JIT + codegen cold-start otherwise
    # lands entirely on whichever query runs first (in r02 lp_superstep
    # absorbed ~10 s of it, reading as a per-query regression).  Warm
    # with the superstep path itself — freeze, joins, aggs, windows.
    queries["lp_superstep"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        # noop sink materializes EVERY column of every row (a bare count
        # would let Catalyst prune columns and flatter the timing); the
        # row count rides the same job via observe()
        obs = Observation(f"bench_{name}")
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
            "overwrite"
        ).save()
        n = obs.get["n"]
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # LP throughput to convergence (BASELINE.json metric): supersteps/sec
    # and edges-processed/sec (each superstep touches every incidence row
    # twice: vertex->edge gather + edge->vertex gather)
    inc = entrymod._incidence(spark, sf_dir)
    hg = Hypergraph.freeze(spark, inc)
    n_inc = hg.incidence_by_vertex.count()
    init = entrymod._labels0(spark, hg.num_vertices)
    t0 = time.monotonic()
    res = label_propagation(hg, init, max_labels=10)
    lp_wall = time.monotonic() - t0
    hg.unpersist()
    lp = {
        "iterations": res.iterations,
        "converged": res.converged,
        "wall_sec": round(lp_wall, 3),
        "supersteps_per_sec": round(res.iterations / lp_wall, 4),
        "edges_per_sec": round(2 * n_inc * res.iterations / lp_wall, 1),
        "incidence_rows": n_inc,
        "num_vertices": hg.num_vertices,
        "num_edges": hg.num_edges,
        "cpus": cpus,
    }

    total = round(sum(timings.values()) + lp_wall, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "lp": lp,
            }
        )
    )


if __name__ == "__main__":
    main()
