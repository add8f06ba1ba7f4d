"""A/B the triangle_count adjacency materialization strategy (round-4
verdict item 2: triangle_count regressed 7.8 -> 11.7 s between r02 and
r03 with no code change to triangles.py; suspect = host noise vs the
eager localCheckpoint of the clique expansion).

Modes, alternated (A, B, A, B, ...) so co-tenant drift hits both:
  A  localCheckpoint(eager=True)      (current code)
  B  persist(MEMORY_AND_DISK)+count() (CacheManager path)
  C  no materialization               (adj recomputed by each consumer)

Reports per-mode min and median wall time (min-of-N is the noise-free
estimator per BENCH_SCALING.md's straggler analysis).

Usage: python tools/ab_triangles.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.triangles import (
    clique_expansion,
    triangle_count,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark


def run_mode(spark, sf_dir: str, mode: str) -> float:
    hg = Hypergraph.freeze(spark, entrymod._incidence(spark, sf_dir))
    t0 = time.monotonic()
    if mode == "A":
        out = triangle_count(hg)  # localCheckpoint inside
    elif mode == "B":
        adj = clique_expansion(hg).persist(StorageLevel.MEMORY_AND_DISK)
        adj.count()
        out = triangle_count(hg, adj=adj)
    else:  # C
        out = triangle_count(hg, adj=clique_expansion(hg))
    n = out.collect()[0][0]
    wall = time.monotonic() - t0
    if mode == "B":
        adj.unpersist()
    hg.unpersist()
    print(f"#   {mode}: {wall:.2f}s (n_triangles={n})", file=sys.stderr)
    return wall


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 4
    spark = get_spark("ab_triangles", cores=32)
    run_mode(spark, sf_dir, "A")  # warm-up, discarded
    walls: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    for _ in range(reps):
        for mode in ("A", "B", "C"):
            walls[mode].append(run_mode(spark, sf_dir, mode))
    print(json.dumps({
        m: {"min": round(min(w), 2), "median": round(statistics.median(w), 2)}
        for m, w in walls.items()
    }))


if __name__ == "__main__":
    main()
