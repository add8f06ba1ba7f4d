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
    "lp_bucketed_build",
    "lp_bucketed_run",
    "clique_adj_build",
    "coreness",
    "pagerank_converged",
    "connected_components",
    "triangle_count",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "ann_topk",  # r06: was cosine_topk; now exact + signlsh union row
    "embedding_near_dup",
    "text_profile",
    "agg_relational",  # r06: pushdown+rollup union row
    "events_stream",
    "events_user_stats",
    "graph_profile",
    "source_files_hypergraph",
]

# sf1 standing gate (r05 verdict #7): after the sf0.1 board, the 8
# heavy entries (+ their two build prerequisites) run ONCE, cold, at
# 10x data synthesized from the driver's own sf0.1 parquet
# (tools/make_sf1.py — key-shifted disjoint copies, no external data).
# Superlinear regressions (the r05 audit caught a 22.8x triangle spill
# and a silently-empty stream this way) surface in every BENCH_r{N}
# instead of waiting for a hand-run audit.  SPARK_GRAFT_BENCH_SF1=0
# skips; SPARK_GRAFT_SF1_DIR overrides the staging dir.
SF1_HEAVY = [
    "lp_superstep",
    "lp_converged",
    "lp_bucketed_build",
    "lp_bucketed_run",
    "clique_adj_build",
    "coreness",
    "pagerank_converged",
    "connected_components",
    "triangle_count",
    # r06: the round's headline algorithmic fix (368.9 -> 72.4 s at sf1
    # via the oriented initial support pass) — on the gate so the
    # anchored-wedge cost shape can't silently come back
    "ktruss",
    "minhash_lsh",
]


def _special_entries(spark, sf_dir):
    """Bench-only decompositions of contract queries (the contract
    queries themselves are unchanged — the driver gate still runs them
    end-to-end):

    - lp_converged_bucketed is split into lp_bucketed_build (the two
      bucketed-table writes: one-time layout cost, amortized across
      every later run at 100 TB) and lp_bucketed_run (LP over the
      exchange-free layout — the number that should beat lp_converged);
    - the clique expansion is built ONCE (clique_adj_build) and shared
      by the whole co-occurrence family (triangle_count, coreness),
      production shape: expand once, run every motif/decomposition
      query against it.
    """
    from hypergraph_gpu_label_propagation_spark.model import Hypergraph as HG
    from hypergraph_gpu_label_propagation_spark.operators.kcore import coreness
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        clique_expansion,
        triangle_count,
    )
    from hypergraph_gpu_label_propagation_spark.sources.bucketed import (
        freeze_from_bucketed,
        write_bucketed,
    )

    shared: dict[str, object] = {}

    def lp_bucketed_build(spark, sf_dir):
        write_bucketed(entrymod._incidence(spark, sf_dir), "lp_headline_bucketed")
        return spark.range(1).select(F.lit("built").alias("status"))

    def lp_bucketed_run(spark, sf_dir):
        hg = freeze_from_bucketed(spark, "lp_headline_bucketed", persist=True)
        res = label_propagation(
            hg, entrymod._labels0(spark, hg.num_vertices), max_labels=10
        )
        shared["bucketed_hg"] = hg  # unpersisted after the timed write
        return res.labels

    def clique_adj_build(spark, sf_dir):
        # release the previous rep's cached graph/adjacency before
        # rebuilding (the alternating-reps harness re-enters this entry)
        if "hg" in shared:
            shared.pop("hg").unpersist()
        if "adj" in shared:
            shared.pop("adj").unpersist()
        hg = HG.freeze(spark, entrymod._incidence(spark, sf_dir))
        adj = clique_expansion(hg).localCheckpoint(eager=True)
        shared["hg"], shared["adj"] = hg, adj
        return adj.groupBy().agg(F.count(F.lit(1)).alias("n_pairs"))

    def tc_shared(spark, sf_dir):
        return triangle_count(shared["hg"], adj=shared["adj"])

    def coreness_shared(spark, sf_dir):
        return coreness(shared["hg"], adj=shared["adj"]).coreness

    return {
        "lp_bucketed_build": lp_bucketed_build,
        "lp_bucketed_run": lp_bucketed_run,
        "clique_adj_build": clique_adj_build,
        "triangle_count": tc_shared,
        "coreness": coreness_shared,
    }, shared


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus)

    queries = entrymod.queries()
    specials, shared = _special_entries(spark, sf_dir)
    queries.update(specials)
    # untimed session warm-up: C2 JIT + codegen cold-start otherwise
    # lands entirely on whichever query runs first (in r02 lp_superstep
    # absorbed ~10 s of it, reading as a per-query regression).  Warm
    # with the superstep path itself — freeze, joins, aggs, windows.
    queries["lp_superstep"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # alternating min-of-N reps (r04 verdict #2): the host has documented
    # +-50% co-tenant noise, and a single-shot record contradicted the
    # repo's own controlled A/Bs (lp_bucketed_run read slower than
    # lp_converged while every alternating rep showed the opposite).
    # Reps are interleaved ACROSS queries (whole-board passes), so one
    # co-tenant burst can't poison all reps of one entry; entries under
    # 1 s keep their first-pass timing (noise floor).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    rep_times: dict[str, list[float]] = {name: [] for name in HEADLINE}
    counter = [0]

    def run_entry(name: str, data_dir: str = sf_dir) -> float:
        t0 = time.monotonic()
        df = queries[name](spark, data_dir)
        # noop sink materializes EVERY column of every row (a bare count
        # would let Catalyst prune columns and flatter the timing); the
        # row count rides the same job via observe()
        obs = Observation(f"bench_{name}_{counter[0]}")
        counter[0] += 1
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
            "overwrite"
        ).save()
        n = obs.get["n"]
        dt = round(time.monotonic() - t0, 3)
        tag = "" if data_dir == sf_dir else f"@{os.path.basename(data_dir.rstrip('/'))}"
        print(f"# {name}{tag}: {n} rows in {dt}s", file=sys.stderr)
        if name == "lp_bucketed_run" and "bucketed_hg" in shared:
            shared.pop("bucketed_hg").unpersist()
        return dt

    for rep in range(reps):
        for name in HEADLINE:
            if rep > 0 and min(rep_times[name]) < 1.0:
                continue  # noise-floor entry: single shot is enough
            rep_times[name].append(run_entry(name))
    if "hg" in shared:
        shared.pop("hg").unpersist()
    if "adj" in shared:
        shared.pop("adj").unpersist()
    timings = {name: min(ts) for name, ts in rep_times.items()}
    medians = {
        name: sorted(ts)[len(ts) // 2] for name, ts in rep_times.items()
    }

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

    # ---- sf1 standing gate (r05 verdict #7): one cold rep of the
    # heavy subset at 10x data.  Ratios compare a COLD sf1 shot to the
    # sf0.1 min-of-reps (labeled as such: regime-mixed, good for
    # catching order-of-magnitude superlinearity, not for fine deltas).
    sf1_section = None
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_synth")
    # skip the gate when the main board ALREADY ran at the sf1 staging
    # dir (path compare, not the 'sf' suffix parse — '/tmp/sf1_synth'
    # parses as sf='1_synth' and a string check would re-run the gate
    # against itself, emitting fake ~1x ratios; r06 code review)
    already_sf1 = os.path.realpath(sf_dir) == os.path.realpath(sf1_dir) or sf == "1"
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0" and not already_sf1:
        try:
            if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
                from tools.make_sf1 import synthesize

                t0 = time.monotonic()
                synthesize(spark, sf1_dir)
                print(
                    f"# sf1 synthesized in {time.monotonic() - t0:.1f}s",
                    file=sys.stderr,
                )
            sf1_times: dict[str, float | None] = {}
            for name in SF1_HEAVY:
                try:
                    sf1_times[name] = run_entry(name, sf1_dir)
                except Exception as exc:  # keep the gate best-effort
                    sf1_times[name] = None
                    print(f"# {name}@sf1 FAILED: {exc}", file=sys.stderr)
            if "hg" in shared:
                shared.pop("hg").unpersist()
            if "adj" in shared:
                shared.pop("adj").unpersist()
            sf1_section = {
                "dir": sf1_dir,
                "reps": 1,
                "queries": sf1_times,
                "x_at_10x_cold_vs_min": {
                    n: round(t / timings[n], 2)
                    for n, t in sf1_times.items()
                    if t is not None and timings.get(n, 0) > 0
                },
            }
        except Exception as exc:
            sf1_section = {"err": str(exc)}

    total = round(sum(timings.values()) + lp_wall, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "bench_reps": reps,
                "sf": sf,
                "lp": lp,
                "sf1": sf1_section,
            }
        )
    )


if __name__ == "__main__":
    main()
