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
    # r07 (r06 verdict #5): the frozen dual-layout build is ONE timed
    # entry; every graph-family entry below runs against the shared
    # layout.  This is the production shape (layout once, operators
    # after) and makes per-entry numbers OPERATOR cost, with layout cost
    # attributed to its own row instead of re-paid ~8 times per pass.
    "hg_freeze",
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

# sf1 standing gate (r05 verdict #7): after the sf0.1 board, the heavy
# entries (+ their build prerequisites) run at 10x data synthesized from
# the driver's own sf0.1 parquet (tools/make_sf1.py — key-shifted
# disjoint copies, no external data).  Superlinear regressions (the r05
# audit caught a 22.8x triangle spill and a silently-empty stream this
# way) surface in every BENCH_r{N} instead of waiting for a hand-run
# audit.  SPARK_GRAFT_BENCH_SF1=0 skips; SPARK_GRAFT_SF1_DIR overrides
# the staging dir.
SF1_HEAVY = [
    "hg_freeze",
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
    # r07 (r06 verdict #7): one streaming entry rides the gate — cold +
    # warm shots recorded, warm (2nd) is the guarded regime
    "events_stream",
]

# r06 verdict #2: a single cold shot has a documented +-50% co-tenant
# band — too noisy to guard the wedge-heavy entries (the r06 gate read
# triangle_count at 57.9 s vs a ~35 s 3-rep center).  These entries get
# a SECOND alternating pass at sf1; their recorded time is min-of-2 and
# the per-shot list + 1-min loadavg ride the JSON so out-of-band shots
# are identifiable.  Detection threshold the band supports: min-of-2
# alternating shots bound co-tenant inflation to one burst, so a
# >=1.5x regression vs the prior round's sf1 min is a real signal for
# these entries; single-shot entries remain order-of-magnitude guards.
SF1_REPS2 = {
    "hg_freeze",  # prerequisite: rebuilds the shared layout for pass 2
    "clique_adj_build",  # prerequisite: rebuilds adj for pass 2
    "coreness",
    "triangle_count",
    "ktruss",
    "events_stream",  # 2nd shot IS the warm regime (r06 verdict #7)
}
SF1_DETECTION = (
    "entries with 2 alternating reps: >=1.5x vs prior-round sf1 min is "
    "a regression; single-shot entries: order-of-magnitude only "
    "(+-50% co-tenant band, see load1 stamps)"
)


def _special_entries(spark, sf_dir):
    """Bench-only decompositions of contract queries (the contract
    queries themselves are unchanged — the driver gate still runs them
    end-to-end, each self-contained):

    - hg_freeze (r07, r06 verdict #5) builds + MATERIALIZES the frozen
      dual incidence layout ONCE per pass; the whole graph family (LP,
      pagerank, CC, coreness, triangles, ktruss) runs against it, so
      their rows are operator cost and the layout cost has its own row.
      Dependents REFUSE to run when the shared layout is missing or was
      built for a different data dir (r06 ADVICE: a failed build at sf1
      must not let dependents silently reuse the sf0.1 layout and record
      fake ratios);
    - lp_converged_bucketed is split into lp_bucketed_build (the two
      bucketed-table writes: one-time layout cost, amortized across
      every later run at 100 TB) and lp_bucketed_run (LP over the
      exchange-free layout — the number that should beat lp_converged);
    - the clique expansion is built ONCE (clique_adj_build) and shared
      by the whole co-occurrence family (triangle_count, coreness,
      ktruss), production shape: expand once, run every
      motif/decomposition query against it.
    """
    from hypergraph_gpu_label_propagation_spark.model import Hypergraph as HG
    from hypergraph_gpu_label_propagation_spark.operators.components import (
        connected_components,
    )
    from hypergraph_gpu_label_propagation_spark.operators.kcore import coreness
    from hypergraph_gpu_label_propagation_spark.operators.ktruss import k_truss
    from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
        lp_superstep,
    )
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        hypergraph_pagerank,
    )
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        clique_expansion,
        triangle_count,
    )
    from hypergraph_gpu_label_propagation_spark.sources.bucketed import (
        freeze_from_bucketed,
        write_bucketed,
    )

    shared: dict[str, object] = {}

    def release_shared():
        if "adj" in shared:
            shared.pop("adj").unpersist()
        if "hg" in shared:
            shared.pop("hg").unpersist()
        shared.pop("hg_dir", None)
        shared.pop("adj_dir", None)

    def hg_freeze(spark, data_dir):
        # release the previous pass's layout before rebuilding (the
        # alternating-reps harness and the sf1 gate re-enter this entry).
        # adj is NOT released: it is localCheckpoint-detached, so it
        # survives the hg rebuild, and a noise-floor-skipped
        # clique_adj_build on a later rep must still find it (its own
        # _adj_for dir guard refuses cross-dir reuse)
        if "hg" in shared:
            shared.pop("hg").unpersist()
        shared.pop("hg_dir", None)
        hg = HG.freeze(spark, entrymod._incidence(spark, data_dir))
        # freeze persists lazily — force BOTH dual layouts inside the
        # timed window so dependent entries measure operator cost only
        n_by_v = hg.incidence_by_vertex.count()
        n_by_e = hg.incidence_by_edge.count()
        shared["hg"], shared["hg_dir"] = hg, data_dir
        return spark.range(1).select(
            F.lit(hg.num_vertices).alias("num_vertices"),
            F.lit(hg.num_edges).alias("num_edges"),
            F.lit(n_by_v + n_by_e).alias("layout_rows"),
        )

    def _hg_for(data_dir):
        if shared.get("hg_dir") != data_dir or "hg" not in shared:
            raise RuntimeError(
                f"shared frozen layout unavailable for {data_dir} "
                "(hg_freeze failed or ran for a different dir) — "
                "refusing stale reuse"
            )
        return shared["hg"]

    def _adj_for(data_dir):
        if shared.get("adj_dir") != data_dir or "adj" not in shared:
            raise RuntimeError(
                f"shared clique expansion unavailable for {data_dir} "
                "(clique_adj_build failed or ran for a different dir) — "
                "refusing stale reuse"
            )
        return shared["adj"]

    def lp_bucketed_build(spark, data_dir):
        write_bucketed(entrymod._incidence(spark, data_dir), "lp_headline_bucketed")
        return spark.range(1).select(F.lit("built").alias("status"))

    def lp_bucketed_run(spark, data_dir):
        hg = freeze_from_bucketed(spark, "lp_headline_bucketed", persist=True)
        res = label_propagation(
            hg, entrymod._labels0(spark, hg.num_vertices), max_labels=10
        )
        shared["bucketed_hg"] = hg  # unpersisted after the timed write
        return res.labels

    def clique_adj_build(spark, data_dir):
        if "adj" in shared:
            shared.pop("adj").unpersist()
            shared.pop("adj_dir", None)
        adj = clique_expansion(_hg_for(data_dir)).localCheckpoint(eager=True)
        shared["adj"], shared["adj_dir"] = adj, data_dir
        return adj.groupBy().agg(F.count(F.lit(1)).alias("n_pairs"))

    def lp_superstep_shared(spark, data_dir):
        hg = _hg_for(data_dir)
        return lp_superstep(
            hg, entrymod._labels0(spark, hg.num_vertices), entrymod.MAX_LABELS
        ).select("vertex_id", "label", "changed")

    def lp_converged_shared(spark, data_dir):
        hg = _hg_for(data_dir)
        return label_propagation(
            hg, entrymod._labels0(spark, hg.num_vertices),
            max_labels=entrymod.MAX_LABELS,
        ).labels

    def pagerank_shared(spark, data_dir):
        res = hypergraph_pagerank(
            _hg_for(data_dir), damping=entrymod.DAMPING, tol=1e-7
        )
        return res.ranks.select("vertex_id", F.round("rank", 6).alias("rank"))

    def cc_shared(spark, data_dir):
        return connected_components(_hg_for(data_dir)).components

    def tc_shared(spark, data_dir):
        return triangle_count(_hg_for(data_dir), adj=_adj_for(data_dir))

    def coreness_shared(spark, data_dir):
        return coreness(_hg_for(data_dir), adj=_adj_for(data_dir)).coreness

    def ktruss_shared(spark, data_dir):
        return k_truss(_hg_for(data_dir), k=17, adj=_adj_for(data_dir)).membership

    entries = {
        "hg_freeze": hg_freeze,
        "lp_bucketed_build": lp_bucketed_build,
        "lp_bucketed_run": lp_bucketed_run,
        "clique_adj_build": clique_adj_build,
        "lp_superstep": lp_superstep_shared,
        "lp_converged": lp_converged_shared,
        "pagerank_converged": pagerank_shared,
        "connected_components": cc_shared,
        "triangle_count": tc_shared,
        "coreness": coreness_shared,
        "ktruss": ktruss_shared,
    }
    entries["_release_shared"] = release_shared  # harness-side cleanup hook
    return entries, shared


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus)

    queries = entrymod.queries()
    specials, shared = _special_entries(spark, sf_dir)
    release_shared = specials.pop("_release_shared")
    queries.update(specials)
    # untimed session warm-up: C2 JIT + codegen cold-start otherwise
    # lands entirely on whichever query runs first (in r02 lp_superstep
    # absorbed ~10 s of it, reading as a per-query regression).  Warm
    # with the layout build + the superstep path itself — freeze, joins,
    # aggs, windows (hg_freeze also seeds the shared layout the
    # superstep entry requires).
    queries["hg_freeze"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
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
    timings = {name: min(ts) for name, ts in rep_times.items()}
    medians = {
        name: sorted(ts)[len(ts) // 2] for name, ts in rep_times.items()
    }

    # LP throughput to convergence (BASELINE.json metric): supersteps/sec
    # and edges-processed/sec (each superstep touches every incidence row
    # twice: vertex->edge gather + edge->vertex gather)
    # reuse the board's shared frozen layout when it is still live for
    # this dir (it is — the rep loop leaves it persisted); the metric is
    # LOOP throughput, which never included freeze cost (t0 is after it)
    if shared.get("hg_dir") == sf_dir and "hg" in shared:
        hg = shared["hg"]
    else:
        hg = Hypergraph.freeze(spark, entrymod._incidence(spark, sf_dir))
        shared["hg"], shared["hg_dir"] = hg, sf_dir
    n_inc = hg.incidence_by_vertex.count()
    init = entrymod._labels0(spark, hg.num_vertices)
    t0 = time.monotonic()
    res = label_propagation(hg, init, max_labels=10)
    lp_wall = time.monotonic() - t0
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
            # r06 verdict #2: two alternating passes — pass 2 re-runs
            # only the SF1_REPS2 entries (wedge-heavy + their build
            # prerequisites + the streaming warm shot); every shot is
            # stamped with the 1-min loadavg so out-of-band shots are
            # identifiable after the fact.  A failed build entry leaves
            # dependents refusing stale reuse (recorded as failures),
            # never silently re-timing sf0.1 state (r06 ADVICE).
            sf1_shots: dict[str, list] = {n: [] for n in SF1_HEAVY}
            for rep in range(2):
                for name in SF1_HEAVY:
                    if rep > 0 and name not in SF1_REPS2:
                        continue
                    load1 = round(os.getloadavg()[0], 1)
                    try:
                        t = run_entry(name, sf1_dir)
                    except Exception as exc:  # keep the gate best-effort
                        t = None
                        print(f"# {name}@sf1 FAILED: {exc}", file=sys.stderr)
                    sf1_shots[name].append({"sec": t, "load1": load1})
            release_shared()
            sf1_times = {
                n: (min(ts) if (ts := [s["sec"] for s in shots if s["sec"] is not None]) else None)
                for n, shots in sf1_shots.items()
            }
            sf1_section = {
                "dir": sf1_dir,
                "shots": sf1_shots,
                "reps2_entries": sorted(SF1_REPS2),
                "detection_threshold": SF1_DETECTION,
                "streaming_regime": "events_stream min-of-2 = warm "
                "(2nd shot; cold 1st shot in shots list)",
                "queries": sf1_times,
                "x_at_10x_vs_min": {
                    n: round(t / timings[n], 2)
                    for n, t in sf1_times.items()
                    if t is not None and timings.get(n, 0) > 0
                },
            }
        except Exception as exc:
            sf1_section = {"err": str(exc)}

    release_shared()
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
                # r07 (r06 verdict #5): layout cost vs operator cost is
                # attributed per entry — the *_build rows ARE the layout
                # cost, the listed operator rows run against the shared
                # layouts (the public q_ entries under the driver's
                # correctness gate remain self-contained)
                "attribution": {
                    "layout_entries": [
                        "hg_freeze", "clique_adj_build", "lp_bucketed_build",
                    ],
                    "operator_entries_on_shared_layout": [
                        "lp_superstep", "lp_converged", "pagerank_converged",
                        "connected_components", "triangle_count", "coreness",
                        "ktruss",
                    ],
                },
                "sf": sf,
                "lp": lp,
                "sf1": sf1_section,
            }
        )
    )


if __name__ == "__main__":
    main()
