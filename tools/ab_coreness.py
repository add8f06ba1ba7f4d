"""A/B harness for the coreness wall-time levers (r05 verdict #3).

Variants (alternating reps, shared precomputed clique expansion — the
bench's production shape) live in ``VARIANTS`` below and evolve round
to round (the r05 set was base/cap/cap_ft20/cap_ft50/ft20; the current
set probes fused_steps_pruned against the shipped default — see the
findings comment on ``VARIANTS``).

Prints one JSON line per (variant, rep) and a summary; also asserts
every variant's coreness values equal the first variant's (exactness
check at full sf scale).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_coreness.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.kcore import coreness
from hypergraph_gpu_label_propagation_spark.operators.triangles import clique_expansion
from hypergraph_gpu_label_propagation_spark.session import get_spark

VARIANTS = {
    # round-1 findings (3 alternating reps, sf0.1): init_cap and
    # frontier thresholds are all within noise — every variant runs the
    # same 38 rounds with identical change sequences (H_g doesn't bind
    # on this degree distribution), so the lever is per-round fixed
    # cost, i.e. fused h-index steps per materialized round.
    # round-6 (r05 verdict #3, algorithmic round-count attack): the two
    # schedule-level levers measured NEGATIVE — gauss_seidel (2-color
    # half-sweeps: 38 Jacobi sweeps -> 30 GS sweeps but 3x wall, the
    # duplicated half subtrees don't reuse exchanges) and
    # scope_inner_steps (frontier-scoped fused steps: lazy schedule
    # re-expands the frontier, 67.6 s vs 20.7 s).  Remaining lever:
    # fused_steps_pruned — extra FULL-ADJ (exact-Jacobi) inner steps
    # once the frontier is small, trading per-round h_of passes for
    # fewer materialized-round boundaries (checkpoint + compare join).
    # round-7 probe: the r07 sweep-profile measurement (20 rounds, creep
    # rounds 8-17 at ~0.85 s with 100-2500 changes) suggests the pruned
    # path's two extra semi-join scans may cost more than they save on
    # this dense graph (17,732 of 20,000 vertices in one 84-core, so
    # neighbors-of-changed ~ everything); A/B never-prune vs default,
    # plus fused depth now that rounds are cheap.
    # round-7 findings (2 alternating reps, sf0.1 + sf1 single shot):
    # 1. frontier pruning is a NET LOSS on dense co-occurrence graphs
    #    (r06 default 19.9/25.8 min/med vs never-prune 16.0/16.1):
    #    17,732 of 20,000 vertices share one 84-core, so the pruned
    #    rounds' two extra adjacency semi-scans buy nothing.
    # 2. the single-exchange "arr" sweep tolerates deep fusing where
    #    "hist" does not (hist4 17.5/22.5 vs arr4 14.4-15.7; the
    #    stacked window sorts dominate hist's fused plans).
    # 3. incremental histogram maintenance ("auto") is EXACT and
    #    sweep-identical to arr but loses at every in-sandbox scale:
    #    inc rounds are a flat ~2.6-3.5 s (15-stage floor) vs 0.7 s
    #    full rounds at sf0.1 (auto2 52-62 s vs arr2 16-20 s), and at
    #    fused 4 the within-round stats compounding adds a planning
    #    spiral (auto4 ~190 s).  Kept as a documented-negative mode.
    # Shipped default = old3 -> new1 here: arr + fused 4 + no pruning.
    "r06_default": dict(sweep="hist", fused_steps=2, frontier_threshold=0.05),
    "shipped": dict(),
    "auto2": dict(sweep="auto", fused_steps=2),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_coreness", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    hg = Hypergraph.freeze(spark, entrymod._incidence(spark, sf_dir))
    adj = clique_expansion(hg).localCheckpoint(eager=True)
    n_adj = adj.count()
    print(f"# adj pairs: {n_adj}", file=sys.stderr)

    results: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    baseline_hash = None
    for rep in range(reps):
        for name, kw in VARIANTS.items():
            t0 = time.monotonic()
            res = coreness(hg, adj=adj, **kw)
            res.coreness.write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 2)
            rec = {"variant": name, "rep": rep, "sec": dt,
                   "iters": res.iterations,
                   "changes": res.changes_per_iter[:6] + ["..."]
                   if len(res.changes_per_iter) > 6 else res.changes_per_iter}
            results[name].append(rec)
            print(json.dumps(rec))
            if rep == 0:
                vals = tuple(sorted(map(tuple, res.coreness.collect())))
                h = hash(vals)
                if baseline_hash is None:
                    baseline_hash = h
                else:
                    assert h == baseline_hash, f"{name} differs from base!"
    summary = {
        v: {
            "min": min(r["sec"] for r in rs),
            "med": sorted(r["sec"] for r in rs)[len(rs) // 2],
            "iters": rs[0]["iters"],
        }
        for v, rs in results.items()
    }
    print(json.dumps({"summary": summary, "adj_pairs": n_adj, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
