"""End-to-end A/B: hash-layout LP vs durable-bucketed LP at one SF
(r05 verdict #5 "done" clause — the auto-choice evidence).

Both arms pay their FULL layout cost inside the timer:
  hash     — Hypergraph.freeze (repartition+persist) + LP to convergence
  bucketed — write_bucketed (two table writes) + freeze_from_bucketed
             + LP to convergence
  bucketed_warm — freeze_from_bucketed over the EXISTING tables + LP
             (the amortized steady state: layout built once, every
             later convergence run reads it)

Alternating reps.  The auto rule (sources/bucketed.py::should_bucket)
claims bucketed wins once rows x supersteps crosses ~5M; this harness
is the measurement behind that claim at the given SF.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1_synth python tools/ab_lp_bucketed.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
    label_propagation,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark
from hypergraph_gpu_label_propagation_spark.sources.bucketed import (
    freeze_from_bucketed,
    write_bucketed,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_lp_bucketed",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    def run_lp(hg):
        res = label_propagation(
            hg, entrymod._labels0(spark, hg.num_vertices), max_labels=10
        )
        res.labels.write.format("noop").mode("overwrite").save()
        return res

    def arm_hash():
        hg = Hypergraph.freeze(spark, entrymod._incidence(spark, sf_dir))
        res = run_lp(hg)
        hg.unpersist()
        return res

    def arm_bucketed():
        write_bucketed(entrymod._incidence(spark, sf_dir), "ab_lp_bucketed")
        hg = freeze_from_bucketed(spark, "ab_lp_bucketed", persist=True)
        res = run_lp(hg)
        hg.unpersist()
        return res

    def arm_bucketed_warm():
        hg = freeze_from_bucketed(spark, "ab_lp_bucketed", persist=True)
        res = run_lp(hg)
        hg.unpersist()
        return res

    arms = {"hash": arm_hash, "bucketed": arm_bucketed,
            "bucketed_warm": arm_bucketed_warm}
    out: dict[str, list[float]] = {a: [] for a in arms}
    iters: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in arms.items():
            t0 = time.monotonic()
            res = fn()
            dt = round(time.monotonic() - t0, 2)
            out[name].append(dt)
            iters[name] = res.iterations
            print(json.dumps({"arm": name, "rep": rep, "sec": dt,
                              "iters": res.iterations}))
    summary = {a: {"min": min(ts), "med": sorted(ts)[len(ts) // 2],
                   "iters": iters[a]} for a, ts in out.items()}
    print(json.dumps({"summary": summary, "sf_dir": sf_dir, "reps": reps}))


if __name__ == "__main__":
    main()
