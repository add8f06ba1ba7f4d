"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule's two-cluster-size criterion is evidenced in-sandbox by
running the SAME LP job on the SAME input at two parallelism levels
(local[N] vs local[4N], the proxy for N vs 4N executors) and reporting
throughput at both plus efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

Two workloads:
- ``--mode kernel`` (default): a large synthetic incidence table
  (pure-column-expression generation, written once to parquet so both
  levels read identical bytes) with a FIXED number of supersteps —
  compute-bound, which is what actually scales; this is the honest
  proxy for cluster behavior because at sf0.1 the per-job scheduler
  overhead (constant in cores) dominates and masks scaling.
- ``--mode sf``: the sf0.1 headline bench at both levels (reported for
  completeness).

Usage: python tools/bench_scaling.py [--mode kernel|sf] [low] [high]
Appends a row to BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_incidence(path: str, num_vertices: int, num_edges: int, k: int, seed: int = 42) -> None:
    """Deterministic k-uniform incidence via pure column exprs (fast at
    tens of millions of rows), written once; both levels read this."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from hypergraph_gpu_label_propagation_spark.session import get_spark

    spark = get_spark("synth_incidence", cores=32)
    df = spark.range(num_edges * k).select(
        (F.col("id") / k).cast("long").alias("edge_id"),
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(num_vertices)).alias("vertex_id"),
    ).distinct()
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def run_kernel(path: str, cores: int, supersteps: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lp_scale_bench.py"),
         path, str(cores), str(supersteps)],
        capture_output=True, text=True, check=True,
    )
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def run_sf_bench(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["kernel", "sf"], default="kernel")
    ap.add_argument("low", nargs="?", type=int, default=8)
    ap.add_argument("high", nargs="?", type=int, default=32)
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--supersteps", type=int, default=4)
    args = ap.parse_args()

    if args.mode == "kernel":
        path = "/tmp/scale_incidence.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_incidence(path, args.vertices, args.edges, args.k)
        r_low = run_kernel(path, args.low, args.supersteps)
        r_high = run_kernel(path, args.high, args.supersteps)
        assert r_low["total_changes"] == r_high["total_changes"], (
            "parallelism changed the result — determinism violation"
        )
        tl, th = r_low["edges_per_sec"], r_high["edges_per_sec"]
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        r_low = run_sf_bench(args.low, sf_dir)["lp"]
        r_high = run_sf_bench(args.high, sf_dir)["lp"]
        tl, th = r_low["edges_per_sec"], r_high["edges_per_sec"]

    eff = (th / tl) / (args.high / args.low)
    result = {
        "mode": args.mode,
        "low_cores": args.low,
        "high_cores": args.high,
        "edges_per_sec_low": tl,
        "edges_per_sec_high": th,
        "speedup": round(th / tl, 3),
        "scaling_efficiency": round(eff, 4),
        "low": r_low,
        "high": r_high,
    }
    print(json.dumps(result))
    header = (
        "| mode | input | N | 4N | edges/s @N | edges/s @4N | speedup | efficiency |\n"
        "|---|---|---|---|---|---|---|---|\n"
    )
    md = os.path.join(REPO, "BENCH_SCALING.md")
    if not os.path.exists(md):
        with open(md, "w") as f:
            f.write("# Scaling evidence (same job, same input, two parallelism levels)\n\n")
            f.write(header)
    inp = (
        f"{r_low.get('incidence_rows', '?')} incidence rows"
        if args.mode == "kernel" else "sf0.1"
    )
    with open(md, "a") as f:
        f.write(
            f"| {args.mode} | {inp} | {args.low} | {args.high} | {tl:.0f} | {th:.0f} | "
            f"{th / tl:.2f}x | {eff:.3f} |\n"
        )


if __name__ == "__main__":
    main()
