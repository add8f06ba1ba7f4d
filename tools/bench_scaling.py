"""Scaling-efficiency evidence (BASELINE.json north rule).

Runs bench.py twice on identical input at two parallelism levels
(local[N] and local[4N], the sandbox proxy for N vs 4N executors) and
reports LP throughput at both plus scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

Usage: python tools/bench_scaling.py [low_cores] [high_cores] [sf_dir]
Prints one JSON line and appends a row to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r_low = run_bench(low, sf_dir)
    r_high = run_bench(high, sf_dir)
    tl, th = r_low["lp"]["edges_per_sec"], r_high["lp"]["edges_per_sec"]
    eff = (th / tl) / (high / low)
    result = {
        "sf_dir": sf_dir,
        "low_cores": low,
        "high_cores": high,
        "lp_edges_per_sec_low": tl,
        "lp_edges_per_sec_high": th,
        "lp_supersteps_per_sec_low": r_low["lp"]["supersteps_per_sec"],
        "lp_supersteps_per_sec_high": r_high["lp"]["supersteps_per_sec"],
        "headline_total_sec_low": r_low["value"],
        "headline_total_sec_high": r_high["value"],
        "scaling_efficiency": round(eff, 4),
        "speedup": round(th / tl, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"| {sf_dir} | {low} | {high} | {tl:.0f} | {th:.0f} | "
            f"{th / tl:.2f}x | {eff:.3f} |\n"
        )


if __name__ == "__main__":
    main()
