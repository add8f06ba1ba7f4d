"""Cold-vs-warm A/B for events_sessions at sf0.1 and sf1 (r05 verdict
#8): the round-5 sf1 follow-up recorded a warm-only 2.3 s against a
cold-ish 5.9 s at sf0.1 — a regime-mixed comparison.  This harness
measures BOTH regimes at BOTH scales:

- warm: one session, alternating reps across the two SF dirs (the
  bench board's regime);
- cold: a fresh JVM per rep (``--one`` subprocess), so each timing
  carries session startup + codegen/JIT cold-start the way a first
  production run would.

Prints one JSON line per rep and a summary table row for
BENCH_SCALING.md.

Usage: python tools/ab_events_sessions.py [reps]
       python tools/ab_events_sessions.py --one <sf_dir>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_synth"),
}


def _run_once(spark, sf_dir: str) -> float:
    import __spark_entry__ as entrymod

    t0 = time.monotonic()
    df = entrymod.queries()["events_sessions"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        from hypergraph_gpu_label_propagation_spark.session import get_spark

        spark = get_spark("events_sessions_cold",
                          cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        print(json.dumps({"sec": _run_once(spark, sys.argv[2])}))
        return

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out: dict[str, dict[str, list[float]]] = {
        sf: {"cold": [], "warm": []} for sf in SF_DIRS
    }

    # cold: fresh JVM per rep, alternating across SFs
    for rep in range(reps):
        for sf, d in SF_DIRS.items():
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", d],
                capture_output=True, text=True, check=True,
            )
            sec = json.loads(r.stdout.strip().splitlines()[-1])["sec"]
            out[sf]["cold"].append(sec)
            print(json.dumps({"sf": sf, "regime": "cold", "rep": rep, "sec": sec}))

    # warm: one session, alternating reps (one untimed warm-up each)
    from hypergraph_gpu_label_propagation_spark.session import get_spark

    spark = get_spark("events_sessions_warm",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for d in SF_DIRS.values():
        _run_once(spark, d)
    for rep in range(reps):
        for sf, d in SF_DIRS.items():
            sec = _run_once(spark, d)
            out[sf]["warm"].append(sec)
            print(json.dumps({"sf": sf, "regime": "warm", "rep": rep, "sec": sec}))

    summary = {
        sf: {reg: {"min": min(ts), "med": sorted(ts)[len(ts) // 2]}
             for reg, ts in regs.items()}
        for sf, regs in out.items()
    }
    print(json.dumps({"summary": summary, "reps": reps}))


if __name__ == "__main__":
    main()
