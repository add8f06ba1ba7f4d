"""ANN quality/cost frontier: signlsh vs IVF on the same corpus (r06
verdict #6).  The repo ships two scale paths; this measures when each
wins: recall@k against the exact cosine_topk baseline vs wall clock,
sweeping (num_planes x multiprobe) for sign-LSH and (n_cells x nprobe)
for IVF, both with their skew hardening on (signlsh: non-broadcast
bucket join with per-bucket local top-k; IVF: cell_salt=2).

IVF legs probe a durable index (write-once build reported separately)
— the production shape; signlsh has no index to build (bucket ids are
computed per run from the plane literal).

Prints one JSON line per leg and a summary table.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ann_frontier.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
    ivf_topk_from_index,
    write_ivf_index,
)
from hypergraph_gpu_label_propagation_spark.operators.similarity import (
    ann_recall,
    cosine_topk,
    signlsh_topk,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark

K = 5
SALT = 2

SIGNLSH_LEGS = [
    {"num_planes": 6, "multiprobe": False},
    {"num_planes": 6, "multiprobe": True},
    {"num_planes": 8, "multiprobe": False},
    {"num_planes": 8, "multiprobe": True},
    {"num_planes": 10, "multiprobe": True},
]
IVF_LEGS = [
    {"n_cells": 16, "nprobe": 1},
    {"n_cells": 16, "nprobe": 3},
    {"n_cells": 16, "nprobe": 6},
    {"n_cells": 64, "nprobe": 4},
    {"n_cells": 64, "nprobe": 12},
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("ann_frontier", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = corpus.count()
    dim = len(corpus.select("embedding").first()["embedding"])
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    nq = queries.count()
    exact = cosine_topk(corpus, queries, k=K).localCheckpoint(eager=True)
    print(f"# corpus {n} dim {dim} queries {nq} sf={sf_dir}", file=sys.stderr)

    builds: dict[int, float] = {}
    for leg in IVF_LEGS:
        nc = leg["n_cells"]
        if nc not in builds:
            t0 = time.monotonic()
            write_ivf_index(
                corpus, f"annf_{nc}", n_cells=nc, seed=42, cell_salt=SALT
            )
            builds[nc] = round(time.monotonic() - t0, 2)

    legs = []
    for rep in range(reps):
        for leg in SIGNLSH_LEGS:
            t0 = time.monotonic()
            ap = signlsh_topk(
                corpus, queries, k=K, dim=dim, broadcast_queries=False, **leg
            )
            ap = ap.localCheckpoint(eager=True)
            wall = round(time.monotonic() - t0, 2)
            rec = float(ann_recall(ap, exact).collect()[0]["recall"])
            legs.append({"path": "signlsh", **leg, "rep": rep,
                         "sec": wall, "recall": rec})
            print(json.dumps(legs[-1]))
        for leg in IVF_LEGS:
            t0 = time.monotonic()
            ap = ivf_topk_from_index(
                spark, f"annf_{leg['n_cells']}", queries, k=K, nprobe=leg["nprobe"]
            ).localCheckpoint(eager=True)
            wall = round(time.monotonic() - t0, 2)
            rec = float(ann_recall(ap, exact).collect()[0]["recall"])
            legs.append({"path": "ivf", **leg, "rep": rep,
                         "sec": wall, "recall": rec})
            print(json.dumps(legs[-1]))

    # min wall per leg across reps (recall is rep-stable for signlsh;
    # IVF recall is fixed by the built index)
    summary = {}
    for leg in legs:
        key = json.dumps(
            {k: v for k, v in leg.items() if k not in ("rep", "sec", "recall")},
            sort_keys=True,
        )
        cur = summary.setdefault(key, {"sec": leg["sec"], "recall": leg["recall"]})
        cur["sec"] = min(cur["sec"], leg["sec"])
    print(json.dumps({
        "summary": [dict(json.loads(k), **v) for k, v in summary.items()],
        "ivf_index_builds_sec": builds,
        "corpus": n, "queries": nq, "k": K, "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
