"""A/B the durable IVF index against inline ivf_topk (r06 verdict #4),
the ab_lp_bucketed pattern: cold inline (fit + assign + probe every
call) vs index build (fit + assign + two bucketed table writes, once)
vs warm probes (read the existing index, probe only).

Variants per rep:
  inline       — ivf_topk(corpus, queries): what every repeated batch
                 paid before the durable index existed
  index_build  — write_ivf_index(corpus): the one-time cost
  warm_probe   — ivf_topk_from_index over the already-written index:
                 what every batch pays after

Asserts warm results == inline results with the same centroids (the
index stores the fitted centroids, so the inline leg reuses them —
isolating layout cost from Lloyd's FP nondeterminism).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_ivf_index.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
    ivf_topk,
    ivf_topk_from_index,
    write_ivf_index,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark

N_CELLS = 16
NPROBE = 3
K = 5
SALT = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_ivf_index", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    nq = queries.count()
    print(f"# corpus {n} queries {nq} sf={sf_dir}", file=sys.stderr)

    results: dict[str, list[float]] = {"inline": [], "index_build": [], "warm_probe": []}
    baseline = None
    for rep in range(reps):
        t0 = time.monotonic()
        write_ivf_index(
            corpus, "ab_ivf", n_cells=N_CELLS, seed=42, cell_salt=SALT
        )
        results["index_build"].append(round(time.monotonic() - t0, 2))

        cent = [
            [float(x) for x in r["centroid"]]
            for r in spark.table("ab_ivf_ivf_centroids").orderBy("cell").collect()
        ]

        t0 = time.monotonic()
        warm = ivf_topk_from_index(
            spark, "ab_ivf", queries, k=K, nprobe=NPROBE
        )
        warm_rows = sorted(map(tuple, warm.collect()))
        results["warm_probe"].append(round(time.monotonic() - t0, 2))

        t0 = time.monotonic()
        inline = ivf_topk(
            corpus, queries, k=K, n_cells=N_CELLS, nprobe=NPROBE,
            centroids=cent, cell_salt=SALT,
        )
        inline_rows = sorted(map(tuple, inline.collect()))
        results["inline"].append(round(time.monotonic() - t0, 2))

        assert warm_rows == inline_rows, "index vs inline results differ!"
        if baseline is None:
            baseline = warm_rows
        print(json.dumps({"rep": rep, **{k: v[-1] for k, v in results.items()}}))
    summary = {
        k: {"min": min(v), "med": sorted(v)[len(v) // 2]} for k, v in results.items()
    }
    print(json.dumps({"summary": summary, "corpus": n, "queries": nq, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
