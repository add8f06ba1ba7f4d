"""A/B harness for the IVF probe-join skew lever (r06: cell_salt).

Builds a deliberately skewed corpus — 90% of vectors in ONE tight
cluster, so one k-means cell holds ~90% of the inverted file — and
times ivf_topk with the probe join unsalted vs salted.  The candidate
set is identical (pytest asserts row equality separately); the lever
only changes partitioning.  Recorded result (BENCH_SCALING.md, late
round 6): 34.5 s -> 9.7 s min-of-3 at salt=8 on local[32].

Usage: python tools/ab_ivf_salt.py [n_vectors] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from hypergraph_gpu_label_propagation_spark.operators.kmeans import ivf_topk
from hypergraph_gpu_label_propagation_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dim, n_cells = 16, 8

    spark = get_spark("ab_ivf_salt", cores=32)
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(n_cells, dim)) * 10
    assign = np.where(rng.random(n) < 0.9, 0, rng.integers(1, n_cells, size=n))
    vecs = centers[assign] + 0.1 * rng.normal(size=(n, dim))
    df = (
        spark.createDataFrame(
            [(int(i), vecs[i].astype(float).tolist()) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        .repartition(32)
        .persist()
    )
    df.count()
    queries = df.limit(64).localCheckpoint(eager=True)
    cents = [[float(x) for x in c] for c in centers]

    for salt in (1, 8):
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            ivf_topk(
                df, queries, k=5, n_cells=n_cells, nprobe=2,
                centroids=cents, cell_salt=salt,
            ).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 2))
        print(f"salt={salt}: reps {ts} min {min(ts)}")


if __name__ == "__main__":
    main()
