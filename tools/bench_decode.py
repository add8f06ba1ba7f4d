"""Decode throughput through the Spark path (r06 verdict #3 'done'
criterion): realistic-size payloads driven through
``decode_assets(REAL)``'s Arrow-batched mapInPandas, reporting MB/s
and MP/s with the decode parallelized across executor cores.

Payloads: 1024x1024 smooth 4:2:0 JPEGs (photo-like coefficient
density) and 1024x1024 RGB PNGs cycling all five filter types (2/5 of
scanlines take the sequential Average/Paeth bytearray scan).  Encode
happens once on the driver; the timed leg is the Spark decode only
(repartitioned one-asset-per-task so every core decodes).

Prints one JSON line per leg.

Usage: python tools/bench_decode.py [n_assets_per_kind]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
    DecodeBackend,
    decode_assets,
    make_jpeg,
    make_png,
)
from hypergraph_gpu_label_propagation_spark.session import get_spark

SIDE = 1024


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_decode", cores=cores)

    legs = {
        "jpeg_1mp_smooth_420": [
            make_jpeg(SIDE, SIDE, seed=i, sampling=(2, 2), smooth=True, quant=2)
            for i in range(n)
        ],
        "png_1mp_rgb_all_filters": [
            make_png(SIDE, SIDE, seed=i, color_type=2) for i in range(n)
        ],
    }
    for name, payloads in legs.items():
        rows = [(i, "image", {}, bytearray(p)) for i, p in enumerate(payloads)]
        df = (
            spark.createDataFrame(
                rows, "asset_id long, kind string, meta map<string,string>, data binary"
            )
            .repartition(min(n, cores))
            .cache()
        )
        df.count()  # materialize inputs outside the timed leg
        mb = sum(len(p) for p in payloads) / 1e6
        mp = n * SIDE * SIDE / 1e6
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            decoded = decode_assets(df, backend=DecodeBackend.REAL)
            got = decoded.count()
            wall = time.monotonic() - t0
            assert got == n, (name, got)
            best = wall if best is None else min(best, wall)
        df.unpersist()
        print(
            json.dumps(
                {
                    "leg": name,
                    "assets": n,
                    "stream_mb": round(mb, 2),
                    "megapixels": round(mp, 2),
                    "sec_min_of_2": round(best, 2),
                    "mb_per_s": round(mb / best, 2),
                    "mp_per_s": round(mp / best, 2),
                    "cores": cores,
                }
            )
        )


if __name__ == "__main__":
    main()
