"""Streaming-dedup overhead A/B: the incremental band-index path vs
the one-shot batch twin on the same corpus (r07).

Two deliveries (80% then 20% of the sf documents) through
``run_stream_dedup`` — the second delivery is the steady-state shape
(new crawl vs standing index) — against the batch signature-estimator
twin over all arrival-ordered pairs.  Asserts link-set equality (the
pytest contract, re-checked at scale) and prints one JSON line with
the walls.  The number that matters at 100 TB is `delivery2_sec` vs
`batch_sec`: the batch twin re-pairs the WHOLE corpus every run, the
stream pays only new-vs-index.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_stream_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.session import get_spark
from hypergraph_gpu_label_propagation_spark.streaming.dedup_stream import (
    banded_signatures,
    est_jaccard,
    run_stream_dedup,
)

THRESHOLD = 0.5
NUM_HASHES = 8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "ab_stream_dedup", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .cache()
    )
    n = docs.count()
    cut = int(n * 0.8)

    work = tempfile.mkdtemp(prefix="ab_stream_dedup_")
    try:
        stream_dir = os.path.join(work, "stream")
        state = os.path.join(work, "state")
        os.makedirs(stream_dir)

        docs.filter(F.col("doc_id") < cut).coalesce(4).write.parquet(
            os.path.join(stream_dir, "b1")
        )
        t0 = time.monotonic()
        run_stream_dedup(spark, stream_dir + "/*", state, threshold=THRESHOLD)
        d1 = round(time.monotonic() - t0, 2)

        docs.filter(F.col("doc_id") >= cut).coalesce(4).write.parquet(
            os.path.join(stream_dir, "b2")
        )
        t0 = time.monotonic()
        r2 = run_stream_dedup(spark, stream_dir + "/*", state, threshold=THRESHOLD)
        d2 = round(time.monotonic() - t0, 2)
        stream_links = {
            (r["new_id"], r["dup_of"]) for r in r2.links.collect()
        }

        t0 = time.monotonic()
        bands = banded_signatures(docs, "doc_id", "text")
        a = bands.select(
            F.col("doc_id").alias("new_id"), "band", "bucket",
            F.col("sig").alias("new_sig"),
        )
        b = bands.select(
            F.col("doc_id").alias("dup_of"), "band", "bucket",
            F.col("sig").alias("old_sig"),
        )
        batch = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("new_id") > F.col("dup_of"))
            .select("new_id", "dup_of", "new_sig", "old_sig")
            .distinct()
            .withColumn(
                "ej", est_jaccard(F.col("new_sig"), F.col("old_sig"), NUM_HASHES)
            )
            .filter(F.col("ej") >= THRESHOLD)
        )
        batch_links = {(r["new_id"], r["dup_of"]) for r in batch.collect()}
        batch_sec = round(time.monotonic() - t0, 2)

        assert stream_links == batch_links, (
            len(stream_links), len(batch_links),
            list(stream_links ^ batch_links)[:5],
        )
        print(
            json.dumps(
                {
                    "docs": n,
                    "links": len(stream_links),
                    "delivery1_sec": d1,
                    "delivery2_sec": d2,
                    "batch_sec": batch_sec,
                    "equal": True,
                    "sf_dir": sf_dir,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
