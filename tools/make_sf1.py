"""Synthesize an sf1-scale (10x sf0.1) benchmark input in /tmp for the
scaling audit (r05 verdict #8).

The headline board has only ever been timed at sf0.1; a 10x point
catches superlinear entries.  Tables are built from the driver-provided
sf0.1 parquet by key-shifted replication (10 disjoint copies):

- ``lineitem``/``orders``: l_orderkey/o_orderkey += i*OFF_O and
  l_partkey += i*OFF_P — graph entries see a 10x-vertex, 10x-edge
  hypergraph of identical local structure (clean scaling denominator);
- ``documents``: doc_id shifted; every TOKEN gets a per-copy tag (an
  injective token remap per copy: intra-copy shingle/Jaccard structure
  is preserved exactly, and copies share ZERO shingles, so MinHash/LSH
  workloads scale in corpus size instead of drowning in cross-copy
  near-duplicates — a plain per-doc suffix left ~all shingles shared
  and blew the sf1 candidate-pair count 7000x, caught r05);
- ``embeddings``: vec_id shifted; vectors ROTATED by the copy index
  (norm-preserving, directions decorrelate) so ANN/near-dup workloads
  scale in corpus size rather than degenerating into 10-way ties;
- ``events``: event_id/user_id shifted, timestamps kept (10x event
  density in the same wall-clock range — the streaming state scales in
  keys and rows, the window count stays fixed);
- dimension tables copied as-is.

Everything derives from the driver's own testdata — no external data.

Usage: python tools/make_sf1.py [out_dir]  (default /tmp/sf1_synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.session import get_spark

COPIES = 10
SRC = "/root/testdata/sf0.1"


def synthesize(spark, out: str) -> None:
    """Build the sf1 tables under ``out`` from the driver's sf0.1
    parquet.  Callable from bench.py (sf1 standing gate, r05 verdict
    #7) with the bench's own session."""
    os.makedirs(out, exist_ok=True)

    def rd(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def wr(df, name):
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")

    li = rd("lineitem")
    od = rd("orders")
    off_o = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    off_p = li.agg(F.max("l_partkey")).collect()[0][0] + 1

    wr(
        li.crossJoin(spark.range(COPIES).select(F.col("id").alias("_i"))).select(
            (F.col("l_orderkey") + F.col("_i") * off_o).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_i") * off_p).alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        ),
        "lineitem",
    )
    wr(
        od.crossJoin(spark.range(COPIES).select(F.col("id").alias("_i"))).select(
            (F.col("o_orderkey") + F.col("_i") * off_o).alias("o_orderkey"),
            *[c for c in od.columns if c != "o_orderkey"],
        ),
        "orders",
    )

    docs = rd("documents")
    off_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    tag = F.concat(F.lit("q"), F.col("_i").cast("string"))
    tagged_text = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda w: F.concat(w, tag)),
        " ",
    )
    wr(
        docs.crossJoin(spark.range(COPIES).select(F.col("id").alias("_i"))).select(
            (F.col("doc_id") + F.col("_i") * off_d).alias("doc_id"),
            tagged_text.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        ),
        "documents",
    )

    emb = rd("embeddings")
    off_v = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    rotated = F.when(F.col("_i") == 0, F.col("embedding"))
    for i in range(1, COPIES):
        rotated = rotated.when(
            F.col("_i") == i,
            F.concat(
                F.slice("embedding", i + 1, dim - i), F.slice("embedding", 1, i)
            ),
        )
    wr(
        emb.crossJoin(spark.range(COPIES).select(F.col("id").alias("_i"))).select(
            (F.col("vec_id") + F.col("_i") * off_v).alias("vec_id"),
            rotated.alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        ),
        "embeddings",
    )

    ev = rd("events")
    off_e = ev.agg(F.max("event_id")).collect()[0][0] + 1
    off_u = ev.agg(F.max("user_id")).collect()[0][0] + 1
    wr(
        ev.crossJoin(spark.range(COPIES).select(F.col("id").alias("_i"))).select(
            (F.col("event_id") + F.col("_i") * off_e).alias("event_id"),
            (F.col("user_id") + F.col("_i") * off_u).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        ),
        "events",
    )

    for name in ("region", "nation", "customer", "supplier", "part"):
        wr(rd(name), name)
    print(f"done: {out}")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    spark = get_spark("make_sf1")
    synthesize(spark, out)


if __name__ == "__main__":
    main()
