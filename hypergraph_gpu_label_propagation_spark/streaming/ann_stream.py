"""Streaming ANN-corpus growth: append new embeddings to the durable
IVF index per delivery.

At 100 TB the embedding corpus GROWS (new documents get embedded
continuously) while the index's coarse quantizer should not drift
under ingestion: the centroids are FROZEN at build time and only the
postings (inverted file) grow — the standard IVF practice (FAISS's
add-after-train shape; re-clustering is an explicit index REBUILD,
never an implicit side effect of ingestion).  Freezing the quantizer
is also what makes the append exact: a batch's postings are a pure
function of (batch, centroids), so appended postings are IDENTICAL to
what a full rebuild with the same centroids would produce — the pytest
contract below is exact row equality, not an estimate.

Per micro-batch: assign the new vectors to the frozen centroids with
the SAME `_build_inverted_file` the index writer uses (same cell_salt,
same round_dist — all read from the index's commit manifest, so an
append can never run with mismatched parameters), then commit the
posting rows under ``state_dir/delivery=<batch_id>`` via the
two-rename ``atomic_swap_write`` — a foreachBatch replay re-swaps
identical content instead of double-appending (the dedup_stream
protocol).

``stream_ivf_topk`` probes base-index ∪ deliveries with the shared
probe plan; results are row-identical to ``ivf_topk_from_index`` over
an index rebuilt on the full corpus with the same centroids.

No reference counterpart (the reference is batch-only); composes the
engine's IVF primitives with Structured Streaming.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
    _build_inverted_file,
    _probe_topk,
    load_ivf_meta,
)
from hypergraph_gpu_label_propagation_spark.streaming.dedup_stream import (
    check_checkpoint_not_reset,
    read_deliveries,
)
from hypergraph_gpu_label_propagation_spark.streaming.events import (
    atomic_swap_write,
)

EMBEDDING_STREAM_SCHEMA = "vec_id long, embedding array<double>"


@dataclass
class StreamIndexResult:
    num_batches: int
    rows_per_batch: list[int] = field(default_factory=list)


def run_stream_index_append(
    spark: SparkSession,
    stream_path: str,
    state_dir: str,
    index_name: str,
) -> StreamIndexResult:
    """Consume ``stream_path`` (a directory parquet embedding files
    arrive in) with availableNow semantics, appending each batch's
    postings — assigned against the index's FROZEN centroids — under
    ``state_dir/delivery=<batch_id>`` (two-rename swap, replay-
    idempotent).  The base index is never modified."""
    meta, centroids = load_ivf_meta(spark, index_name)
    os.makedirs(state_dir, exist_ok=True)
    counts: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        check_checkpoint_not_reset(state_dir, batch_id)
        postings = _build_inverted_file(
            batch_df,
            meta["id_col"],
            meta["vec_col"],
            centroids,
            meta.get("round_dist"),
            int(meta["cell_salt"]),
        )
        dest = os.path.join(state_dir, f"delivery={batch_id}")
        atomic_swap_write(postings, dest)
        counts.append(spark.read.parquet(dest).count())

    q = (
        spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
        .parquet(stream_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return StreamIndexResult(num_batches=len(counts), rows_per_batch=counts)


def stream_ivf_topk(
    spark: SparkSession,
    index_name: str,
    state_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """Probe base index ∪ streamed deliveries with the shared probe
    plan.  Because appends used the SAME frozen centroids and salt,
    the union of postings equals a full rebuild's inverted file — so
    results are row-identical to ``ivf_topk_from_index`` over that
    rebuild (pytest contract)."""
    meta, centroids = load_ivf_meta(spark, index_name)
    n_cells = int(meta["n_cells"])
    if nprobe < 1 or nprobe > n_cells:
        raise ValueError(f"nprobe must be in [1, {n_cells}], got {nprobe}")
    inv = spark.table(f"{index_name}_ivf_inv")
    extra = read_deliveries(spark, state_dir)
    if extra is not None:
        inv = inv.unionByName(extra.select(*inv.columns))
    return _probe_topk(
        inv,
        centroids,
        queries,
        id_col,
        vec_col,
        k=k,
        nprobe=nprobe,
        exclude_self=exclude_self,
        round_dist=meta.get("round_dist"),
        cell_salt=int(meta["cell_salt"]),
    )
