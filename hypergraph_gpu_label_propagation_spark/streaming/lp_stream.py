"""Incremental label propagation over a growing incidence stream.

The 100 TB deployment shape: the source-code hypergraph GROWS (new
commits land continuously), and re-running LP cold over 10^12 files per
update is wasteful.  This module runs LP incrementally with
``foreachBatch``:

- each micro-batch appends new ``(edge_id, vertex_id)`` incidence rows
  to the accumulated graph (parquet state dir, same crash-safe
  swap-with-marker protocol as ``events.run_degrees_merge``);
- LP re-converges WARM-STARTED from the previous batch's converged
  labels — new vertices enter with the default init, existing vertices
  keep their labels, so the fixed point is typically re-reached in a
  couple of supersteps instead of a full cold run (the delta only
  perturbs labels near the new edges).

Semantics note (why warm-start is sound): a converged LP labeling is a
FIXED POINT of the superstep operator (zero changes).  Warm-starting
from the previous fixed point and iterating the same operator over the
grown graph converges to a fixed point of the NEW graph — the property
:func:`fixed_point_violations` certifies (and the pytest asserts).
Like any asynchronous-ish LP schedule, WHICH fixed point is reached may
differ from a cold run's (LP fixed points are not unique); the
certificate, not bit-equality with a cold run, is the correctness
contract.

No reference counterpart (the reference is batch-only); this composes
the engine's own superstep with Structured Streaming.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
    label_propagation,
    lp_superstep,
)
from hypergraph_gpu_label_propagation_spark.streaming.events import (
    atomic_swap_write,
    recover_swap,
)

INCIDENCE_STREAM_SCHEMA = "edge_id long, vertex_id long"


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a state dir maintained by :func:`atomic_swap_write`; None if
    it doesn't exist yet.  A dir present WITHOUT ``_SUCCESS`` after
    recovery is corrupt foreign state — raise instead of silently
    treating the accumulated graph as empty (a truncated graph would
    still pass the fixed-point certificate, on the wrong graph)."""
    recover_swap(path)
    if not os.path.exists(path):
        return None
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise ValueError(
            f"state dir {path} exists but has no _SUCCESS marker — "
            "not a snapshot this module wrote; refusing to rebuild "
            "state from only the new batch (delete the dir to reset)"
        )
    return spark.read.parquet(path)


@dataclass
class IncrementalLPResult:
    labels: DataFrame            # (vertex_id, label) after the last batch
    num_batches: int
    supersteps_per_batch: list[int] = field(default_factory=list)


def fixed_point_violations(
    hg: Hypergraph, labels: DataFrame, max_labels: int = 10
) -> int:
    """Number of vertices whose label would change under one more
    superstep — 0 certifies ``labels`` is a fixed point of LP on
    ``hg`` (the correctness contract of any LP schedule)."""
    step = lp_superstep(hg, labels, max_labels)
    return int(step.agg(F.sum("changed")).collect()[0][0] or 0)


def run_incremental_lp(
    spark: SparkSession,
    stream_path: str,
    state_dir: str,
    max_labels: int = 10,
    max_iterations: int = 100,
) -> IncrementalLPResult:
    """Consume ``stream_path`` (a directory parquet files of incidence
    rows arrive in) with availableNow semantics, re-converging LP after
    each micro-batch; returns the final labels plus per-batch superstep
    counts (the warm-start win: batches after the first typically need
    1-3 supersteps).

    State layout under ``state_dir``: ``incidence/`` (accumulated
    incidence parquet) and ``labels/`` (latest converged labels).
    """
    os.makedirs(state_dir, exist_ok=True)
    inc_dir = os.path.join(state_dir, "incidence")
    lab_dir = os.path.join(state_dir, "labels")
    counts: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            F.col("edge_id").cast("long"), F.col("vertex_id").cast("long")
        ).distinct()
        prev_inc = _read_state(spark, inc_dir)
        acc = batch if prev_inc is None else prev_inc.unionByName(batch).distinct()
        # write-to-temp + two-rename swap: a crash mid-write leaves the
        # previous complete snapshot recoverable (the naive overwrite
        # had a window where _SUCCESS was gone and the next batch would
        # silently rebuild state from only the new rows)
        atomic_swap_write(acc, inc_dir)

        hg = Hypergraph.freeze(spark, spark.read.parquet(inc_dir))
        prev = _read_state(spark, lab_dir)
        if prev is not None:
            # warm start: keep converged labels, default-init new vertices
            init = (
                hg.vertices()
                .join(prev, "vertex_id", "left")
                .select(
                    "vertex_id",
                    F.coalesce(
                        "label", (F.col("vertex_id") % max_labels).cast("int")
                    ).alias("label"),
                )
            )
        else:
            init = hg.vertices().select(
                "vertex_id", (F.col("vertex_id") % max_labels).cast("int").alias("label")
            )
        res = label_propagation(
            hg, init, max_labels=max_labels, max_iterations=max_iterations
        )
        atomic_swap_write(res.labels, lab_dir)
        counts.append(res.iterations)
        hg.unpersist()

    q = (
        spark.readStream.schema(INCIDENCE_STREAM_SCHEMA)
        .parquet(stream_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return IncrementalLPResult(
        labels=spark.read.parquet(lab_dir),
        num_batches=len(counts),
        supersteps_per_batch=counts,
    )


def run_incremental_cc(
    spark: SparkSession,
    stream_path: str,
    state_dir: str,
    max_iterations: int = 200,
) -> IncrementalLPResult:
    """Incremental connected components over the same growing-incidence
    stream protocol as :func:`run_incremental_lp` — but with a STRONGER
    guarantee: min-label propagation has a UNIQUE fixed point (each
    vertex's component minimum), labels only decrease, and the previous
    minima are valid upper bounds on the grown graph's minima, so the
    warm-started result EQUALS the cold full-graph run exactly (the
    pytest asserts equality, not just a fixed-point certificate)."""
    from hypergraph_gpu_label_propagation_spark.operators.components import (
        connected_components,
    )

    os.makedirs(state_dir, exist_ok=True)
    inc_dir = os.path.join(state_dir, "incidence")
    comp_dir = os.path.join(state_dir, "components")
    counts: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            F.col("edge_id").cast("long"), F.col("vertex_id").cast("long")
        ).distinct()
        prev_inc = _read_state(spark, inc_dir)
        acc = batch if prev_inc is None else prev_inc.unionByName(batch).distinct()
        atomic_swap_write(acc, inc_dir)

        hg = Hypergraph.freeze(spark, spark.read.parquet(inc_dir))
        prev = None
        old = _read_state(spark, comp_dir)
        if old is not None:
            # warm start: previous minima; new vertices start at self
            prev = (
                hg.vertices()
                .join(old, "vertex_id", "left")
                .select(
                    "vertex_id",
                    F.coalesce("component", F.col("vertex_id")).alias("component"),
                )
            )
        res = connected_components(
            hg, max_iterations=max_iterations, initial=prev
        )
        atomic_swap_write(res.components, comp_dir)
        counts.append(res.iterations)
        hg.unpersist()

    q = (
        spark.readStream.schema(INCIDENCE_STREAM_SCHEMA)
        .parquet(stream_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return IncrementalLPResult(
        labels=spark.read.parquet(comp_dir),
        num_batches=len(counts),
        supersteps_per_batch=counts,
    )


def run_incremental_pagerank(
    spark: SparkSession,
    stream_path: str,
    state_dir: str,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iterations: int = 100,
) -> IncrementalLPResult:
    """Incremental PageRank over the growing-incidence stream protocol —
    the STRONGEST guarantee of the incremental trio: the PageRank map is
    an L1 contraction with factor ``damping`` to a UNIQUE fixed point,
    so the warm-started run converges to THE SAME ranks as a cold run
    of the grown graph (allclose within the tol-driven error bound
    tol * damping / (1 - damping)).  (LP gets a fixed-point
    certificate, CC exact equality, PR unique-limit allclose — each the
    strongest property its operator admits.)

    Iteration-savings honesty: the warm start's initial L1 error is the
    size of the perturbation (measured ~100x below a cold start's for a
    single-edge graft on a 300-vertex fixture), but the SAVINGS depend
    on how that perturbation projects onto the walk's slow eigenmodes.
    A fixed-point difference lives disproportionately in slow modes
    (the uniform cold start, by contrast, barely projects onto them),
    so the tail decays at the same spectral rate and warm can even take
    a few MORE tail iterations than cold at equal tol (measured 66-83
    vs ~70 across fixtures).  The guarantee is the destination, not the
    speed; ``supersteps_per_batch`` records what each batch took."""
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        hypergraph_pagerank,
    )

    os.makedirs(state_dir, exist_ok=True)
    inc_dir = os.path.join(state_dir, "incidence")
    rank_dir = os.path.join(state_dir, "ranks")
    counts: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            F.col("edge_id").cast("long"), F.col("vertex_id").cast("long")
        ).distinct()
        prev_inc = _read_state(spark, inc_dir)
        acc = batch if prev_inc is None else prev_inc.unionByName(batch).distinct()
        atomic_swap_write(acc, inc_dir)

        hg = Hypergraph.freeze(spark, spark.read.parquet(inc_dir))
        res = hypergraph_pagerank(
            hg, damping=damping, tol=tol, max_iterations=max_iterations,
            initial_ranks=_read_state(spark, rank_dir),
        )
        atomic_swap_write(res.ranks, rank_dir)
        counts.append(res.iterations)
        hg.unpersist()

    q = (
        spark.readStream.schema(INCIDENCE_STREAM_SCHEMA)
        .parquet(stream_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return IncrementalLPResult(
        labels=spark.read.parquet(rank_dir),
        num_batches=len(counts),
        supersteps_per_batch=counts,
    )
