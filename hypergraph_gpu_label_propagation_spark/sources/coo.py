"""COO ingest — any (edge_id, vertex_id)-shaped table to the engine's
incidence schema (the Spark analog of the reference's pickle->JSON
converter, scripts/extract_data.py:24-120).

The converter's semantics we preserve:
- accepts either a dict-of-edges form (already our incidence relation)
  or a (V_idx, E_idx) COO pair (extract_data.py:24-27);
- vertices unknown to the label source get label -1, the "unlabeled"
  sentinel the kernels ignore when voting (extract_data.py:76-100);
- ids are densified to 0..n-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import HypergraphFrames
from hypergraph_gpu_label_propagation_spark.sources.source_files import dense_ids

UNLABELED = -1  # extract_data.py:76-100


def from_coo(
    coo: DataFrame,
    edge_col: str = "edge_id",
    vertex_col: str = "vertex_id",
    labels: DataFrame | None = None,
    label_vertex_col: str = "vertex_id",
    label_col: str = "label",
    densify: bool = True,
) -> HypergraphFrames:
    """Build HypergraphFrames from an arbitrary COO membership table.

    ``labels`` may cover only a subset of vertices; the rest get -1.
    With ``densify`` the (possibly sparse / string) ids are remapped to
    dense 0..n-1 longs, deterministically ordered by the original key
    (see sources.source_files.dense_ids).
    """
    pairs = coo.select(
        F.col(edge_col).alias("src_edge"), F.col(vertex_col).alias("src_vertex")
    ).distinct()

    if densify:
        vmap = dense_ids(pairs, ["src_vertex"], "vertex_id").persist()
        emap = dense_ids(pairs, ["src_edge"], "edge_id")
        incidence = (
            pairs.join(vmap, "src_vertex").join(emap, "src_edge")
            .select("edge_id", "vertex_id")
        )
    else:
        vmap = None
        incidence = pairs.select(
            F.col("src_edge").cast("long").alias("edge_id"),
            F.col("src_vertex").cast("long").alias("vertex_id"),
        )

    row = incidence.agg(
        (F.max("vertex_id") + 1).alias("nv"), F.count_distinct("edge_id").alias("ne")
    ).collect()[0]
    nv, ne = int(row["nv"] or 0), int(row["ne"] or 0)

    universe = incidence.sparkSession.range(nv).select(F.col("id").alias("vertex_id"))
    if labels is not None:
        lab_src = labels.select(
            F.col(label_vertex_col).alias("src_vertex"),
            F.col(label_col).cast("int").alias("label"),
        )
        if densify and vmap is not None:
            lab_src = lab_src.join(vmap, "src_vertex").select("vertex_id", "label")
        else:
            lab_src = lab_src.withColumnRenamed("src_vertex", "vertex_id")
        vertex_labels = universe.join(lab_src, "vertex_id", "left").select(
            "vertex_id", F.coalesce("label", F.lit(UNLABELED)).cast("int").alias("label")
        )
    else:
        vertex_labels = universe.select("vertex_id", F.lit(0).cast("int").alias("label"))

    return HypergraphFrames(incidence, vertex_labels, nv, ne)
