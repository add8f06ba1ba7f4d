"""Pure-NumPy golden oracles (no Spark).

These transcribe the reference kernels' exact semantics and serve as the
correctness bar for the Spark engine (SURVEY.md section 5.1).
"""

from hypergraph_gpu_label_propagation_spark.oracle.numpy_ref import (
    oracle_connected_components,
    oracle_edge_majority,
    oracle_hypergraph_pagerank,
    oracle_label_propagation,
    oracle_superstep,
    oracle_triangle_count,
)

__all__ = [
    "oracle_connected_components",
    "oracle_edge_majority",
    "oracle_hypergraph_pagerank",
    "oracle_label_propagation",
    "oracle_superstep",
    "oracle_triangle_count",
]
