"""Golden oracle: the reference algorithms transcribed to NumPy.

This module is the normative spec the Spark engine is tested against.
Label-propagation semantics follow the reference kernels exactly
(all four backends agree; see SURVEY.md "Normativity note"):

- vote weight is +1 per neighbor occurrence (unit weights; the README's
  1/edge_size claim is implemented by NO backend — reference
  src/openmp/label_propagation_openmp.cpp:86, src/cuda/label_propagation_cuda.cu:31);
- labels outside ``[0, max_labels)`` are silently ignored when counting
  (openmp:85-87) — ``-1`` is the "unlabeled" sentinel (scripts/extract_data.py:76-100);
- the winner is the SMALLEST label index attaining the max count
  (strict ``>`` argmax scan over ascending labels, openmp:89-98);
- all-zero counts (degree-0 vertex, or all neighbors unlabeled) yield
  label 0 (argmax of zeros picks index 0, openmp:104-146);
- edge labels are transient per-superstep state, re-derived from scratch
  each superstep (the "seed with previous edge label" in the reference is
  dead state: the argmax scan starts at best_w = -1.0, openmp:89-93);
- convergence: stop iff changes/num_vertices < tolerance (strict <),
  checked AFTER applying the superstep's update (openmp:148-156);
- default bound: max_labels = label_classes if > 0 else 10
  (src/common/argparse.cpp:277).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

Edges = list[list[int]]


def _majority(counts: np.ndarray) -> int:
    """Smallest index attaining the max count. counts: (max_labels,)."""
    return int(np.argmax(counts))  # np.argmax returns first (smallest) index on ties


def oracle_edge_majority(edges: Edges, labels: np.ndarray, max_labels: int = 10) -> np.ndarray:
    """Phase 1 (edge gather): per-edge majority label of member vertices.

    Mirrors reference src/openmp/label_propagation_openmp.cpp:66-102.
    """
    out = np.zeros(len(edges), dtype=np.int32)
    for e, members in enumerate(edges):
        counts = np.zeros(max_labels, dtype=np.float32)
        for v in members:
            lab = int(labels[v])
            if 0 <= lab < max_labels:
                counts[lab] += 1.0
        out[e] = _majority(counts)
    return out


def oracle_vertex_majority(
    edges: Edges, edge_labels: np.ndarray, num_vertices: int, max_labels: int = 10
) -> np.ndarray:
    """Phase 2 (vertex gather): per-vertex majority label of incident edges.

    Mirrors reference src/openmp/label_propagation_openmp.cpp:104-146.
    Degree-0 vertices get label 0 (argmax of all-zero counts).
    """
    counts = np.zeros((num_vertices, max_labels), dtype=np.float32)
    for e, members in enumerate(edges):
        lab = int(edge_labels[e])
        if 0 <= lab < max_labels:
            for v in members:
                counts[v, lab] += 1.0
    return counts.argmax(axis=1).astype(np.int32)


def oracle_superstep(
    edges: Edges, labels: np.ndarray, num_vertices: int, max_labels: int = 10
) -> tuple[np.ndarray, int]:
    """One full superstep; returns (new_labels, changes)."""
    edge_labels = oracle_edge_majority(edges, labels, max_labels)
    new_labels = oracle_vertex_majority(edges, edge_labels, num_vertices, max_labels)
    changes = int(np.count_nonzero(new_labels != labels))
    return new_labels, changes


@dataclass
class OracleLPResult:
    labels: np.ndarray
    iterations: int
    converged: bool
    changes_per_iter: list[int]


def oracle_label_propagation(
    edges: Edges,
    init_labels: np.ndarray,
    num_vertices: int,
    max_labels: int = 10,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
) -> OracleLPResult:
    """Full LP loop, reference src/openmp/label_propagation_openmp.cpp:58-158."""
    labels = np.asarray(init_labels, dtype=np.int32).copy()
    changes_per_iter: list[int] = []
    converged = False
    iterations = 0
    for _ in range(max_iterations):
        labels, changes = oracle_superstep(edges, labels, num_vertices, max_labels)
        iterations += 1
        changes_per_iter.append(changes)
        if changes / float(num_vertices) < tolerance:  # strict <, post-update
            converged = True
            break
    return OracleLPResult(labels, iterations, converged, changes_per_iter)


# ---------------------------------------------------------------------------
# Sibling algorithms (north rule): specs from public literature, not the
# reference repo — PageRank (Page et al. 1999), CC via min-label propagation,
# triangle counting on the clique expansion.
# ---------------------------------------------------------------------------


def oracle_hypergraph_pagerank(
    edges: Edges,
    num_vertices: int,
    damping: float = 0.85,
    max_iterations: int = 100,
    tol: float = 1e-10,
) -> np.ndarray:
    """PageRank of the two-step hypergraph random walk.

    Walk: from vertex v pick an incident hyperedge uniformly
    (1/degree(v)), then a member vertex of that edge uniformly
    (1/size(e)).  Transition matrix P = D_v^{-1} H D_e^{-1} H^T where H
    is the incidence matrix.  Degree-0 vertices are dangling: their rank
    mass is redistributed uniformly (standard PageRank dangling-node
    treatment).  Returns scores summing to 1.
    """
    degrees = np.zeros(num_vertices, dtype=np.float64)
    for members in edges:
        for v in members:
            degrees[v] += 1.0
    rank = np.full(num_vertices, 1.0 / num_vertices, dtype=np.float64)
    for _ in range(max_iterations):
        # phase 1: edge mass m_e = sum_{v in e} rank[v] / degree[v]
        new = np.zeros(num_vertices, dtype=np.float64)
        for members in edges:
            m = sum(rank[v] / degrees[v] for v in members) / len(members)
            # phase 2: scatter m_e / |e| to each member
            for v in members:
                new[v] += m
        dangling = rank[degrees == 0].sum()
        new += dangling / num_vertices
        new = (1.0 - damping) / num_vertices + damping * new
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < tol:
            break
    return rank


def oracle_connected_components(edges: Edges, num_vertices: int) -> np.ndarray:
    """Component id = min vertex id in the component (hypergraph connectivity:
    two vertices are connected if they share a hyperedge)."""
    comp = np.arange(num_vertices, dtype=np.int64)
    changed = True
    while changed:
        changed = False
        for members in edges:
            m = min(comp[v] for v in members)
            for v in members:
                if comp[v] > m:
                    comp[v] = m
                    changed = True
        # path-compress via one global pass (comp[v] -> comp[comp[v]])
        while True:
            nxt = comp[comp]
            if np.array_equal(nxt, comp):
                break
            comp = nxt
            changed = True
    return comp


def oracle_triangle_count(edges: Edges, num_vertices: int) -> int:
    """Triangles in the clique expansion: undirected simple graph with an
    edge {u,v} iff u != v co-occur in >= 1 hyperedge."""
    adj: list[set[int]] = [set() for _ in range(num_vertices)]
    for members in edges:
        uniq = sorted(set(members))
        for i, u in enumerate(uniq):
            for w in uniq[i + 1 :]:
                adj[u].add(w)
                adj[w].add(u)
    count = 0
    for u in range(num_vertices):
        for v in adj[u]:
            if v <= u:
                continue
            count += len(adj[u] & adj[v] & set(range(v + 1, num_vertices)))
    return count


def oracle_weighted_vertex_majority(
    edges: Edges, edge_labels: np.ndarray, num_vertices: int, max_labels: int = 10
) -> np.ndarray:
    """Weighted phase 2 (reference README.md:153 variant, implemented by
    no reference backend): each incident edge votes its label with weight
    1/edge_size; weighted counts quantized to 9 decimals before the
    argmax (mirrors operators/label_propagation.py
    weighted_vertex_majority_step's FP-order immunity)."""
    counts = np.zeros((num_vertices, max_labels), dtype=np.float64)
    for e, members in enumerate(edges):
        lab = int(edge_labels[e])
        if 0 <= lab < max_labels:
            w = 1.0 / len(members)
            for v in members:
                counts[v, lab] += w
    return np.round(counts, 9).argmax(axis=1).astype(np.int32)
