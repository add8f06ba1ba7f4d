"""Unit tests of the NumPy oracle itself against hand-computed examples
(FIXTURES.md T4). The oracle is the transcription of the reference
kernels; everything else is tested against it."""

from __future__ import annotations

import numpy as np

from hypergraph_gpu_label_propagation_spark.oracle import (
    oracle_connected_components,
    oracle_edge_majority,
    oracle_hypergraph_pagerank,
    oracle_label_propagation,
    oracle_superstep,
    oracle_triangle_count,
)


def test_edge_majority_basic():
    # edge [0,1,2] labels [1,1,2] -> majority 1
    out = oracle_edge_majority([[0, 1, 2]], np.array([1, 1, 2]), max_labels=10)
    assert out.tolist() == [1]


def test_edge_majority_tie_smallest_wins():
    # tiny_tie: 2-vs-2 tie between labels 2 and 1 -> smallest (1) wins
    out = oracle_edge_majority([[0, 1, 2, 3]], np.array([2, 2, 1, 1]), max_labels=10)
    assert out.tolist() == [1]


def test_edge_majority_ignores_unlabeled():
    out = oracle_edge_majority([[0, 1, 2]], np.array([-1, -1, 3]), max_labels=10)
    assert out.tolist() == [3]
    # all unlabeled -> all-zero counts -> label 0
    out = oracle_edge_majority([[0, 1]], np.array([-1, -1]), max_labels=10)
    assert out.tolist() == [0]


def test_edge_majority_ignores_out_of_range_high():
    out = oracle_edge_majority([[0, 1, 2]], np.array([11, 11, 4]), max_labels=10)
    assert out.tolist() == [4]


def test_superstep_path_graph():
    # tiny_path: nv=4, edges [[0,1],[1,2],[2,3]], labels [0,1,1,0]
    edges = [[0, 1], [1, 2], [2, 3]]
    labels = np.array([0, 1, 1, 0], dtype=np.int32)
    # phase 1: e0 {0,1}: tie 0/1 -> 0; e1 {1,1} -> 1; e2 {1,0}: tie -> 0
    # phase 2: v0 edges{e0}->0; v1 edges{e0,e1} counts {0:1,1:1} tie->0;
    #          v2 edges{e1,e2} tie->0; v3 edges{e2}->0
    new, changes = oracle_superstep(edges, labels, 4)
    assert new.tolist() == [0, 0, 0, 0]
    assert changes == 2


def test_degree_zero_vertex_gets_zero():
    # vertex 2 is isolated and starts with label 5 -> becomes 0
    edges = [[0, 1]]
    labels = np.array([3, 3, 5], dtype=np.int32)
    new, changes = oracle_superstep(edges, labels, 3)
    assert new.tolist() == [3, 3, 0]
    assert changes == 1


def test_lp_convergence_fixed_point():
    edges = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 4]]
    labels = np.array([0, 1, 2, 3, 4], dtype=np.int32)
    res = oracle_label_propagation(edges, labels, 5)
    assert res.converged
    # converged state is a fixed point: one more superstep changes nothing
    again, changes = oracle_superstep(edges, res.labels, 5)
    assert changes == 0
    assert np.array_equal(again, res.labels)


def test_pagerank_sums_to_one_and_uniform_on_symmetric():
    # 3-cycle of pairwise edges: symmetric -> uniform rank
    edges = [[0, 1], [1, 2], [2, 0]]
    r = oracle_hypergraph_pagerank(edges, 3)
    assert abs(r.sum() - 1.0) < 1e-9
    assert np.allclose(r, 1.0 / 3, atol=1e-8)


def test_pagerank_dangling_mass():
    # vertex 2 isolated: rank still sums to 1
    edges = [[0, 1]]
    r = oracle_hypergraph_pagerank(edges, 3)
    assert abs(r.sum() - 1.0) < 1e-9
    assert r[2] < r[0]


def test_connected_components():
    edges = [[0, 1, 2], [2, 3], [5, 6]]
    comp = oracle_connected_components(edges, 8)
    assert comp.tolist() == [0, 0, 0, 0, 4, 5, 5, 7]


def test_triangle_count():
    # one hyperedge of 4 vertices -> K4 -> 4 triangles
    assert oracle_triangle_count([[0, 1, 2, 3]], 4) == 4
    # path graph: no triangles
    assert oracle_triangle_count([[0, 1], [1, 2], [2, 3]], 4) == 0
    # triangle via three pairwise edges
    assert oracle_triangle_count([[0, 1], [1, 2], [0, 2]], 3) == 1
