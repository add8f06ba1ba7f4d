"""Property-based tests of the golden oracle (pure NumPy — no Spark, so
hundreds of examples are cheap).  These pin the reference semantics the
Spark engine is later compared against."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hypergraph_gpu_label_propagation_spark.oracle import (
    oracle_edge_majority,
    oracle_label_propagation,
    oracle_superstep,
)


@st.composite
def hypergraphs(draw):
    nv = draw(st.integers(min_value=2, max_value=25))
    ne = draw(st.integers(min_value=1, max_value=40))
    edges = []
    for _ in range(ne):
        k = draw(st.integers(min_value=1, max_value=min(5, nv)))
        members = draw(
            st.lists(st.integers(0, nv - 1), min_size=k, max_size=k, unique=True)
        )
        edges.append(members)
    labels = draw(
        st.lists(st.integers(-1, 9), min_size=nv, max_size=nv)
    )
    return edges, np.array(labels, dtype=np.int32), nv


@given(hypergraphs())
@settings(max_examples=150, deadline=None)
def test_labels_always_in_range_after_superstep(hg):
    edges, labels, nv = hg
    new, _ = oracle_superstep(edges, labels, nv, max_labels=10)
    assert ((new >= 0) & (new < 10)).all(), "post-superstep labels must be in [0, max_labels)"


@given(hypergraphs())
@settings(max_examples=60, deadline=None)
def test_convergence_is_fixed_point(hg):
    edges, labels, nv = hg
    res = oracle_label_propagation(edges, labels, nv, max_labels=10, max_iterations=100)
    if res.converged:
        again, changes = oracle_superstep(edges, res.labels, nv, max_labels=10)
        assert changes == 0 and np.array_equal(again, res.labels)
    assert res.iterations <= 100


@given(hypergraphs())
@settings(max_examples=100, deadline=None)
def test_edge_majority_is_argmax_with_smallest_tiebreak(hg):
    edges, labels, nv = hg
    out = oracle_edge_majority(edges, labels, max_labels=10)
    for e, members in enumerate(edges):
        counts = np.zeros(10)
        for v in members:
            if 0 <= labels[v] < 10:
                counts[labels[v]] += 1
        winners = np.flatnonzero(counts == counts.max())
        assert out[e] == winners.min(), "must pick the smallest label attaining the max"


@given(hypergraphs(), st.integers(0, 3))
@settings(max_examples=40, deadline=None)
def test_permuting_edge_order_does_not_change_result(hg, rot):
    edges, labels, nv = hg
    rotated = edges[rot:] + edges[:rot]
    a = oracle_label_propagation(edges, labels, nv, max_labels=10)
    b = oracle_label_propagation(rotated, labels, nv, max_labels=10)
    assert a.labels.tolist() == b.labels.tolist()
    assert a.iterations == b.iterations
