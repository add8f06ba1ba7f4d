"""Arrow majority kernel parity: identical results to the JVM
count-vector form on every edge case (ties, sentinels, all-masked keys,
multi-batch partitions)."""

from __future__ import annotations

import numpy as np

from hypergraph_gpu_label_propagation_spark.operators.majority import majority_label
from hypergraph_gpu_label_propagation_spark.operators.majority_arrow import (
    majority_label_arrow,
)


def _compare(spark, rows, max_labels=10):
    df = spark.createDataFrame(rows, "edge_id long, label int")
    jvm = {(r["edge_id"], r["label"]) for r in majority_label(df, "edge_id", "label", max_labels).collect()}
    arr = {(r["edge_id"], r["label"]) for r in majority_label_arrow(df, "edge_id", "label", max_labels).collect()}
    assert jvm == arr
    return jvm


def test_arrow_majority_basic_and_ties(spark):
    out = _compare(
        spark,
        [(0, 1), (0, 1), (0, 2), (1, 2), (1, 1), (2, 5)],  # e1: 2-vs-1 tie -> 1
    )
    assert (0, 1) in out and (1, 1) in out and (2, 5) in out


def test_arrow_majority_sentinels_and_all_masked(spark):
    out = _compare(spark, [(0, -1), (0, 3), (1, -1), (1, 99), (2, 0)])
    # key 1: every row out-of-range -> all-zero counts -> label 0
    assert (0, 3) in out and (1, 0) in out


def test_arrow_majority_random_parity(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(rng.integers(0, 200)), int(rng.integers(-1, 10))) for _ in range(5000)
    ]
    _compare(spark, rows, max_labels=10)
