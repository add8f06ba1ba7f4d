"""Arrow-vectorized alternative majority kernel.

``applyInPandas`` + ``np.bincount`` argmax per group — the literal
Spark translation of the reference's per-thread count-scratch kernels
(cuda.cu:21-44: bounded count array + smallest-index argmax).  Kept as
an A/B alternative to the plan-of-record pure-JVM count-vector form
(operators/majority.py): profiling on this container shows the JVM form
wins (no Python worker round-trip, full whole-stage codegen), but the
Arrow form is the extension point for weighted votes or richer
tie-break policies that outgrow SQL expressions.

np.bincount + argmax reproduce the reference tie-break exactly:
argmax returns the FIRST (smallest) index attaining the max, and
labels outside [0, max_labels) are filtered before counting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def majority_label_arrow(
    df: DataFrame,
    key: str,
    label_col: str = "label",
    max_labels: int = 10,
    out_col: str = "label",
) -> DataFrame:
    """Same contract as operators.majority.majority_label, computed with
    an Arrow-batched mapInPandas over key-partitioned data — one Python
    invocation per partition (not per group), vectorized bincount."""
    return _map_partition_exact(df, key, label_col, max_labels, out_col)


def _map_partition_exact(
    df: DataFrame, key: str, label_col: str, max_labels: int, out_col: str
) -> DataFrame:
    """mapInPandas over key-partitioned data.  A key's rows are all in
    one partition but may span several Arrow BATCHES inside it, so the
    UDF accumulates per-key count vectors across the partition's batches
    and emits once at the end — exact, single Python pass, bounded
    memory (n_keys_in_partition x max_labels ints)."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            lab = pdf[label_col].to_numpy()
            keys = pdf[key].to_numpy()
            mask = (lab >= 0) & (lab < max_labels)
            keys_m, lab_m = keys[mask], lab[mask]
            uk, inv = np.unique(keys_m, return_inverse=True)
            counts = np.zeros((len(uk), max_labels), dtype=np.int64)
            np.add.at(counts, (inv, lab_m), 1)
            for i, k in enumerate(uk):
                prev = acc.get(int(k))
                acc[int(k)] = counts[i] if prev is None else prev + counts[i]
            # keys whose every row is masked out must still emit label 0
            for k in np.unique(keys[~mask]):
                acc.setdefault(int(k), np.zeros(max_labels, dtype=np.int64))
        if acc:
            ks = np.fromiter(acc.keys(), dtype=np.int64)
            labs = np.array([int(v.argmax()) for v in acc.values()], dtype=np.int32)
            yield pd.DataFrame({key: ks, out_col: labs})

    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        df.select(key, label_col)
        .repartition(parts, key)
        .mapInPandas(per_partition, f"{key} long, {out_col} int")
    )
