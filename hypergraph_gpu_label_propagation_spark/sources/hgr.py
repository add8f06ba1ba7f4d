"""HGR1 binary interop (reference format v1, include/hypergraph.hpp:100-112).

Byte-level layout (little-endian):

    uint32 magic   = 0x31475248  (utils.hpp:15 — note: the constant is
                     written as 'H''G''R''1' in the reference comment but
                     its little-endian byte sequence on disk is b"HRG1")
    uint32 version = 1
    uint64 num_vertices
    uint64 num_edges
    repeat num_edges: uint64 edge_size, uint64 vertices[edge_size]
    uint8  has_labels (writer always emits 1, hypergraph.cpp:318)
    if has_labels: int32 labels[num_vertices]

Reader validation mirrors utils.hpp:301-344: magic/version, nv > 0,
edge_size > 0, truncation checks; the labels block is optional for
forward compatibility (read iff the flag byte is present and 1).

This is a driver-side interop utility for exchanging graphs with the
reference binaries — the engine's native storage is parquet of the
incidence + labels relations (model.py).  Format sniffing
(hypergraph.cpp:332-348: first non-whitespace byte '{' => JSON, else
binary) lives in :func:`load_any`.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import HypergraphFrames

HGR_MAGIC = 0x31475248
HGR_VERSION = 1


def save_hgr(
    frames: HypergraphFrames, path: str, max_records: int | None = None
) -> None:
    """Collects to the driver — small-graph interop only (``max_records``
    guards the collect; see collect_edge_member_lists).  Member order
    is preserved (insertion order) when the frames carry positions, so a
    load->save roundtrip byte-compares with the reference writer's output
    (hypergraph.cpp:293-326)."""
    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        MAX_INTEROP_RECORDS,
        collect_edge_member_lists,
    )

    edges = collect_edge_member_lists(
        frames,
        max_records=MAX_INTEROP_RECORDS if max_records is None else max_records,
    )
    labels = np.zeros(frames.num_vertices, dtype=np.int32)
    for r in frames.vertex_labels.collect():
        labels[r["vertex_id"]] = r["label"]
    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", HGR_MAGIC, HGR_VERSION, frames.num_vertices, len(edges)))
        for r in edges:
            ms = r["ms"]
            f.write(struct.pack("<Q", len(ms)))
            f.write(np.asarray(ms, dtype="<u8").tobytes())
        f.write(struct.pack("<B", 1))
        f.write(labels.astype("<i4").tobytes())


def load_hgr(spark: SparkSession, path: str) -> HypergraphFrames:
    with open(path, "rb") as f:
        head = f.read(24)
        if len(head) < 24:
            raise ValueError(f"Invalid hypergraph file (truncated header): {path}")
        magic, version, nv, ne = struct.unpack("<IIQQ", head)
        if magic != HGR_MAGIC or version != HGR_VERSION:
            raise ValueError(f"Invalid hypergraph file (bad magic/version): {path}")
        if nv == 0:
            raise ValueError(f"Invalid hypergraph file (bad header): {path}")
        inc_rows = []
        for e in range(ne):
            raw = f.read(8)
            if len(raw) < 8:
                raise ValueError(f"Invalid hypergraph file (bad edge size): {path}")
            (sz,) = struct.unpack("<Q", raw)
            if sz == 0:
                raise ValueError(f"Invalid hypergraph file (bad edge size): {path}")
            verts = np.frombuffer(f.read(8 * sz), dtype="<u8")
            if len(verts) < sz:
                raise ValueError(f"Invalid hypergraph file (truncated vertices): {path}")
            for i, v in enumerate(verts):
                if v >= nv:
                    raise ValueError("vertex id out of range (hypergraph.cpp:19-21)")
                inc_rows.append((e, int(v), i))
        flag = f.read(1)
        labels = None
        if flag and flag[0] == 1:
            lab = np.frombuffer(f.read(4 * nv), dtype="<i4")
            if len(lab) < nv:
                raise ValueError(f"Invalid hypergraph file (truncated labels): {path}")
            labels = lab

    incidence_pos = spark.createDataFrame(
        inc_rows, "edge_id long, vertex_id long, pos int"
    )
    incidence = incidence_pos.select("edge_id", "vertex_id")
    if labels is not None:
        lab_df = spark.createDataFrame(
            [(i, int(l)) for i, l in enumerate(labels)], "vertex_id long, label int"
        )
    else:
        lab_df = spark.range(nv).select(
            F.col("id").alias("vertex_id"), F.lit(0).cast("int").alias("label")
        )
    return HypergraphFrames(incidence, lab_df, int(nv), int(ne), incidence_pos)


def load_any(spark: SparkSession, path: str) -> HypergraphFrames:
    """Format sniffing (hypergraph.cpp:332-348): first non-whitespace
    byte '{' => JSON (either schema), else HGR1 binary."""
    with open(path, "rb") as f:
        head = f.read(64)
    stripped = head.lstrip()
    if stripped[:1] == b"{":
        from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
            load_hypergraph_json,
        )
        return load_hypergraph_json(spark, path)
    return load_hgr(spark, path)
