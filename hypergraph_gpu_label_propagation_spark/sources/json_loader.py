"""JSON hypergraph ingestion — both reference schemas.

Reference parser: include/utils.hpp:153-298 (hand-rolled stream parser).

Simple schema (utils.hpp:185-224, README.md:119-131)::

    {"num_vertices": N, "edges"|"hyperedges": [[v, ...], ...],
     "labels": [...]?}

  - key aliases: num_vertices | vertices | numVertices;
  - hyperedges must be non-empty; labels length must equal num_vertices.

Rich schema (utils.hpp:225-288, README.md:147-150) — triggered by any of
``type == "hypergraph"``, ``node-data``, ``edge-dict``::

    {"type": "hypergraph", "hypergraph-data": {...},
     "node-data": {sid: attrs, ...}, "edge-dict": {eid: [sid, ...], ...}}

  - string vertex ids densified 0..N-1 in FIRST-SEEN order: node-data
    keys first (document order), then edge-dict members (utils.hpp:167-175);
  - vertex set = union of node-data keys and edge-dict members;
  - edge-dict keys are ignored; edge order = document order;
  - top-level "labels" allowed, length must equal the union size.

Parity requires document order, which ``json.loads`` preserves (Python
dicts are insertion-ordered), so parsing happens driver-side and the
result is parallelized — correct and exact for the reference's dataset
sizes (millions of edges).  For bulk distributed ingest of
simple-schema files use :func:`load_json_simple_distributed`, which
keeps everything in ``spark.read.json`` + ``posexplode``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import HypergraphFrames

_SIMPLE_NV_KEYS = ("num_vertices", "vertices", "numVertices")


def _frames_from_edges(
    spark: SparkSession,
    edges: list[list[int]],
    num_vertices: int,
    labels: list[int] | None,
) -> HypergraphFrames:
    inc_rows = [
        (e, int(v), i) for e, members in enumerate(edges) for i, v in enumerate(members)
    ]
    incidence_pos = spark.createDataFrame(inc_rows, "edge_id long, vertex_id long, pos int")
    incidence = incidence_pos.select("edge_id", "vertex_id")
    if labels is not None:
        if len(labels) != num_vertices:
            raise ValueError(
                "JSON: labels size must equal number of vertices (utils.hpp:293-295)"
            )
        lab = spark.createDataFrame(
            [(i, int(l)) for i, l in enumerate(labels)], "vertex_id long, label int"
        )
    else:
        lab = spark.range(num_vertices).select(
            F.col("id").alias("vertex_id"), F.lit(0).cast("int").alias("label")
        )
    return HypergraphFrames(incidence, lab, num_vertices, len(edges), incidence_pos)


def load_hypergraph_json(spark: SparkSession, path_or_text: str) -> HypergraphFrames:
    """Load either schema from a file path or a JSON string; schema is
    detected the way the reference does (rich iff type/node-data/edge-dict
    present, utils.hpp:279-281)."""
    if path_or_text.lstrip().startswith("{"):
        doc = json.loads(path_or_text)
    else:
        with open(path_or_text) as f:
            doc = json.load(f)

    is_rich = (
        doc.get("type") == "hypergraph" or "node-data" in doc or "edge-dict" in doc
    )
    labels = doc.get("labels")

    if not is_rich:
        num_vertices = 0
        for k in _SIMPLE_NV_KEYS:
            if k in doc:
                num_vertices = int(doc[k])
        if num_vertices <= 0:
            raise ValueError("JSON: missing/invalid num_vertices (utils.hpp:310)")
        edges = doc.get("edges", doc.get("hyperedges", []))
        for e in edges:
            if not e:
                raise ValueError("JSON: hyperedge cannot be empty (utils.hpp:317)")
            for v in e:
                if not (0 <= int(v) < num_vertices):
                    raise ValueError("JSON: vertex id out of range (hypergraph.cpp:19-21)")
        return _frames_from_edges(spark, edges, num_vertices, labels)

    # rich schema: first-seen-order densification
    idmap: dict[str, int] = {}

    def ensure_id(sid: str) -> int:
        if sid not in idmap:
            idmap[sid] = len(idmap)
        return idmap[sid]

    for sid in doc.get("node-data", {}):
        ensure_id(sid)
    edges = []
    for _eid, members in doc.get("edge-dict", {}).items():
        if not members:
            raise ValueError("JSON: hyperedge cannot be empty (utils.hpp:317)")
        edges.append([ensure_id(s) for s in members])
    if not idmap:
        raise ValueError("JSON: no vertices found in node-data/edge-dict")
    return _frames_from_edges(spark, edges, len(idmap), labels)


def load_json_simple_distributed(spark: SparkSession, path: str) -> HypergraphFrames:
    """Fully distributed simple-schema ingest: spark.read.json(multiLine)
    + posexplode — for bulk files too large for driver parsing."""
    raw = spark.read.option("multiLine", "true").json(path)
    cols = set(raw.columns)
    edges_col = "edges" if "edges" in cols else "hyperedges"
    nv_col = next(k for k in _SIMPLE_NV_KEYS if k in cols)
    num_vertices = int(raw.select(nv_col).collect()[0][0])
    exploded = raw.select(F.posexplode(edges_col).alias("edge_id", "_members"))
    incidence_pos = exploded.select(
        F.col("edge_id").cast("long").alias("edge_id"),
        F.posexplode("_members").alias("pos", "vertex_id"),
    ).select("edge_id", F.col("vertex_id").cast("long"), F.col("pos").cast("int"))
    incidence = incidence_pos.select("edge_id", "vertex_id")
    if "labels" in cols:
        labels = raw.select(F.posexplode("labels").alias("vertex_id", "label")).select(
            F.col("vertex_id").cast("long"), F.col("label").cast("int")
        )
    else:
        labels = spark.range(num_vertices).select(
            F.col("id").alias("vertex_id"), F.lit(0).cast("int").alias("label")
        )
    num_edges = incidence.select("edge_id").distinct().count()
    return HypergraphFrames(incidence, labels, num_vertices, num_edges, incidence_pos)


def load_json_rich_distributed(spark: SparkSession, path: str) -> HypergraphFrames:
    """Distributed rich-schema ingest (reference utils.hpp:225-288).

    Document order is recovered EXPLICITLY from the raw text:
    ``json_object_keys`` (a streaming-parser builtin that returns an
    object's keys as an ARRAY, necessarily in document order) gives the
    node-data key order and the edge-dict entry order as positions, and
    ``from_json`` supplies the member arrays which are joined back by
    edge key — nothing depends on the (undocumented) iteration order of
    a parsed MapType column, which earlier revisions relied on.

    Everything sized O(|incidence|) stays distributed; the first-seen
    numbering of edge-only vertices uses the same two-step distributed
    dense-rank as the source_files derivation (``dense_rank_by``), so
    no data-sized global window exists on any ingest path.
    """
    from hypergraph_gpu_label_propagation_spark.sources.source_files import (
        dense_rank_by,
    )

    raw = spark.read.text(path, wholetext=True)
    doc = raw.select(
        F.get_json_object("value", "$['node-data']").alias("nd"),
        F.get_json_object("value", "$['edge-dict']").alias("ed"),
        F.get_json_object("value", "$['labels']").alias("labels_json"),
    )

    # node-data keys in document order -> ranks 0..k-1
    node_sids = doc.select(
        F.posexplode_outer(F.json_object_keys("nd")).alias("pos", "sid")
    ).filter(F.col("sid").isNotNull())

    # edge-dict: key order from json_object_keys (document order by
    # construction), member arrays from from_json, joined on the key
    edge_keys = doc.select(
        F.posexplode_outer(F.json_object_keys("ed")).alias("epos", "eid")
    ).filter(F.col("eid").isNotNull())
    edge_vals = doc.select(
        F.explode_outer(F.from_json("ed", "map<string,array<string>>"))
        .alias("eid", "members")
    ).filter(F.col("eid").isNotNull())
    n_keys = edge_keys.count()
    if edge_keys.select("eid").distinct().count() != n_keys:
        raise ValueError("JSON: duplicate edge-dict keys")
    entries = edge_keys.join(edge_vals, "eid")
    members = entries.select(
        F.col("epos").cast("long").alias("edge_id"),
        "eid",
        F.posexplode("members").alias("mpos", "sid"),
    )
    if members.filter(F.col("sid").isNull()).limit(1).count():
        raise ValueError("JSON: null member in edge-dict")
    if entries.filter(F.size("members") == 0).limit(1).count():
        raise ValueError("JSON: hyperedge cannot be empty (utils.hpp:317)")

    # first-seen order: node-data keys first (their document rank), then
    # edge-dict members by (edge position, member position) — ranked
    # with the range-partitioned distributed dense-rank (no global
    # window over the id map)
    first_edge_seen = (
        members.groupBy("sid")
        .agg(F.min(F.struct("edge_id", "mpos")).alias("first"))
        .join(node_sids.select("sid"), "sid", "left_anti")
    )
    n_nodes = node_sids.count()
    edge_only = dense_rank_by(
        first_edge_seen.select(
            "sid",
            F.col("first.edge_id").alias("_fe"),
            F.col("first.mpos").alias("_fm"),
        ),
        ["_fe", "_fm"],
        "_r",
    )
    idmap = node_sids.select("sid", F.col("pos").cast("long").alias("vid")).unionByName(
        edge_only.select("sid", (F.col("_r") + F.lit(n_nodes)).cast("long").alias("vid"))
    ).localCheckpoint(eager=True)

    num_vertices = idmap.count()
    if num_vertices == 0:
        raise ValueError("JSON: no vertices found in node-data/edge-dict")
    incidence_pos = members.join(F.broadcast(idmap), "sid").select(
        "edge_id", F.col("vid").alias("vertex_id"), F.col("mpos").cast("int").alias("pos")
    )
    incidence = incidence_pos.select("edge_id", "vertex_id")

    labels_arr = doc.select(F.from_json("labels_json", "array<int>").alias("labels"))
    labels_len = labels_arr.select(F.size("labels")).first()[0]
    if labels_len is not None and labels_len >= 0:
        if labels_len != num_vertices:
            raise ValueError(
                "JSON: labels size must equal number of vertices (utils.hpp:293-295)"
            )
        labels = labels_arr.select(
            F.posexplode("labels").alias("vertex_id", "label")
        ).select(F.col("vertex_id").cast("long"), F.col("label").cast("int"))
    else:
        labels = spark.range(num_vertices).select(
            F.col("id").alias("vertex_id"), F.lit(0).cast("int").alias("label")
        )
    return HypergraphFrames(incidence, labels, num_vertices, n_keys, incidence_pos)


MAX_INTEROP_RECORDS = 10_000_000  # ~160 MB of ids on the driver


def collect_edge_member_lists(
    frames: HypergraphFrames, max_records: int = MAX_INTEROP_RECORDS
) -> list:
    """Edge member lists in edge order, for the interop writers.

    When the frames carry member positions (every loader populates
    ``incidence_pos``), members come back in INSERTION order — matching
    the reference writer byte-for-byte (hypergraph.cpp:293-326 writes
    input order).  For engine-built frames without positions, members
    are sorted (edges are sets for LP semantics; documented fallback).

    ``max_records`` guards the driver collect: these single-file interop
    writers are small-graph utilities by design, and an accidental call
    on a production-scale graph must fail fast instead of OOMing the
    driver.  Raise the cap explicitly if you really mean it.
    """
    n = frames.incidence.count() + frames.num_vertices
    if n > max_records:
        raise ValueError(
            f"refusing driver-side collect of {n} rows for single-file "
            f"interop (max_records={max_records}); these writers are for "
            "small-graph interop — use parquet/bucketed tables at scale, "
            "or pass a larger max_records explicitly"
        )
    if frames.incidence_pos is not None:
        rows = (
            frames.incidence_pos.groupBy("edge_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vertex_id"))),
                    lambda s: s["vertex_id"],
                ).alias("ms")
            )
            .orderBy("edge_id")
            .collect()
        )
    else:
        rows = (
            frames.incidence.groupBy("edge_id")
            .agg(F.sort_array(F.collect_list("vertex_id")).alias("ms"))
            .orderBy("edge_id")
            .collect()
        )
    return rows


def save_hypergraph_json(
    frames: HypergraphFrames, path: str,
    max_records: int = MAX_INTEROP_RECORDS,
) -> None:
    """Write the simple schema (collects to driver — interop util for
    small graphs, mirroring save_to_file's role, hypergraph.cpp:293-326);
    member order preserved when the frames carry positions.
    ``max_records`` guards the collect (collect_edge_member_lists)."""
    edges_rows = collect_edge_member_lists(frames, max_records=max_records)
    labels = [
        r["label"]
        for r in frames.vertex_labels.orderBy("vertex_id").collect()
    ]
    doc = {
        "num_vertices": frames.num_vertices,
        "edges": [r["ms"] for r in edges_rows],
        "labels": labels,
    }
    with open(path, "w") as f:
        json.dump(doc, f)
