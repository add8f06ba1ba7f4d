"""Ingest surface tests (SURVEY.md section 5.4): JSON both schemas,
first-seen-order densification, HGR1 binary roundtrip + format sniffing,
COO ingest with -1 sentinel, source_files derivation + sha256 invariant."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.label_propagation import label_propagation
from hypergraph_gpu_label_propagation_spark.sources.coo import from_coo
from hypergraph_gpu_label_propagation_spark.sources.hgr import load_any, load_hgr, save_hgr
from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
    load_hypergraph_json,
    load_json_simple_distributed,
    save_hypergraph_json,
)
from hypergraph_gpu_label_propagation_spark.sources.source_files import (
    derive_hypergraph_frames,
    synth_source_files,
)


def _edges_of(frames):
    rows = frames.incidence.collect()
    d = {}
    for r in rows:
        d.setdefault(r["edge_id"], set()).add(r["vertex_id"])
    return d


def test_json_simple_schema(spark):
    doc = {"num_vertices": 4, "edges": [[0, 1], [1, 2], [2, 3]], "labels": [0, 1, 1, 0]}
    fr = load_hypergraph_json(spark, json.dumps(doc))
    assert fr.num_vertices == 4 and fr.num_edges == 3
    assert _edges_of(fr) == {0: {0, 1}, 1: {1, 2}, 2: {2, 3}}
    labs = {r["vertex_id"]: r["label"] for r in fr.vertex_labels.collect()}
    assert labs == {0: 0, 1: 1, 2: 1, 3: 0}


def test_json_simple_key_aliases(spark):
    fr = load_hypergraph_json(spark, json.dumps({"vertices": 3, "hyperedges": [[0, 2]]}))
    assert fr.num_vertices == 3 and fr.num_edges == 1
    # labels default to 0 (hypergraph.cpp:14)
    assert {r["label"] for r in fr.vertex_labels.collect()} == {0}


def test_json_simple_validation(spark):
    with pytest.raises(ValueError, match="empty"):
        load_hypergraph_json(spark, json.dumps({"num_vertices": 3, "edges": [[]]}))
    with pytest.raises(ValueError, match="labels"):
        load_hypergraph_json(
            spark, json.dumps({"num_vertices": 3, "edges": [[0, 1]], "labels": [1]})
        )
    with pytest.raises(ValueError, match="num_vertices"):
        load_hypergraph_json(spark, json.dumps({"edges": [[0, 1]]}))
    with pytest.raises(ValueError, match="out of range"):
        load_hypergraph_json(spark, json.dumps({"num_vertices": 2, "edges": [[0, 5]]}))


def test_json_rich_schema_first_seen_order(spark):
    # node-data keys first (b, a), then edge-dict members add c:
    # densification must be b->0, a->1, c->2 (utils.hpp:167-175)
    doc = {
        "type": "hypergraph",
        "hypergraph-data": {"name": "t"},
        "node-data": {"b": {}, "a": {}},
        "edge-dict": {"e1": ["a", "b"], "e2": ["b", "c"]},
    }
    fr = load_hypergraph_json(spark, json.dumps(doc))
    assert fr.num_vertices == 3  # union of node-data and edge-dict members
    assert _edges_of(fr) == {0: {1, 0}, 1: {0, 2}}


def test_json_rich_without_type_key(spark):
    # presence of edge-dict alone triggers the rich branch (utils.hpp:279-281)
    fr = load_hypergraph_json(spark, json.dumps({"edge-dict": {"x": ["p", "q"]}}))
    assert fr.num_vertices == 2 and fr.num_edges == 1


def test_json_roundtrip_and_distributed_loader(spark, tmp_path):
    doc = {"num_vertices": 5, "edges": [[0, 1, 2], [3, 4], [0, 4]], "labels": [1, 2, 3, 4, 5]}
    p = str(tmp_path / "g.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    fr1 = load_hypergraph_json(spark, p)
    fr2 = load_json_simple_distributed(spark, p)
    assert _edges_of(fr1) == _edges_of(fr2)
    assert fr1.num_vertices == fr2.num_vertices == 5

    out = str(tmp_path / "out.json")
    save_hypergraph_json(fr1, out)
    fr3 = load_hypergraph_json(spark, out)
    assert _edges_of(fr3) == _edges_of(fr1)


def test_hgr_roundtrip_and_sniffing(spark, tmp_path):
    doc = {"num_vertices": 4, "edges": [[0, 1], [1, 2, 3]], "labels": [7, 8, 9, -1]}
    fr = load_hypergraph_json(spark, json.dumps(doc))
    p = str(tmp_path / "g.hgr")
    save_hgr(fr, p)
    with open(p, "rb") as f:
        assert f.read(4) == b"HRG1"  # the reference's actual on-disk magic bytes
    fr2 = load_hgr(spark, p)
    assert _edges_of(fr2) == _edges_of(fr)
    labs = {r["vertex_id"]: r["label"] for r in fr2.vertex_labels.collect()}
    assert labs == {0: 7, 1: 8, 2: 9, 3: -1}
    # sniffing: json by leading '{', binary otherwise
    jp = str(tmp_path / "g2.json")
    with open(jp, "w") as f:
        json.dump(doc, f)
    assert _edges_of(load_any(spark, jp)) == _edges_of(load_any(spark, p))


def test_hgr_rejects_garbage(spark, tmp_path):
    p = str(tmp_path / "bad.hgr")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 30)
    with pytest.raises(ValueError, match="magic"):
        load_hgr(spark, p)


def test_coo_ingest_with_partial_labels(spark):
    coo = spark.createDataFrame(
        [(100, "x"), (100, "y"), (200, "y"), (200, "z")], "edge_id long, vertex_id string"
    )
    labels = spark.createDataFrame([("x", 3)], "vertex_id string, label int")
    fr = from_coo(coo, labels=labels)
    assert fr.num_vertices == 3 and fr.num_edges == 2
    labs = sorted(r["label"] for r in fr.vertex_labels.collect())
    assert labs == [-1, -1, 3]  # unknown vertices -> -1 sentinel


def test_source_files_derivation_and_sha256(spark):
    sf = synth_source_files(spark, n_repos=5, files_per_repo=6, commits_per_repo=3,
                            monorepo_factor=4).persist()
    incidence, vertex_map, provenance = derive_hypergraph_frames(sf, verify_sha256=True)
    n_files = sf.select("repo", "path").distinct().count()
    n_repos = 5
    n_commit_edges = sf.select("repo", "commit").distinct().count()
    assert vertex_map.count() == n_files
    ids = incidence.agg(F.count_distinct("edge_id")).collect()[0][0]
    assert ids == n_repos + n_commit_edges
    # repo edges contain every file of the repo
    sizes = incidence.groupBy("edge_id").count()
    assert sizes.agg(F.min("count")).collect()[0][0] >= 1
    # monorepo skew present: repo 0 has 4x files
    big = sizes.agg(F.max("count")).collect()[0][0]
    assert big == 6 * 4
    # end-to-end: LP runs on the derived graph
    hg = Hypergraph.freeze(spark, incidence, num_partitions=8)
    res = label_propagation(hg, max_iterations=3)
    assert res.labels.count() == hg.num_vertices
    hg.unpersist()
    sf.unpersist()


def test_source_files_determinism(spark):
    a = synth_source_files(spark, 3, 4, 2).orderBy("repo", "path", "commit").collect()
    b = synth_source_files(spark, 3, 4, 2).orderBy("repo", "path", "commit").collect()
    assert a == b
    assert all(len(r["commit"]) == 64 for r in a)  # sha256 hex commits (DuckDB-reproducible)


def test_json_rich_distributed_parity(spark, tmp_path):
    """Distributed rich-schema ingest (spark.read.json + posexplode +
    broadcast id map) matches the driver-side parser exactly — including
    first-seen densification order — on a doc 10x the driver fixtures."""
    import json as _json
    import random

    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        load_json_rich_distributed,
    )

    rng = random.Random(7)
    sids = [f"v{i:04d}" for i in range(400)]
    rng.shuffle(sids)
    doc = {
        "type": "hypergraph",
        "node-data": {s: {} for s in sids[:150]},
        "edge-dict": {
            f"edge{e}": rng.sample(sids, rng.randint(1, 6)) for e in range(900)
        },
    }
    p = str(tmp_path / "rich_big.json")
    _json.dump(doc, open(p, "w"))
    a = load_hypergraph_json(spark, p)
    b = load_json_rich_distributed(spark, p)
    assert sorted(map(tuple, a.incidence.collect())) == sorted(
        map(tuple, b.incidence.collect())
    )
    assert (a.num_vertices, a.num_edges) == (b.num_vertices, b.num_edges)


def test_json_rich_distributed_validation(spark, tmp_path):
    import json as _json

    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        load_json_rich_distributed,
    )

    p = str(tmp_path / "bad_empty_edge.json")
    _json.dump({"edge-dict": {"e": []}}, open(p, "w"))
    with pytest.raises(ValueError, match="empty"):
        load_json_rich_distributed(spark, p)

    p2 = str(tmp_path / "bad_labels.json")
    _json.dump({"edge-dict": {"e": ["a", "b"]}, "labels": [1]}, open(p2, "w"))
    with pytest.raises(ValueError, match="labels size"):
        load_json_rich_distributed(spark, p2)

    p3 = str(tmp_path / "labels_ok.json")
    _json.dump(
        {"node-data": {"x": {}}, "edge-dict": {"e": ["x", "y"]}, "labels": [4, 9]},
        open(p3, "w"),
    )
    fr = load_json_rich_distributed(spark, p3)
    assert sorted(map(tuple, fr.vertex_labels.collect())) == [(0, 4), (1, 9)]


def test_hgr_roundtrip_preserves_member_order(spark, tmp_path):
    """Writers reproduce INSERTION member order (reference writer
    hypergraph.cpp:293-326): save(load(f)) byte-compares even when edge
    members are deliberately unsorted."""
    import struct

    import numpy as np

    from hypergraph_gpu_label_propagation_spark.sources.hgr import (
        HGR_MAGIC,
        HGR_VERSION,
        load_hgr,
        save_hgr,
    )

    edges = [[3, 0, 2], [5, 1], [4, 4, 0]]  # unsorted, with a repeat
    nv = 6
    p1 = str(tmp_path / "a.hgr")
    with open(p1, "wb") as f:
        f.write(struct.pack("<IIQQ", HGR_MAGIC, HGR_VERSION, nv, len(edges)))
        for ms in edges:
            f.write(struct.pack("<Q", len(ms)))
            f.write(np.asarray(ms, dtype="<u8").tobytes())
        f.write(struct.pack("<B", 1))
        f.write(np.arange(nv, dtype="<i4").tobytes())

    fr = load_hgr(spark, p1)
    p2 = str(tmp_path / "b.hgr")
    save_hgr(fr, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_json_roundtrip_preserves_member_order(spark, tmp_path):
    import json as _json

    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        save_hypergraph_json,
    )

    doc = {"num_vertices": 5, "edges": [[4, 1, 0], [2, 3]], "labels": [0, 1, 2, 3, 4]}
    p1 = str(tmp_path / "a.json")
    _json.dump(doc, open(p1, "w"))
    fr = load_hypergraph_json(spark, p1)
    p2 = str(tmp_path / "b.json")
    save_hypergraph_json(fr, p2)
    assert _json.load(open(p2)) == doc


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.slow
def test_json_rich_distributed_stress_1m(spark, tmp_path):
    """Round-4 ingest stress (reference semantics utils.hpp:153-298): a
    ~10^6-incidence-row rich-schema document through the distributed
    loader, checked EXACTLY against a pure-python replica of the
    first-seen densification (order-insensitive checksum over the full
    (edge_id, vertex_id) multiset), plus a plan assertion that no
    single-partition (global-window) stage exists in any loader plan.
    """
    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        load_json_rich_distributed,
    )

    V, E, K = 400_000, 250_000, 4  # 1M member entries, ~V distinct sids
    node_sids = [f"n{i}" for i in range(50_000)]

    def members(e):
        # collision-free within an edge: 104729*i distinct mod V for i<4
        return [f"s{(e * 7919 + i * 104729) % V}" for i in range(K)]

    nd = "{" + ",".join(f'"{s}":{{}}' for s in node_sids) + "}"
    ed = "{" + ",".join(
        f'"e{e}":[' + ",".join(f'"{m}"' for m in members(e)) + "]"
        for e in range(E)
    ) + "}"
    p = str(tmp_path / "rich_1m.json")
    with open(p, "w") as f:
        f.write('{"type":"hypergraph","node-data":' + nd + ',"edge-dict":' + ed + "}")

    # pure-python reference densification (document order == dict order)
    idmap = {s: i for i, s in enumerate(node_sids)}
    checksum = rows = 0
    for e in range(E):
        for m in members(e):
            if m not in idmap:
                idmap[m] = len(idmap)
            checksum += e * 1_000_003 + idmap[m]
            rows += 1

    frames = load_json_rich_distributed(spark, p)
    assert frames.num_edges == E
    assert frames.num_vertices == len(idmap)
    got = frames.incidence.agg(
        F.sum(F.col("edge_id") * 1_000_003 + F.col("vertex_id")).alias("cs"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert (got["cs"], got["n"]) == (checksum, rows)
    # no data-sized single-partition stage anywhere in the loader plans
    # (an unpartitioned Window would require a SinglePartition exchange)
    assert "SinglePartition" not in _plan_of(frames.incidence)


@pytest.mark.slow
def test_dense_rank_by_plan_has_no_single_partition(spark):
    from hypergraph_gpu_label_propagation_spark.sources.source_files import (
        dense_rank_by,
    )

    df = spark.range(1_000_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    ranked = dense_rank_by(df, ["key"], "rid")
    assert "SinglePartition" not in _plan_of(ranked)
    # ranks are a permutation of 0..n-1 ordered by key
    n = ranked.count()
    assert n == 1_000_000
    top = ranked.orderBy("key").limit(3).collect()
    assert [r["rid"] for r in top] == [0, 1, 2]


def test_interop_writer_max_records_guard(spark, tmp_path):
    """The single-file interop writers are small-graph utilities: the
    driver-side collect refuses above ``max_records`` (r03/r04 advice —
    an accidental call on a 100 GB graph must fail fast, not OOM)."""
    import pytest

    from hypergraph_gpu_label_propagation_spark.sources.hgr import save_hgr
    from hypergraph_gpu_label_propagation_spark.sources.json_loader import (
        load_hypergraph_json,
        save_hypergraph_json,
    )

    frames = load_hypergraph_json(
        spark, '{"num_vertices": 4, "edges": [[0,1],[1,2,3]]}'
    )
    with pytest.raises(ValueError, match="max_records"):
        save_hgr(frames, str(tmp_path / "g.hgr"), max_records=3)
    with pytest.raises(ValueError, match="max_records"):
        save_hypergraph_json(frames, str(tmp_path / "g.json"), max_records=3)
    # above the threshold the writers work unchanged
    save_hgr(frames, str(tmp_path / "g.hgr"))
    save_hypergraph_json(frames, str(tmp_path / "g.json"))
    assert (tmp_path / "g.hgr").exists() and (tmp_path / "g.json").exists()
