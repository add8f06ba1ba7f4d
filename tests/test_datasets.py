"""sources/datasets.py — the reference's dataset fetch surface
(data/download.py + scripts/extract_data.py) re-expressed transport-
agnostically.  Tests synthesize a local mirror; file:// and plain-dir
bases exercise the same streaming code path an https mirror would."""

from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path

import numpy as np
import pytest

from hypergraph_gpu_label_propagation_spark.sources.datasets import (
    DATASETS,
    fetch_dataset,
    load_dataset,
    load_pickle_dir,
)

SIMPLE_JSON = '{"num_vertices": 4, "edges": [[0, 1], [1, 2, 3]]}'


def _make_mirror(tmp_path: Path) -> Path:
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    (mirror / "eventernote-places.json").write_text(SIMPLE_JSON)
    # arxiv-kaggle ships as a zip of pickles (classic layout)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "hypergraph.pickle", pickle.dumps({0: [0, 1], 1: [1, 2, 3]})
        )
        zf.writestr("labels.pickle", pickle.dumps([5, 6, 7, 8]))
    (mirror / "arxiv-kaggle.zip").write_bytes(buf.getvalue())
    return mirror


def test_fetch_json_from_dir_and_file_url(tmp_path):
    mirror = _make_mirror(tmp_path)
    for i, base in enumerate([str(mirror), mirror.as_uri()]):
        dest = tmp_path / f"dest{i}"
        got = fetch_dataset("eventernote-places", base, dest)
        assert got == dest / "eventernote-places.json"
        assert got.read_text() == SIMPLE_JSON
        # idempotent: artifact present -> returned without re-fetch
        assert fetch_dataset("eventernote-places", "/nonexistent", dest) == got


def test_fetch_zip_extracts_and_loads(spark, tmp_path):
    mirror = _make_mirror(tmp_path)
    got = fetch_dataset("arxiv-kaggle", str(mirror), tmp_path / "d")
    assert got.is_dir() and (got / "hypergraph.pickle").is_file()
    frames = load_dataset(spark, got)
    inc = {(r["edge_id"], r["vertex_id"]) for r in frames.incidence.collect()}
    assert inc == {(0, 0), (0, 1), (1, 1), (1, 2), (1, 3)}
    labs = {r["vertex_id"]: r["label"] for r in frames.vertex_labels.collect()}
    assert labs == {0: 5, 1: 6, 2: 7, 3: 8}


def test_fetch_json_routes_through_json_loader(spark, tmp_path):
    mirror = _make_mirror(tmp_path)
    got = fetch_dataset("eventernote-places", str(mirror), tmp_path / "d")
    frames = load_dataset(spark, got)
    assert frames.num_vertices == 4
    assert frames.incidence.count() == 5


def test_sha256_verify(tmp_path):
    mirror = _make_mirror(tmp_path)
    import hashlib

    good = hashlib.sha256(SIMPLE_JSON.encode()).hexdigest()
    dest = tmp_path / "ok"
    assert fetch_dataset(
        "eventernote-places", str(mirror), dest, sha256=good.upper()
    ).is_file()
    bad_dest = tmp_path / "bad"
    with pytest.raises(ValueError, match="sha256 mismatch"):
        fetch_dataset("eventernote-places", str(mirror), bad_dest, sha256="0" * 64)
    # failed fetch leaves no artifact and no tmp litter
    assert list(bad_dest.iterdir()) == []


def test_zip_slip_rejected(tmp_path):
    mirror = tmp_path / "m"
    mirror.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("../evil.txt", "pwned")
    (mirror / "arxiv-kaggle.zip").write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="escapes extraction dir"):
        fetch_dataset("arxiv-kaggle", str(mirror), tmp_path / "d")
    assert not (tmp_path / "evil.txt").exists()


def test_unknown_dataset_and_registry_parity():
    with pytest.raises(KeyError, match="unknown dataset"):
        fetch_dataset("nope", "/tmp", "/tmp")
    # registry carries exactly the reference's names (download.py:12-21)
    assert set(DATASETS) == {
        "arxiv-kaggle", "eventernote-places", "coauth-MAG-History",
        "ndc-substances", "coauth-MAG-Geology", "senate-committees",
        "coauth-DBLP",
    }


def test_pickle_dir_villain_coo_pair(spark, tmp_path):
    d = tmp_path / "villain"
    d.mkdir()
    v_idx = np.array([0, 1, 1, 2, 3])
    e_idx = np.array([0, 0, 1, 1, 1])
    (d / "H.pickle").write_bytes(pickle.dumps((v_idx, e_idx)))
    (d / "L.pickle").write_bytes(pickle.dumps({0: 9, 3: 4}))
    frames = load_pickle_dir(spark, d)
    inc = {(r["edge_id"], r["vertex_id"]) for r in frames.incidence.collect()}
    assert inc == {(0, 0), (0, 1), (1, 1), (1, 2), (1, 3)}
    labs = {r["vertex_id"]: r["label"] for r in frames.vertex_labels.collect()}
    assert labs == {0: 9, 1: -1, 2: -1, 3: 4}  # partial labels -> -1 sentinel


def test_mirror_body_validated_against_registry_kind(tmp_path):
    """r06 code review: routing was a content sniff — an HTTP error page
    for a zip dataset would be cached as <name>.json forever.  The body
    must now match the REGISTRY's declared kind or the fetch fails and
    caches nothing."""
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    # zip dataset served an HTML error page
    (mirror / "arxiv-kaggle.zip").write_text("<html>404 not found</html>")
    # json dataset served an HTML error page
    (mirror / "eventernote-places.json").write_text("<html>503</html>")
    dest = tmp_path / "dest"
    with pytest.raises(ValueError, match="non-zip body"):
        fetch_dataset("arxiv-kaggle", str(mirror), dest)
    with pytest.raises(ValueError, match="JSON"):
        fetch_dataset("eventernote-places", str(mirror), dest)
    # nothing cached: a later fetch against a FIXED mirror succeeds
    assert list(dest.iterdir()) == []
    (tmp_path / "good").mkdir()
    good = _make_mirror(tmp_path / "good")
    assert fetch_dataset("eventernote-places", str(good), dest).is_file()


def test_partial_zip_extract_not_cached(tmp_path):
    """A zip whose member is corrupt (CRC mismatch mid-extract) must not
    leave a partial <dest>/<name>/ that later calls return as the
    complete artifact."""
    import struct as _struct

    mirror = tmp_path / "mirror"
    mirror.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("hypergraph.pickle", b"x" * 400)
        zf.writestr("labels.pickle", b"y" * 400)
    raw = bytearray(buf.getvalue())
    at = raw.find(b"y" * 10)  # corrupt the SECOND member's payload
    raw[at : at + 4] = b"ZZZZ"
    (mirror / "arxiv-kaggle.zip").write_bytes(bytes(raw))
    dest = tmp_path / "dest"
    with pytest.raises(Exception, match="CRC|Bad"):
        fetch_dataset("arxiv-kaggle", str(mirror), dest)
    assert not (dest / "arxiv-kaggle").exists()
