"""Named-dataset fetch + extract (reference S6/S7 surface).

The reference ships ``data/download.py`` — a registry of public
hypergraph datasets (name -> URL) that it downloads (requests/gdown),
zip-extracts or renames to ``<name>.json`` — and
``scripts/extract_data.py``, which converts the pickled formats to the
simple JSON schema.  (Reference: data/download.py:12-21 registry,
:59-67 zip-or-json handling; scripts/extract_data.py:7-50 pickle
loaders.)

This module is the Spark-engine analog, transport-agnostic instead of
network-bound: ``fetch_dataset`` resolves the registry name against a
MIRROR base (a local directory or any URL scheme ``urllib`` speaks —
``file://`` in the sandbox, ``https://`` on a networked deployment;
the code path is identical), streams to a temp file, verifies an
optional sha256 (the reference trusts the wire; a 100 TB ingest
pipeline must not), then applies the reference's exact post-download
rule: zip archives extract into ``<dest>/<name>/`` (with zip-slip
containment the reference lacks), anything else lands as
``<dest>/<name>.json``.  ``load_dataset`` then routes the artifact
into the existing loaders: JSON files through the simple/rich-schema
sniffing JSON loader, extracted pickle dirs through the COO/dict
ingest (sources/coo.py, the extract_data.py analog).

No dataset bytes ship with this repo — the registry carries only the
public names and expected artifact kinds, and tests synthesize a local
mirror deterministically.
"""

from __future__ import annotations

import hashlib
import shutil
import tempfile
import urllib.parse
import urllib.request
import zipfile
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class DatasetSpec:
    """One registry entry: the artifact's filename on the mirror and
    the kind of payload the reference's pipeline expects for it."""

    filename: str
    kind: str  # "json" (simple-schema JSON) or "zip" (pickled dir)


# Same public dataset names as the reference registry
# (data/download.py:12-21); values name the mirror artifact, not a URL
# — the transport base is the caller's ``mirror`` argument.
DATASETS: dict[str, DatasetSpec] = {
    "arxiv-kaggle": DatasetSpec("arxiv-kaggle.zip", "zip"),
    "eventernote-places": DatasetSpec("eventernote-places.json", "json"),
    "coauth-MAG-History": DatasetSpec("coauth-MAG-History.json", "json"),
    "ndc-substances": DatasetSpec("NDC-substances.json", "json"),
    "coauth-MAG-Geology": DatasetSpec("coauth-MAG-Geology.json", "json"),
    "senate-committees": DatasetSpec("senate-committees.json", "json"),
    "coauth-DBLP": DatasetSpec("coauth-DBLP.json", "json"),
}

_CHUNK = 1 << 20  # 1 MiB streaming chunks


def _resolve_url(mirror: str, filename: str) -> str:
    """mirror is a URL base (any scheme urllib supports) or a plain
    local directory path; either way the artifact is ``<base>/<name>``."""
    parsed = urllib.parse.urlparse(mirror)
    if parsed.scheme and len(parsed.scheme) > 1:  # len>1: not a drive letter
        return mirror.rstrip("/") + "/" + urllib.parse.quote(filename)
    return Path(mirror).joinpath(filename).resolve().as_uri()


def _stream_to(url: str, out: Path) -> str:
    """Stream url -> out in bounded chunks (constant memory at any
    artifact size), returning the sha256 hex of the bytes written."""
    h = hashlib.sha256()
    with urllib.request.urlopen(url) as resp, open(out, "wb") as f:
        while True:
            chunk = resp.read(_CHUNK)
            if not chunk:
                break
            h.update(chunk)
            f.write(chunk)
    return h.hexdigest()


def _safe_extract(zf: zipfile.ZipFile, dest: Path) -> None:
    """extractall with zip-slip containment: every member must resolve
    inside dest (the reference extracts unchecked — fine for its own
    curated zips, not for a generic mirror)."""
    dest = dest.resolve()
    for member in zf.namelist():
        target = (dest / member).resolve()
        if not target.is_relative_to(dest):
            raise ValueError(f"zip member escapes extraction dir: {member!r}")
    zf.extractall(dest)


def fetch_dataset(
    name: str,
    mirror: str,
    dest: str | Path,
    sha256: str | None = None,
) -> Path:
    """Fetch registry entry ``name`` from ``mirror`` into ``dest``.

    Returns the artifact path: ``dest/<name>/`` for zip payloads
    (extracted), ``dest/<name>.json`` otherwise — the reference's
    post-download layout exactly.  Idempotent: an existing artifact is
    returned without re-fetching (delete it to force).
    """
    if name not in DATASETS:
        raise KeyError(
            f"unknown dataset {name!r}; registry has {sorted(DATASETS)}"
        )
    spec = DATASETS[name]
    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    final_dir = dest / name
    final_json = dest / f"{name}.json"
    if final_dir.is_dir():
        return final_dir
    if final_json.is_file():
        return final_json

    url = _resolve_url(mirror, spec.filename)
    with tempfile.NamedTemporaryFile(
        dir=dest, suffix=".tmp", delete=False
    ) as tf:
        tmp = Path(tf.name)
    try:
        digest = _stream_to(url, tmp)
        if sha256 is not None and digest != sha256.lower():
            raise ValueError(
                f"sha256 mismatch for {name}: expected {sha256}, got {digest}"
            )
        # the reference's rule, hardened: route by the REGISTRY's declared
        # kind (not a content sniff — an HTTP error page must fail, not be
        # cached as the artifact), and validate the body matches before
        # anything lands at the final path, because the idempotency check
        # above would otherwise trust a bad artifact forever
        if spec.kind == "zip":
            if not zipfile.is_zipfile(tmp):
                raise ValueError(
                    f"{name}: mirror served a non-zip body for a zip dataset "
                    f"(truncated download or an error page?)"
                )
            # extract to a temp dir, rename into place LAST — a corrupt
            # member (BadZipFile mid-extract) must not leave a partial
            # final_dir that later calls treat as complete
            with tempfile.TemporaryDirectory(dir=dest) as td:
                stage = Path(td) / name
                with zipfile.ZipFile(tmp) as zf:
                    _safe_extract(zf, stage)
                stage.replace(final_dir)
            return final_dir
        # read only the first 64 bytes — the artifact may be huge and the
        # module contract is constant driver memory (the download itself
        # streams in 1 MiB chunks; sniffing must not buffer the whole body)
        with open(tmp, "rb") as f:
            head = f.read(64).lstrip()
        if not head.startswith((b"{", b"[")):
            raise ValueError(
                f"{name}: mirror body does not look like the declared JSON "
                f"payload (starts {head[:16]!r})"
            )
        tmp.replace(final_json)
        tmp = None  # consumed by the rename
        return final_json
    finally:
        if tmp is not None:
            tmp.unlink(missing_ok=True)


def load_pickle_dir(spark: SparkSession, data_dir: str | Path):
    """Driver-side unpickle of the reference's two dataset layouts
    (scripts/extract_data.py:7-50), routed into the distributed COO
    ingest:

    - classic: ``hypergraph.pickle`` (dict edge -> member list) +
      ``labels.pickle`` (per-vertex labels, list or dict);
    - villain: ``H.pickle`` holding either that dict or a
      ``(V_idx, E_idx)`` COO index pair, with optional ``L.pickle``.

    These curated artifacts are small (the 100 TB path is the
    JSON/parquet distributed loaders); unpickling runs on the driver
    like the reference's converter.  SECURITY: pickle deserialization
    executes arbitrary code — only load artifacts from a mirror you
    control, ideally pinned by ``fetch_dataset(..., sha256=...)``.
    """
    import pickle

    from .coo import from_coo

    data_dir = Path(data_dir)

    def _load(p: Path):
        with open(p, "rb") as f:
            return pickle.load(f)

    h_path = next(
        (p for n in ("hypergraph.pickle", "H.pickle", "H.pkl")
         if (p := data_dir / n).is_file()),
        None,
    )
    if h_path is None:
        raise FileNotFoundError(
            f"no hypergraph pickle (hypergraph.pickle / H.pickle / H.pkl) "
            f"in {data_dir} (extract_data.py:7-50)"
        )
    H = _load(h_path)
    if isinstance(H, dict):
        edge_dict = {int(e): [int(v) for v in mem] for e, mem in H.items()}
    elif isinstance(H, tuple) and len(H) == 3:
        # villain H.pkl: (center, _, hyperedges) (extract_data.py:16-18)
        edge_dict = {
            i: [int(v) for v in edge] for i, edge in enumerate(H[2])
        }
    else:
        # (V_idx, E_idx) COO pair (extract_data.py:21-27)
        v_idx, e_idx = H
        edge_dict = {}
        for v, e in zip(list(v_idx), list(e_idx)):
            edge_dict.setdefault(int(e), []).append(int(v))

    coo = spark.createDataFrame(
        [(e, v) for e, mem in edge_dict.items() for v in mem],
        "edge_id long, vertex_id long",
    )

    labels_df = None
    l_path = next(
        (p for n in ("labels.pickle", "L.pickle")
         if (p := data_dir / n).is_file()),
        None,
    )
    if l_path is not None:
        L = _load(l_path)
        items = (
            [(int(k), int(v)) for k, v in L.items()]
            if isinstance(L, dict)
            else [(i, int(x)) for i, x in enumerate(list(L))]
        )
        labels_df = spark.createDataFrame(items, "vertex_id long, label int")

    return from_coo(coo, labels=labels_df)


def load_dataset(spark: SparkSession, artifact: str | Path):
    """Route a fetched artifact into the engine's frames: ``.json``
    files through the schema-sniffing JSON loader
    (json_loader.load_hypergraph_json), extracted directories through
    the pickle/COO ingest above.  Returns HypergraphFrames."""
    from .json_loader import load_hypergraph_json

    artifact = Path(artifact)
    if artifact.is_dir():
        return load_pickle_dir(spark, artifact)
    return load_hypergraph_json(spark, str(artifact))
