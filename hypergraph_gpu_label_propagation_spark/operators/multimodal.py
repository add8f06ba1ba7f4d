"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata — the schema,
partition strategy, Arrow batch shapes and UDF signatures are the real,
tested part; the codec calls themselves are STUBBED (this container has
no image/audio libraries) behind ``DecodeBackend``:

- ``DecodeBackend.REAL`` raises NotImplementedError at the decode call
  site — swap in Pillow/torchaudio/PyAV there on a real cluster;
- ``DecodeBackend.FAKE`` (default for tests) produces deterministic
  metadata/features derived from sha256(data), so the whole distributed
  pipeline (mapInPandas batching, schema evolution, downstream joins)
  is exercised end-to-end with stable results.

Scale notes: assets ride in their own table keyed by asset_id with the
binary payload LAST in the schema (parquet column pruning then lets
metadata-only queries skip the bytes); decode/feature-extract run as
``mapInPandas`` so one Arrow batch amortizes per-batch model setup, and
``spark.sql.files.maxPartitionBytes`` (not row count) governs task
sizing for fat binary rows.
"""

from __future__ import annotations

import enum
import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, meta map<string,string>, data binary"
)

DECODED_SCHEMA = (
    "asset_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, duration_ms double"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"asset_id long, feature array<float>"


class DecodeBackend(str, enum.Enum):
    REAL = "real"
    FAKE = "fake"


def _fake_decode_row(kind: str, data: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic pseudo-decode: metadata from sha256 of the payload's
    hex encoding (hex rather than raw bytes so the DuckDB oracle — whose
    sha256 is VARCHAR-only — can reproduce the derivation; hex is
    injective, so it's still a pure function of the binary content)."""
    h = hashlib.sha256(data.hex().encode()).digest()
    w = 64 + h[0] % 192
    hgt = 64 + h[1] % 192
    frames = 1 if kind == "image" else 1 + h[2] % 300
    sr = 0 if kind == "image" else 8000 + (h[3] % 5) * 8000
    dur = 0.0 if kind == "image" else round(frames * 33.37, 2)
    return w, hgt, frames, sr, dur


def decode_assets(
    assets: DataFrame, backend: DecodeBackend = DecodeBackend.FAKE
) -> DataFrame:
    """binary -> typed media metadata via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == DecodeBackend.REAL:
                raise NotImplementedError(
                    "real media decode requires Pillow/PyAV/torchaudio — "
                    "plug the codec in here; the FAKE backend exercises the "
                    "identical distributed plumbing"
                )
            out = [
                _fake_decode_row(k, bytes(d))
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            arr = pd.DataFrame(
                out, columns=["width", "height", "n_frames", "sample_rate", "duration_ms"]
            )
            yield pd.concat(
                [pdf[["asset_id", "kind"]].reset_index(drop=True), arr], axis=1
            )

    return assets.mapInPandas(run, DECODED_SCHEMA)


def extract_features(
    assets: DataFrame, backend: DecodeBackend = DecodeBackend.FAKE
) -> DataFrame:
    """binary -> fixed-dim float feature vector (deterministic fake:
    FEATURE_DIM floats in [0,1) from sha256(data))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == DecodeBackend.REAL:
                raise NotImplementedError("plug the real feature extractor in here")
            feats = []
            for d in pdf["data"]:
                h = hashlib.sha256(bytes(d).hex().encode()).digest()
                feats.append(
                    (np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8) / 255.0)
                    .astype(np.float32)
                    .tolist()
                )
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "feature": feats})

    return assets.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """(asset_id, frame_idx) sampling plan for video assets — pure
    column ops (sequence + explode), no Python."""
    vids = decoded.filter((F.col("kind") == "video") & (F.col("n_frames") > 0))
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (binary payload from sha256)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        data = hashlib.sha256(f"asset:{seed}:{i}".encode()).digest() * (1 + i % 4)
        rows.append((i, kind, {"origin": f"synth{seed}"}, bytearray(data)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
