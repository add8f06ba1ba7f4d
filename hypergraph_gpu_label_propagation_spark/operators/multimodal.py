"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata; decode and
feature extraction run Arrow-batched behind ``DecodeBackend``:

- ``DecodeBackend.REAL`` performs genuine byte-level decoding for the
  formats decodable with numpy + the stdlib alone — uncompressed BMP
  images (BITMAPINFOHEADER parse + pixel array) and PCM WAV audio
  (RIFF chunk walk + sample array).  Formats that need an external
  codec (JPEG/PNG/MP4/...) raise NotImplementedError at the decode
  call site — swap in Pillow/torchaudio/PyAV there on a real cluster
  (this container ships none of them).
- ``DecodeBackend.FAKE`` (default for the oracle contract query)
  produces deterministic metadata/features derived from sha256(data),
  so the distributed pipeline (mapInPandas batching, schema evolution,
  downstream joins) has an exact DuckDB twin.

:func:`synth_real_assets` builds REAL deterministic BMP/WAV payloads so
tests drive the true decode end-to-end (byte-exact expected metadata).

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


def _decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24bpp BMP: (width, height, HxWx3 uint8
    pixel array).  BITMAPFILEHEADER ('BM', pixel offset at byte 10) +
    BITMAPINFOHEADER (width/height int32 at 18/22, bpp uint16 at 28,
    compression uint32 at 30); rows are bottom-up, 4-byte padded."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24bpp BMP decodes without external codecs "
            f"(got bpp={bpp}, compression={compression})"
        )
    height_abs = abs(height)
    stride = (width * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * height_abs, offset=offset)
    rows = px.reshape(height_abs, stride)[:, : width * 3].reshape(height_abs, width, 3)
    if height > 0:  # bottom-up storage
        rows = rows[::-1]
    return width, height_abs, rows


def _decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Walk RIFF/WAVE chunks: (sample_rate, channels, n_samples, int16
    sample array).  Only PCM (format tag 1), 16-bit."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, ch, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            tag, ch, sr = struct.unpack_from("<HHI", data, body)
            (bits,) = struct.unpack_from("<H", data, body + 14)
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV decodes without external codecs "
                    f"(got format={tag}, bits={bits})"
                )
            if ch < 1:
                raise ValueError(f"WAV fmt chunk declares channels={ch}")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)
    # ch is checked explicitly: a data chunk with no fmt chunk must be a
    # ValueError here, not an incidental ZeroDivisionError below
    if sr is None or ch is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, ch, len(samples) // ch, samples


def _real_decode_row(kind: str, data: bytes) -> tuple[int, int, int, int, float]:
    if kind == "image":
        w, h, _ = _decode_bmp(data)
        return w, h, 1, 0, 0.0
    if kind == "audio":
        sr, _ch, n, _ = _decode_wav(data)
        return 0, 0, n, sr, round(1000.0 * n / sr, 2)
    raise NotImplementedError(
        f"real decode of kind={kind!r} requires an external codec "
        "(PyAV/torchaudio) — plug it in here; BMP images and PCM WAV "
        "audio decode natively"
    )


def decode_assets(
    assets: DataFrame, backend: DecodeBackend = DecodeBackend.FAKE
) -> DataFrame:
    """binary -> typed media metadata via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = (
            _real_decode_row if backend == DecodeBackend.REAL else _fake_decode_row
        )
        for pdf in batches:
            out = [decode(k, bytes(d)) for k, d in zip(pdf["kind"], pdf["data"])]
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

    def real_feature(kind: str, data: bytes) -> list[float]:
        # 16-bin normalized content histogram — grayscale for images,
        # absolute amplitude for audio; vectorized numpy, no codec
        if kind == "image":
            _w, _h, px = _decode_bmp(data)
            gray = px.mean(axis=2).ravel()
            hist, _ = np.histogram(gray, bins=FEATURE_DIM, range=(0.0, 255.0))
        elif kind == "audio":
            _sr, _ch, _n, samples = _decode_wav(data)
            hist, _ = np.histogram(
                np.abs(samples.astype(np.float32)), bins=FEATURE_DIM,
                range=(0.0, 32768.0),
            )
        else:
            raise NotImplementedError(
                f"real features for kind={kind!r} need an external codec"
            )
        return (hist / max(1, hist.sum())).astype(np.float32).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for k, d in zip(pdf["kind"], pdf["data"]):
                if backend == DecodeBackend.REAL:
                    feats.append(real_feature(k, bytes(d)))
                else:
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


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A REAL uncompressed 24bpp BMP with deterministic pixel content."""
    import struct

    stride = (width * 3 + 3) & ~3
    size = 54 + stride * height
    rng = np.random.default_rng(seed)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = rng.integers(
        0, 256, size=(height, width * 3), dtype=np.uint8
    )
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def make_wav(n_samples: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    """A REAL 16-bit mono PCM WAV with deterministic sample content."""
    import struct

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n_samples, dtype=np.int16)
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def synth_real_assets(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Asset table whose payloads are REAL decodable bytes (BMP/WAV),
    alternating image/audio — drives DecodeBackend.REAL end-to-end."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 4, 6 + (i % 7) * 2
            rows.append(
                (i, "image", {"w": str(w), "h": str(h)},
                 bytearray(make_bmp(w, h, seed + i)))
            )
        else:
            ns, sr = 1000 + 100 * (i % 9), 8000 * (1 + i % 3)
            rows.append(
                (i, "audio", {"n": str(ns), "sr": str(sr)},
                 bytearray(make_wav(ns, sr, seed + i)))
            )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (binary payload from sha256)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        data = hashlib.sha256(f"asset:{seed}:{i}".encode()).digest() * (1 + i % 4)
        rows.append((i, kind, {"origin": f"synth{seed}"}, bytearray(data)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
