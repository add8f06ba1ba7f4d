"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata; decode and
feature extraction run Arrow-batched behind ``DecodeBackend``:

- ``DecodeBackend.REAL`` performs genuine byte-level decoding for the
  formats decodable with numpy + the stdlib alone — uncompressed BMP
  images (BITMAPINFOHEADER parse + pixel array), 8-bit non-interlaced
  PNG (chunk walk + zlib inflate + scanline unfilter incl. Paeth), and
  PCM WAV audio (RIFF chunk walk + sample array).  Formats that need an
  external codec (JPEG/MP4/16-bit-or-interlaced PNG/...) raise
  NotImplementedError at the decode call site — swap in
  Pillow/torchaudio/PyAV there on a real cluster (this container ships
  none of them).
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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a non-interlaced 8-bit gray/RGB/RGBA PNG with the stdlib
    alone (r04 verdict #6): chunk walk (IHDR/IDAT/IEND + CRC layout),
    ``zlib`` inflate, then per-scanline unfilter of all five PNG filter
    types (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Returns (width,
    height, HxWx3 uint8) — gray replicates to 3 channels, RGBA drops
    alpha.  16-bit, palette, and interlaced PNGs still need an external
    codec and raise NotImplementedError."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/RGBA PNG decodes without "
            f"external codecs (depth={depth}, color_type={color}, "
            f"interlace={interlace})"
        )
    raw = zlib.decompress(idat)
    stride, bpp = w * channels, channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    # filter-type census up front: None/Up/Sub unfilter fully vectorized
    # at any size, but Average/Paeth keep a per-byte left-dependency loop
    # — interpreter-bound, so real-sized photos routed through
    # DecodeBackend.REAL must hit the documented external-codec plug
    # point instead of effectively hanging the executor (r05 advice)
    fts = np.frombuffer(raw, np.uint8)[:: stride + 1][:h]
    if fts.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter type {int(fts.max())}")
    if np.isin(fts, (3, 4)).any() and h * w > 1 << 20:
        raise NotImplementedError(
            f"PNG with Average/Paeth filtered scanlines above 1 MP "
            f"({w}x{h}) needs an external codec (Pillow plug point, "
            f"DecodeBackend.REAL) — the stdlib unfilter is per-byte "
            f"Python for those filter types"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).astype(
            np.int32
        )
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up: fully vectorized (no left dependency)
            rec = (line + prior) % 256
        elif ft == 1:  # Sub: rec[x] = line[x] + rec[x-bpp] == per-channel
            # prefix sum mod 256 — vectorized via reshape + cumsum
            rec = (
                np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.int64)
                .reshape(stride) % 256
            )
        else:  # Average/Paeth reference the reconstructed left pixel
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                if ft == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = int(prior[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) % 256
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 4:
        px = px[:, :, :3]
    return w, h, px


def _decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """Route by magic bytes: BMP and PNG decode natively; anything else
    needs an external codec."""
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:8] == PNG_MAGIC:
        return _decode_png(data)
    raise ValueError("not a BMP/PNG payload")


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
        w, h, _ = _decode_image(data)
        return w, h, 1, 0, 0.0
    if kind == "audio":
        sr, _ch, n, _ = _decode_wav(data)
        return 0, 0, n, sr, round(1000.0 * n / sr, 2)
    raise NotImplementedError(
        f"real decode of kind={kind!r} requires an external codec "
        "(PyAV/torchaudio) — plug it in here; BMP/PNG images and PCM WAV "
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
            _w, _h, px = _decode_image(data)
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


def make_png(
    width: int, height: int, seed: int = 0, color_type: int = 2
) -> bytes:
    """A REAL 8-bit PNG (gray/RGB/RGBA by ``color_type``) with
    deterministic pixel content, cycling ALL FIVE scanline filter types
    (y % 5) so every unfilter path in :func:`_decode_png` is exercised;
    stdlib ``zlib`` only.  Forward filtering is vectorized — PNG filters
    predict from RAW neighbor bytes, so no sequential dependency on the
    encode side."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width * channels), dtype=np.uint8)
    bpp = channels
    zero = np.zeros(width * channels, dtype=np.int32)
    lines = []
    for y in range(height):
        ft = y % 5
        cur = px[y].astype(np.int32)
        prior = px[y - 1].astype(np.int32) if y > 0 else zero
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if ft == 0:
            f = cur
        elif ft == 1:
            f = (cur - left) % 256
        elif ft == 2:
            f = (cur - prior) % 256
        elif ft == 3:
            f = (cur - (left + prior) // 2) % 256
        else:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            f = (cur - pred) % 256
        lines.append(bytes([ft]) + f.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


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
    """Asset table whose payloads are REAL decodable bytes (BMP/PNG/WAV),
    alternating image/audio (images alternate BMP and PNG, PNGs cycle
    gray/RGB/RGBA) — drives DecodeBackend.REAL end-to-end."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 4, 6 + (i % 7) * 2
            if i % 4 == 0:
                payload = make_bmp(w, h, seed + i)
            else:
                payload = make_png(w, h, seed + i, color_type=[0, 2, 6][i % 3])
            rows.append(
                (i, "image", {"w": str(w), "h": str(h)}, bytearray(payload))
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
