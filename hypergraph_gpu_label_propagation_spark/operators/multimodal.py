"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata; decode and
feature extraction run Arrow-batched behind ``DecodeBackend``:

- ``DecodeBackend.REAL`` performs genuine byte-level decoding for the
  formats decodable with numpy + the stdlib alone — uncompressed BMP
  images (BITMAPINFOHEADER parse + pixel array), 8-bit non-interlaced
  PNG (chunk walk + zlib inflate + scanline unfilter incl. Paeth),
  baseline-DCT JPEG (Huffman entropy decode + dequant + IDCT, size-
  capped), PCM WAV audio (RIFF chunk walk + sample array), and MP4
  container metadata (ISO BMFF box walk: tkhd dims, stsz/stts frame
  count, mvhd duration — everything ``decode_assets`` reports needs no
  codec).  What still raises NotImplementedError at the decode call
  site: video FRAME decode / video features (mdat is codec bitstream),
  progressive/12-bit JPEG, 16-bit/interlaced/palette PNG, oversize
  Average-Paeth PNG and >0.26 MP JPEG — swap in Pillow/torchaudio/PyAV
  there on a real cluster (this container ships none of them).
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


def _codec_guard(fn):
    """Decoder-boundary error contract: malformed/truncated payloads
    raise ValueError (or NotImplementedError for real-but-unsupported
    features) — never struct.error/IndexError/zlib.error.  A corrupt
    asset in a 100 TB ingest must be catchable by the documented types
    in the mapInPandas wrapper, not crash the task with whatever the
    byte-level parse happened to trip over (found by tests/
    test_decode_fuzz.py truncation/corruption sweeps)."""
    import functools
    import struct
    import zlib

    @functools.wraps(fn)
    def wrapped(data: bytes, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (struct.error, IndexError, zlib.error, KeyError,
                ZeroDivisionError) as exc:
            # KeyError/ZeroDivisionError are the safety net for corrupt
            # cross-references the targeted checks miss; the checks stay
            # because their messages say WHAT is corrupt
            raise ValueError(
                f"{fn.__name__}: truncated or corrupt payload ({exc!r})"
            ) from exc

    return wrapped


@_codec_guard
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

# Average/Paeth unfilter is a sequential bytearray scan (~4.2 MB/s);
# the cap (matching _JPEG_MAX_PIXELS) bounds a hostile payload at a few
# seconds of executor core, raised 1 MP -> 4 MP in r07 (6.1x scan)
_PNG_MAX_PIXELS = 1 << 22  # ~4.2 MP


@_codec_guard
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
    # at any size; Average/Paeth keep a sequential left-dependency scan.
    # r07 A/B on an all-Paeth RGB workload: pure-Python-int bytearray
    # scan 4.2 MB/s (6.1x the old numpy-scalar loop); the "vectorize on
    # the channel axis, loop over width" shape is a measured NEGATIVE
    # (0.47 MB/s, 0.7x — size-3 numpy ops cost more than scalar ints).
    # The cap matches JPEG's 4 MP: worst case ~4 s/image, bounded — a
    # true vectorization needs an external codec (Pillow plug point).
    fts = np.frombuffer(raw, np.uint8)[:: stride + 1][:h]
    if fts.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter type {int(fts.max())}")
    if np.isin(fts, (3, 4)).any() and h * w > _PNG_MAX_PIXELS:
        raise NotImplementedError(
            f"PNG with Average/Paeth filtered scanlines above "
            f"{_PNG_MAX_PIXELS} pixels ({w}x{h}) needs an external codec "
            f"(Pillow plug point, DecodeBackend.REAL) — the stdlib "
            f"unfilter is sequential Python for those filter types"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prior_b = bytes(stride)  # previous reconstructed row, as bytes
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        lb = raw[base + 1 : base + 1 + stride]
        if ft == 0:
            rec_b = lb
        elif ft == 2:  # Up: fully vectorized (no left dependency)
            rec_b = (
                (
                    np.frombuffer(lb, np.uint8).astype(np.int16)
                    + np.frombuffer(prior_b, np.uint8)
                )
                % 256
            ).astype(np.uint8).tobytes()
        elif ft == 1:  # Sub: rec[x] = line[x] + rec[x-bpp] == per-channel
            # prefix sum mod 256 — vectorized via reshape + cumsum
            rec_b = (
                np.cumsum(
                    np.frombuffer(lb, np.uint8).reshape(w, bpp),
                    axis=0,
                    dtype=np.int64,
                ).reshape(stride)
                % 256
            ).astype(np.uint8).tobytes()
        elif ft == 3:  # Average: pred = (left + up) >> 1, sequential left
            rec = bytearray(stride)
            pr = prior_b
            for x in range(bpp):
                rec[x] = (lb[x] + (pr[x] >> 1)) & 255
            for x in range(bpp, stride):
                rec[x] = (lb[x] + ((rec[x - bpp] + pr[x]) >> 1)) & 255
            rec_b = bytes(rec)
        else:  # Paeth; pa = |b-c|, pb = |a-c|, pc = |a+b-2c| (T.81-style
            # algebraic reduction of |p-a|,|p-b|,|p-c| with p = a+b-c)
            rec = bytearray(stride)
            pr = prior_b
            for x in range(bpp):
                rec[x] = (lb[x] + pr[x]) & 255  # a = c = 0 -> pred = b
            for x in range(bpp, stride):
                a = rec[x - bpp]
                b = pr[x]
                c = pr[x - bpp]
                pa = b - c
                if pa < 0:
                    pa = -pa
                pb = a - c
                if pb < 0:
                    pb = -pb
                pc = a + b - 2 * c
                if pc < 0:
                    pc = -pc
                rec[x] = (
                    lb[x]
                    + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 255
            rec_b = bytes(rec)
        out[y] = np.frombuffer(rec_b, np.uint8)
        prior_b = rec_b
    px = out.reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 4:
        px = px[:, :, :3]
    return w, h, px


# JPEG zigzag scan: _JPEG_ZZ[k] = natural (row-major) index of scan
# position k.  Generated from the diagonal-walk definition (ITU T.81
# Figure 5) rather than transcribed — even diagonals run up-right, odd
# run down-left.
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 else reversed(rs)):
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


_JPEG_ZZ = _zigzag_order()


def _idct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis T (T @ T.T == I); spatial
    block = T.T @ coefs @ T."""
    n = np.arange(8)
    t = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    t[0] /= np.sqrt(2.0)
    return t


_IDCT_T = _idct_basis()

# entropy decode is sequential Python (peek-16 LUT + 48-bit window
# fetches, ~1.2 MP/s on worst-case noise, ~3 MP/s on photo-like
# content); the cap keeps a hostile payload from pinning an executor
# core, raised 512x512 -> 4 MP in r07 after the 5.5x hot-path rewrite
_JPEG_MAX_PIXELS = 1 << 22  # 2048 x 2048 (~4.2 MP)


def _huffman_codes(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    """Canonical Huffman from a DHT (BITS, HUFFVAL) pair as an ENCODE
    map {symbol: (code_length, code)} — the make_jpeg writer's view."""
    table: dict[int, tuple[int, int]] = {}
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[vi]] = (length, code)
            code += 1
            vi += 1
        code <<= 1
    return table


def _build_huffman(bits: bytes, vals: bytes) -> list[int]:
    """Canonical Huffman from a DHT (BITS, HUFFVAL) pair as a 65536-entry
    peek-16 lookup: table[next16bits] = (symbol << 5) | code_length, 0
    where no code matches (canonical codes are prefix-free, so at most
    one code matches any 16-bit window — the LUT is exactly the old
    bit-by-bit walk, one probe instead of up to 16)."""
    table = [0] * 65536
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            packed = (vals[vi] << 5) | length
            table[start : start + (1 << (16 - length))] = [packed] * (
                1 << (16 - length)
            )
            code += 1
            vi += 1
        code <<= 1
    return table


@_codec_guard
def _decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline-DCT JFIF JPEG with numpy + the stdlib alone:
    marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman from the
    stream's own DHT segments, FF00 unstuffing + RST-segmented entropy
    decode, zigzag dequantization, matrix IDCT, sampling-factor
    upsampling (4:4:4/4:2:2/4:2:0), JFIF YCbCr->RGB.  Returns (width,
    height, HxWx3 uint8); grayscale replicates to 3 channels.

    Progressive (SOF2) / extended / arithmetic / 12-bit streams raise
    NotImplementedError — as does anything above ~4.2 MP, because the
    entropy decode is sequential Python, ~1.2 MP/s worst case (the
    Pillow plug point, DecodeBackend.REAL), mirroring the PNG cap."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq), ...])
    dri = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quantization tables need an external codec"
                    )
                raw = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                nat = np.zeros(64, np.int32)
                nat[_JPEG_ZZ] = raw  # DQT bytes arrive in zigzag order
                qt[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = body[i + 1 : i + 17]
                n = sum(bits)
                huff[(tc, th)] = _build_huffman(bits, body[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline DCT
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG decodes natively")
            comps = [
                (body[6 + 3 * c], body[7 + 3 * c] >> 4, body[7 + 3 * c] & 15,
                 body[8 + 3 * c])
                for c in range(nc)
            ]
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}: progressive/"
                f"extended/arithmetic) needs an external codec (Pillow plug "
                f"point, DecodeBackend.REAL)"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan_tabs = {
                body[1 + 2 * c]: (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15)
                for c in range(ns)
            }
            return _decode_jpeg_scan(
                data, pos + 2 + seglen, frame, qt, huff, scan_tabs, dri
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS segment")


def _decode_jpeg_scan(data, start, frame, qt, huff, scan_tabs, dri):
    h, w, comps = frame
    if h * w > _JPEG_MAX_PIXELS:
        raise NotImplementedError(
            f"JPEG above {_JPEG_MAX_PIXELS} pixels ({w}x{h}) needs an "
            f"external codec — the native entropy decode is sequential "
            f"Python (Pillow plug point, DecodeBackend.REAL)"
        )
    if len(comps) not in (1, 3):
        raise NotImplementedError("only 1- or 3-component JPEG decodes natively")
    # cross-segment reference validation up front: corrupt streams must
    # fail the documented ValueError contract, not KeyError deep in the
    # MCU loop / ZeroDivisionError in the ratio math (code-review fuzz
    # follow-up — ~1% of single-byte corruptions hit these)
    for cid, hs, vs, tq in comps:
        if hs < 1 or vs < 1:
            raise ValueError(f"JPEG component {cid} declares sampling factor 0")
        if tq not in qt:
            raise ValueError(
                f"JPEG component {cid} references undefined quant table {tq}"
            )
        if cid not in scan_tabs:
            raise ValueError(f"JPEG SOS omits frame component {cid}")
        dc_t, ac_t = scan_tabs[cid]
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise ValueError(
                f"JPEG SOS references undefined Huffman tables ({dc_t},{ac_t})"
            )

    # split entropy bytes into RST-delimited, FF00-unstuffed segments
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if any(maxh % c[1] or maxv % c[2] for c in comps):
        raise NotImplementedError("non-integer JPEG sampling ratios")
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    # r07 batch-IDCT layout: coefficients land in (block_row, block_col,
    # 64) natural-order arrays; dequant + IDCT + pixel assembly run ONCE
    # per component as whole-array numpy at the end (the old per-block
    # np.zeros + 8x8 matmul was ~40% of decode wall).  Entropy decode
    # below writes plain Python lists — no numpy in the bit loop.
    coefs = {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), np.float64)
        for cid, hs, vs, _ in comps
    }

    n_mcu = mcux * mcuy
    per_seg = dri if dri else n_mcu
    zz = [int(i) for i in _JPEG_ZZ]  # list indexing beats np in the loop
    # the per-component decode plan, hoisted out of the MCU loop
    plan = [
        (cid, hs, vs, huff[(0, scan_tabs[cid][0])],
         huff[(1, scan_tabs[cid][1])], coefs[cid])
        for cid, hs, vs, _ in comps
    ]
    from_bytes = int.from_bytes  # local binding for the hot loop
    mcu = 0
    for seg in segments:
        if mcu >= n_mcu:
            break
        # r07 hot path: bit reads run over local (sdata, pos, send) —
        # at ~12M symbol reads for a 4 MP noise image, method-call +
        # attribute overhead was half the decode wall.  Each iteration
        # fetches ONE 48-bit window serving both the Huffman code (<=16
        # bits after <=7 bits of byte misalignment) and its magnitude
        # bits (<=15): 7+16+15 = 38 <= 48.  Bit semantics follow T.81:
        # 6 trailing 0xFF bytes = the spec's phantom-1 final-byte
        # padding (a trailing EOB straddling the boundary decodes), and
        # consuming >16 phantom bits raises the documented truncation
        # ValueError — magnitude bits must never silently decode from
        # padding (r06 ADVICE; the fuzz suite verifies byte-by-byte).
        # 8 pad bytes, not 6: the truncation allowance lets pos reach
        # send+16 before a fetch, i.e. byte0 up to len(seg)+2, and the
        # 6-byte window must still be fully inside the pad so phantom
        # bits read as 1s (a short slice would read them as ZEROS and
        # the LUT could match a spurious all-zero-prefix code instead
        # of raising the truncation error; r07 review)
        sdata = seg + b"\xff" * 8
        send = len(seg) * 8
        pos = 0
        pred = {cid: 0 for cid, *_ in comps}  # DC predictors reset per RST
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, hs, vs, dc_table, ac_table, comp_coefs in plan:
                dc_pred = pred[cid]
                for v in range(vs):
                    for u in range(hs):
                        coef = [0.0] * 64
                        byte0 = pos >> 3
                        off = pos & 7
                        chunk = from_bytes(sdata[byte0 : byte0 + 6], "big")
                        packed = dc_table[(chunk >> (32 - off)) & 0xFFFF]
                        if packed == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        length = packed & 31
                        s = packed >> 5
                        if s:
                            mag = (chunk >> (48 - off - length - s)) & (
                                (1 << s) - 1
                            )
                            dc_pred += (
                                mag if mag >= (1 << (s - 1))
                                else mag - (1 << s) + 1
                            )
                        pos += length + s
                        if pos - send > 16:
                            raise ValueError("JPEG entropy stream truncated")
                        coef[0] = float(dc_pred)
                        k = 1
                        while k < 64:
                            byte0 = pos >> 3
                            off = pos & 7
                            chunk = from_bytes(sdata[byte0 : byte0 + 6], "big")
                            packed = ac_table[(chunk >> (32 - off)) & 0xFFFF]
                            if packed == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            length = packed & 31
                            rs = packed >> 5
                            sz = rs & 15
                            if sz == 0:
                                pos += length
                                if rs == 240:  # ZRL: sixteen zeros
                                    k += 16
                                    if pos - send > 16:
                                        raise ValueError(
                                            "JPEG entropy stream truncated"
                                        )
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            mag = (chunk >> (48 - off - length - sz)) & (
                                (1 << sz) - 1
                            )
                            pos += length + sz
                            if pos - send > 16:
                                raise ValueError("JPEG entropy stream truncated")
                            coef[zz[k]] = float(
                                mag if mag >= (1 << (sz - 1))
                                else mag - (1 << sz) + 1
                            )
                            k += 1
                        if pos - send > 16:
                            raise ValueError("JPEG entropy stream truncated")
                        comp_coefs[my * vs + v, mx * hs + u] = coef
                pred[cid] = dc_pred
            mcu += 1

    planes = {}
    for cid, hs, vs, tq in comps:
        c = coefs[cid] * qt[tq].astype(np.float64)  # dequant, natural order
        by, bx = c.shape[0], c.shape[1]
        blocks = c.reshape(by, bx, 8, 8)  # [by, bx, j, k] = M[j, k]
        # spatial[i, l] = (T.T @ M @ T)[i, l], batched over every block:
        #   t1[by, bx, j, l] = sum_k M[j, k] T[k, l]          (= M @ T)
        #   t2[by, bx, l, i] = sum_j t1[.., j, l] T[j, i]     (= (T.T M T).T)
        t1 = np.tensordot(blocks, _IDCT_T, axes=([3], [0]))
        t2 = np.tensordot(t1, _IDCT_T, axes=([2], [0]))
        # t2 carries (l, i) — realign to rows-then-cols and fuse blocks
        # into the plane: plane[by*8 + i, bx*8 + l] = t2[by, bx, l, i]
        planes[cid] = (
            t2.transpose(0, 3, 1, 2).reshape(by * 8, bx * 8) + 128.0
        )

    # upsample to full resolution, crop padding, color-convert
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, maxv // vs, axis=0), maxh // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the color path — plain astype truncates and would
        # bias gray output ~0.5 LSB low vs reference decoders
        px = np.clip(full[0], 0, 255).round().astype(np.uint8)
        return w, h, np.repeat(px[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)
    return w, h, px


def _decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """Route by magic bytes: BMP, PNG and baseline JPEG decode
    natively; anything else needs an external codec."""
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:8] == PNG_MAGIC:
        return _decode_png(data)
    if data[:2] == b"\xff\xd8":
        return _decode_jpeg(data)
    raise ValueError("not a BMP/PNG/JPEG payload")


@_codec_guard
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
            if sr < 1:
                # duration_ms divides by sr one level up — corrupt rate
                # must be the documented ValueError, not ZeroDivision
                raise ValueError(f"WAV fmt chunk declares sample_rate={sr}")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)
    # ch is checked explicitly: a data chunk with no fmt chunk must be a
    # ValueError here, not an incidental ZeroDivisionError below
    if sr is None or ch is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, ch, len(samples) // ch, samples


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield ``(box_type, body_start, body_end)`` for the ISO BMFF boxes
    in ``data[start:end]`` (ISO/IEC 14496-12 §4.2): 32-bit size, size==1
    -> 64-bit largesize follows the type, size==0 -> box runs to the end
    of the enclosing container."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("MP4 largesize box truncated")
            (large,) = struct.unpack_from(">Q", data, body)
            body += 8
            box_end = pos + large
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, body, box_end
        pos = box_end


def _mp4_find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _mp4_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


@_codec_guard
def _parse_mp4(data: bytes) -> tuple[int, int, int, float]:
    """Parse video metadata — (width, height, n_frames, duration_ms) —
    from an MP4/ISO-BMFF container with ``struct`` alone.  Everything
    :func:`decode_assets` reports lives in the ``moov`` metadata tree
    (tkhd 16.16 track dimensions, stsz sample count cross-checked
    against the stts delta table, mvhd duration/timescale), so no codec
    is involved; decoding the FRAMES (mdat payload, H.264 etc.) is the
    external-codec plug point, not this.  Fragmented MP4 (moof) and
    files whose first video trak is codec-described-only raise."""
    import struct

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF payload (missing ftyp)")
    moov = _mp4_find(data, 0, len(data), b"moov")
    if moov is None:
        if _mp4_find(data, 0, len(data), b"moof") is not None:
            raise NotImplementedError(
                "fragmented MP4 (moof) needs an external demuxer"
            )
        raise ValueError("MP4 missing moov box")
    mvhd = _mp4_find(data, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("MP4 moov missing mvhd")
    ver = data[mvhd[0]]
    if ver == 1:
        (timescale,) = struct.unpack_from(">I", data, mvhd[0] + 20)
        (duration,) = struct.unpack_from(">Q", data, mvhd[0] + 24)
    else:
        timescale, duration = struct.unpack_from(">II", data, mvhd[0] + 12)
    if timescale == 0:
        raise ValueError("MP4 mvhd timescale is zero")

    for t, b, e in _mp4_boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _mp4_find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _mp4_find(data, b, e, b"tkhd")
        if tkhd is None:
            raise ValueError("MP4 video trak missing tkhd")
        tver = data[tkhd[0]]
        # width/height are 16.16 fixed point, last 8 bytes of the body
        dim_off = tkhd[0] + (88 if tver == 1 else 76)
        wfix, hfix = struct.unpack_from(">II", data, dim_off)
        width, height = wfix >> 16, hfix >> 16
        minf = _mp4_find(data, mdia[0], mdia[1], b"minf")
        stbl = minf and _mp4_find(data, minf[0], minf[1], b"stbl")
        if not stbl:
            raise ValueError("MP4 video trak missing minf/stbl")
        stsz = _mp4_find(data, stbl[0], stbl[1], b"stsz")
        stts = _mp4_find(data, stbl[0], stbl[1], b"stts")
        if stsz is None or stts is None:
            raise ValueError("MP4 video trak missing stsz/stts")
        (n_frames,) = struct.unpack_from(">I", data, stsz[0] + 8)
        (n_stts,) = struct.unpack_from(">I", data, stts[0] + 4)
        stts_total = sum(
            struct.unpack_from(">I", data, stts[0] + 8 + 8 * i)[0]
            for i in range(n_stts)
        )
        if stts_total != n_frames:
            raise ValueError(
                f"MP4 stts sample total {stts_total} != stsz count {n_frames}"
            )
        return width, height, n_frames, round(1000.0 * duration / timescale, 2)
    raise ValueError("MP4 has no video trak")


def _real_decode_row(kind: str, data: bytes) -> tuple[int, int, int, int, float]:
    if kind == "image":
        w, h, _ = _decode_image(data)
        return w, h, 1, 0, 0.0
    if kind == "audio":
        sr, _ch, n, _ = _decode_wav(data)
        return 0, 0, n, sr, round(1000.0 * n / sr, 2)
    if kind == "video":
        w, h, n, dur_ms = _parse_mp4(data)
        return w, h, n, 0, dur_ms
    raise NotImplementedError(
        f"real decode of kind={kind!r} requires an external codec "
        "(PyAV/torchaudio) — plug it in here; BMP/PNG/JPEG images, PCM "
        "WAV audio and MP4 container metadata decode natively"
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


def make_jpeg(
    width: int,
    height: int,
    seed: int = 0,
    gray: bool = False,
    sampling: tuple[int, int] = (1, 1),
    restart: int = 0,
    quant: int = 1,
    smooth: bool = False,
) -> bytes:
    """A REAL baseline-DCT JPEG with deterministic content — the test
    encoder for :func:`_decode_jpeg`.

    Independence note: this encoder does NOT share entropy tables with
    the decoder — it writes its OWN canonical Huffman tables into DHT
    (DC symbols 0-11 at 4 bits; all 256 AC symbols at 9-10 bits), so
    decoding exercises the stream's DHT parse, not a compiled-in
    constant.  The forward DCT reuses ``_IDCT_T`` (orthonormal, so the
    transpose IS the inverse); tests pin the basis against its spec
    definition separately so an error there can't cancel out.

    ``sampling`` = luma (h, v) factors; chroma is 1x1 (so (2, 2) is
    4:2:0, (2, 1) is 4:2:2).  ``restart`` > 0 emits DRI + RSTn every
    that many MCUs.  ``quant`` scales a flat quantization table;
    ``smooth`` draws a low-frequency gradient instead of noise (tiny
    reconstruction error, for tight-tolerance tests)."""
    import struct

    rng = np.random.default_rng(seed)
    if smooth:
        yy, xx = np.mgrid[0:height, 0:width]
        base = (
            96.0
            + 64.0 * np.sin(2 * np.pi * xx / max(8, width))
            + 48.0 * np.cos(2 * np.pi * yy / max(8, height))
        )
        px = np.stack(
            [np.clip(base + 16 * c, 0, 255) for c in range(3)], axis=2
        ).astype(np.float64)
    else:
        px = rng.integers(0, 256, size=(height, width, 3)).astype(np.float64)

    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hs, vs = sampling
    if gray:
        comps = [(1, 1, 1, 0, y)]
    else:
        # chroma planes: hs x vs block means of the full-res plane
        def down(p):
            ph = -(-height // vs) * vs
            pw = -(-width // hs) * hs
            pad = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            return pad.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))

        comps = [(1, hs, vs, 0, y), (2, 1, 1, 1, down(cb)), (3, 1, 1, 1, down(cr))]

    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    mcux = -(-width // (8 * maxh))
    mcuy = -(-height // (8 * maxv))

    qt_nat = np.full(64, quant, dtype=np.int32)
    qt_zz = qt_nat[_JPEG_ZZ].astype(np.uint8)

    # canonical tables of our own design (see docstring)
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    dc_vals = bytes(range(12))
    ac_bits = bytes([0] * 8 + [255, 1] + [0] * 6)
    ac_vals = bytes(range(256))
    enc_dc = _huffman_codes(dc_bits, dc_vals)
    enc_ac = _huffman_codes(ac_bits, ac_vals)

    out = bytearray()
    bitbuf, nbits = 0, 0

    def put(code_len: int, code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << code_len) | (code & ((1 << code_len) - 1))
        nbits += code_len
        while nbits >= 8:
            byte = (bitbuf >> (nbits - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    def flush() -> None:
        nonlocal bitbuf, nbits
        if nbits:
            put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

    def put_magnitude(v: int) -> int:
        """Emit magnitude bits for v; return the SIZE category."""
        size = int(abs(v)).bit_length()
        if size:
            put(size, v if v >= 0 else v + (1 << size) - 1)
        return size

    # plane padding to MCU grid, per comp
    padded = {}
    for cid, chs, cvs, _tq, plane in comps:
        ph, pw = mcuy * cvs * 8, mcux * chs * 8
        padded[cid] = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    pred = {c[0]: 0 for c in comps}
    n_mcu = mcux * mcuy
    rst_segments: list[bytes] = []
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            flush()
            rst_segments.append(bytes(out))
            out = bytearray()
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, chs, cvs, _tq, _p in comps:
            for v in range(cvs):
                for u in range(chs):
                    y0, x0 = (my * cvs + v) * 8, (mx * chs + u) * 8
                    block = padded[cid][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _IDCT_T @ block @ _IDCT_T.T
                    q = np.round(coef.reshape(64) / qt_nat).astype(np.int64)
                    zz = q[_JPEG_ZZ]
                    diff = int(zz[0]) - pred[cid]
                    pred[cid] = int(zz[0])
                    size = int(abs(diff)).bit_length()
                    put(*enc_dc[size])
                    put_magnitude(diff)
                    k, run = 1, 0
                    while k < 64:
                        if zz[k] == 0:
                            run += 1
                        else:
                            while run > 15:
                                put(*enc_ac[0xF0])  # ZRL
                                run -= 16
                            v_ac = int(zz[k])
                            size = abs(v_ac).bit_length()
                            put(*enc_ac[(run << 4) | size])
                            put_magnitude(v_ac)
                            run = 0
                        k += 1
                    if run:
                        put(*enc_ac[0x00])  # EOB
    flush()
    rst_segments.append(bytes(out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    sof_comps = b"".join(
        struct.pack(">BBB", cid, (chs << 4) | cvs, tq)
        for cid, chs, cvs, tq, _ in comps
    )
    sos_comps = b"".join(
        struct.pack(">BB", cid, 0x00 if cid == 1 else 0x11) for c in comps
        for cid in [c[0]]
    )
    dhts = seg(0xC4, b"\x00" + dc_bits + dc_vals) + seg(
        0xC4, b"\x10" + ac_bits + ac_vals
    )
    dqts = seg(0xDB, b"\x00" + qt_zz.tobytes())
    if not gray:
        dhts += seg(0xC4, b"\x01" + dc_bits + dc_vals) + seg(
            0xC4, b"\x11" + ac_bits + ac_vals
        )
        dqts += seg(0xDB, b"\x01" + qt_zz.tobytes())

    scan = rst_segments[0]
    for i, s in enumerate(rst_segments[1:]):
        scan += bytes([0xFF, 0xD0 + (i % 8)]) + s

    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqts
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, height, width, len(comps)) + sof_comps,
        )
        + dhts
        + (seg(0xDD, struct.pack(">H", restart)) if restart else b"")
        + seg(0xDA, bytes([len(comps)]) + sos_comps + b"\x00\x3f\x00")
        + scan
        + b"\xff\xd9"
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


def make_mp4(
    width: int,
    height: int,
    n_frames: int,
    fps: int = 30,
    seed: int = 0,
    v1: bool = False,
    media_timescale: int = 90000,
) -> bytes:
    """A REAL (spec-valid, losslessly re-parseable) MP4/ISO-BMFF
    container with deterministic pseudo-frame payloads — the test
    source for :func:`_parse_mp4`.

    Layout: ``ftyp`` + ``mdat`` (one chunk of per-frame noise bytes,
    varying sizes) + ``moov`` (mvhd / trak[tkhd 16.16 dims, mdia[mdhd,
    hdlr 'vide', minf[vmhd, dinf/dref, stbl[stsd 'mp4v', stts one-run
    delta table, stsc, stsz per-frame sizes, stco]]]]).  ``v1`` writes
    version-1 mvhd/tkhd (64-bit times) so the parser's offset math for
    both box versions stays covered.  The mdat bytes are NOT valid
    codec bitstream — frame decode is exactly the external-codec plug
    point — but every byte of box structure is real."""
    import struct

    rng = np.random.default_rng(seed)

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    sizes = [40 + int((7 * i + seed) % 32) for i in range(n_frames)]
    mdat_payload = rng.integers(0, 256, size=sum(sizes), dtype=np.uint8).tobytes()
    mdat = box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # first frame byte, file-absolute (stco)

    movie_ts = 1000
    movie_dur = (n_frames * movie_ts) // fps
    media_dur = (n_frames * media_timescale) // fps
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    if v1:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3xQQIQ", 1, 0, 0, movie_ts, movie_dur)
            + struct.pack(">IHH8x", 0x10000, 0x0100, 0)
            + matrix + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tkhd = box(
            b"tkhd",
            struct.pack(">B3BQQI4xQ", 1, 0, 0, 7, 0, 0, 1, movie_dur)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + matrix + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = box(
            b"mdhd",
            struct.pack(">B3xQQIQHH", 1, 0, 0, media_timescale, media_dur, 0x55C4, 0),
        )
    else:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3xIIII", 0, 0, 0, movie_ts, movie_dur)
            + struct.pack(">IHH8x", 0x10000, 0x0100, 0)
            + matrix + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tkhd = box(
            b"tkhd",
            struct.pack(">B3BIII4xI", 0, 0, 0, 7, 0, 0, 1, movie_dur)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + matrix + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = box(
            b"mdhd",
            struct.pack(">B3xIIIIHH", 0, 0, 0, media_timescale, media_dur, 0x55C4, 0),
        )

    hdlr = box(b"hdlr", struct.pack(">I4x", 0) + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
    dref = box(b"dref", struct.pack(">II", 0, 1) + box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)))
    dinf = box(b"dinf", dref)
    sample_entry = box(
        b"mp4v",
        b"\x00" * 6 + struct.pack(">H", 1)          # data-reference index
        + struct.pack(">HH12x", 0, 0)               # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)  # 72dpi, 1 frame/sample
        + b"\x00" * 32                              # compressor name
        + struct.pack(">Hh", 24, -1),               # depth, predefined
    )
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = box(
        b"stts",
        struct.pack(">III I", 0, 1, n_frames, media_timescale // fps),
    )
    stsc = box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n_frames, 1))
    stsz = box(
        b"stsz",
        struct.pack(">III", 0, 0, n_frames) + struct.pack(f">{n_frames}I", *sizes),
    )
    stco = box(b"stco", struct.pack(">III", 0, 1, chunk_offset))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def synth_real_assets(
    spark, n: int = 24, seed: int = 42, n_jpeg: int = 4, n_mp4: int = 4
) -> DataFrame:
    """Asset table whose payloads are REAL decodable bytes
    (BMP/PNG/WAV, plus ``n_jpeg`` appended baseline JPEGs cycling
    gray/4:4:4/4:2:0/restart variants and ``n_mp4`` appended MP4
    containers alternating box versions 0/1), alternating image/audio
    (images alternate BMP and PNG, PNGs cycle gray/RGB/RGBA) — drives
    DecodeBackend.REAL end-to-end."""
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
    for j in range(n_jpeg):
        w, h = 16 + 8 * (j % 3), 16 + 8 * ((j + 1) % 3)
        payload = make_jpeg(
            w, h, seed=seed + n + j,
            gray=(j % 4 == 0),
            sampling=(2, 2) if j % 4 == 2 else (1, 1),
            restart=2 if j % 4 == 3 else 0,
            smooth=True,
        )
        rows.append(
            (n + j, "image", {"w": str(w), "h": str(h)}, bytearray(payload))
        )
    for j in range(n_mp4):
        w, h, nf, fps = 64 + 16 * j, 48 + 16 * j, 24 + 12 * j, (24, 30)[j % 2]
        payload = make_mp4(w, h, nf, fps=fps, seed=seed + n + n_jpeg + j,
                           v1=(j % 2 == 1))
        rows.append(
            (n + n_jpeg + j, "video",
             {"w": str(w), "h": str(h), "n": str(nf), "fps": str(fps)},
             bytearray(payload))
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
