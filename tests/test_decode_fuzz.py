"""Decoder robustness fuzz: every REAL byte-level decoder must reject
malformed input with ValueError/NotImplementedError — never hang,
never allocate from unvalidated header fields, never crash with an
unrelated exception type.

Deterministic corpora (seeded PRNG), pure Python — no Spark session.
Three classes per format: random noise with the right magic prefix,
progressive truncations of a valid payload, and single-byte
corruptions of a valid payload.
"""

import numpy as np
import pytest

from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
    _decode_bmp,
    _decode_jpeg,
    _decode_png,
    _decode_wav,
    _parse_mp4,
    make_bmp,
    make_jpeg,
    make_mp4,
    make_png,
    make_wav,
)

OK_ERRORS = (ValueError, NotImplementedError)


def _must_reject_or_decode(decoder, payload):
    """Malformed input either raises one of the documented error types
    or (for single-byte corruptions that hit don't-care bytes) still
    decodes — anything else (TypeError, struct.error, IndexError,
    OverflowError, MemoryError, hang) is a bug."""
    try:
        decoder(payload)
    except OK_ERRORS:
        pass


CASES = [
    ("bmp", _decode_bmp, lambda: make_bmp(12, 9, seed=1), b"BM"),
    ("png", _decode_png, lambda: make_png(12, 9, seed=1, color_type=2), None),
    ("jpeg", _decode_jpeg, lambda: make_jpeg(16, 16, seed=1), b"\xff\xd8"),
    ("wav", _decode_wav, lambda: make_wav(500, 8000, seed=1), b"RIFF"),
    ("mp4", _parse_mp4, lambda: make_mp4(32, 24, 10, seed=1), None),
]


@pytest.mark.parametrize("name,decoder,make,magic", CASES, ids=[c[0] for c in CASES])
def test_magic_prefixed_noise_rejected(name, decoder, make, magic):
    rng = np.random.default_rng(7)
    prefix = magic if magic is not None else bytes(make()[:8])
    for _ in range(40):
        noise = prefix + rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
        _must_reject_or_decode(decoder, noise)


@pytest.mark.parametrize("name,decoder,make,magic", CASES, ids=[c[0] for c in CASES])
def test_truncations_never_crash(name, decoder, make, magic):
    valid = make()
    # every prefix length in a coarse sweep + the final 32 byte-by-byte
    cuts = list(range(0, len(valid), max(1, len(valid) // 64)))
    cuts += list(range(max(0, len(valid) - 32), len(valid)))
    for cut in cuts:
        _must_reject_or_decode(decoder, valid[:cut])


@pytest.mark.parametrize("name,decoder,make,magic", CASES, ids=[c[0] for c in CASES])
def test_single_byte_corruptions_never_crash(name, decoder, make, magic):
    """EVERY byte position gets one deterministic flip (plus 0x00 and
    0xFF at a coarser stride) — the r06 code review found KeyError /
    ZeroDivisionError escapes at ~1% of positions that a 120-sample
    spot check missed, so this sweep is exhaustive by position.
    Corrupting a dimension byte may legally produce a huge-but-valid
    header the decoder rejects via its own size cap — also fine; what
    this guards is the ERROR TYPE contract, not rejection of every
    corruption (some flips hit don't-care bytes and still decode)."""
    valid = bytearray(make())
    for pos in range(len(valid)):
        old = valid[pos]
        valid[pos] = (old ^ (37 + 131 * pos)) & 0xFF
        _must_reject_or_decode(decoder, bytes(valid))
        valid[pos] = old
    for pos in range(0, len(valid), 7):
        old = valid[pos]
        for flip in (0x00, 0xFF):
            valid[pos] = flip
            _must_reject_or_decode(decoder, bytes(valid))
        valid[pos] = old


def test_jpeg_entropy_truncation_raises_not_silent():
    """r06 ADVICE: a JPEG whose entropy segment is truncated inside the
    final MCU's magnitude bits must raise ValueError, not decode silently
    wrong pixels from phantom padding.  read_bits now enforces the same
    16-phantom-bit allowance as _read_huff; dropping >=2 entropy bytes
    always exceeds it (a 1-byte cut can land inside the legitimate
    final-byte padding allowance and is allowed to decode)."""
    data = make_jpeg(64, 64, seed=7)
    assert data.endswith(b"\xff\xd9")
    body, eoi = data[:-2], data[-2:]
    _decode_jpeg(data)  # sanity: the untruncated payload decodes
    for cut in range(2, 12):
        with pytest.raises(ValueError):
            _decode_jpeg(body[:-cut] + eoi)


def test_real_decode_row_division_levels():
    """_real_decode_row divides by WAV sample rate and MP4 timescale one
    level above the parsers — corrupt zeros there must already have been
    rejected below (ValueError), never ZeroDivisionError here."""
    import struct

    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        _real_decode_row,
    )

    wav = bytearray(make_wav(100, 8000, seed=2))
    at = wav.find(b"fmt ") + 8 + 4  # sample-rate field of the fmt chunk
    struct.pack_into("<I", wav, at, 0)
    with pytest.raises(ValueError, match="sample_rate"):
        _real_decode_row("audio", bytes(wav))

    mp4 = bytearray(make_mp4(32, 24, 10, seed=2))
    at = mp4.find(b"mvhd") + 4 + 12  # v0 mvhd timescale field
    struct.pack_into(">I", mp4, at, 0)
    with pytest.raises(ValueError, match="timescale"):
        _real_decode_row("video", bytes(mp4))


def test_jpeg_phantom_window_math_is_all_ones_past_end():
    """r07 second-review regression pin: the inline 48-bit window fetch
    (multimodal.py MCU loop: sdata = seg + 8*0xFF, window =
    (chunk >> (32-off)) & 0xFFFF) must yield phantom-1 bits for every
    position the truncation allowance permits — pos up to send+16.
    With the buggy 6-byte pad, a fetch starting 8-16 bits past the end
    took a SHORT slice whose high bits read as zeros, letting a
    spurious all-zero-prefix Huffman code match instead of the
    documented truncation error."""
    seg = b"\x00\xa5"  # 16 real bits: 00000000 10100101
    sdata = seg + b"\xff" * 8  # the shipped pad
    send = len(seg) * 8
    real_bits = "".join(f"{b:08b}" for b in seg)
    for pos in range(0, send + 17):  # every position the check permits
        byte0 = pos >> 3
        off = pos & 7
        chunk = int.from_bytes(sdata[byte0 : byte0 + 6], "big")
        window = (chunk >> (32 - off)) & 0xFFFF
        expect = int(
            "".join(
                real_bits[i] if i < send else "1" for i in range(pos, pos + 16)
            ),
            2,
        )
        assert window == expect, (pos, bin(window), bin(expect))
