"""MP4/ISO-BMFF container metadata parsing (REAL video decode path).

Pure-Python roundtrips against the in-repo ``make_mp4`` encoder — no
Spark session needed — plus malformed-input rejection.  The Spark-side
integration (mapInPandas REAL decode over video assets) rides in
test_pipeline_ops::test_multimodal_real_decode_bmp_wav.
"""

import struct

import pytest

from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
    _mp4_boxes,
    _parse_mp4,
    make_mp4,
)


@pytest.mark.parametrize("v1", [False, True])
@pytest.mark.parametrize(
    "w,h,n,fps", [(320, 240, 75, 25), (1920, 1080, 1, 30), (16, 16, 240, 24)]
)
def test_roundtrip_dims_frames_duration(v1, w, h, n, fps):
    data = make_mp4(w, h, n, fps=fps, seed=7, v1=v1)
    pw, ph, pn, dur = _parse_mp4(data)
    assert (pw, ph, pn) == (w, h, n)
    # movie timescale is 1000 so duration_ms == floor(n*1000/fps)
    assert dur == float((n * 1000) // fps)


def test_deterministic_bytes():
    assert make_mp4(64, 48, 24, seed=5) == make_mp4(64, 48, 24, seed=5)
    assert make_mp4(64, 48, 24, seed=5) != make_mp4(64, 48, 24, seed=6)


def test_largesize_box_parses():
    # rewrite the mdat header as a 64-bit largesize box (size==1 +
    # 8-byte size after the type) — the walker must still land on moov
    data = make_mp4(32, 32, 10, seed=1)
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    mdat_len = struct.unpack_from(">I", data, ftyp_len)[0]
    patched = (
        data[:ftyp_len]
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", mdat_len + 8)
        + data[ftyp_len + 8 : ftyp_len + mdat_len]
        + data[ftyp_len + mdat_len :]
    )
    assert _parse_mp4(patched) == _parse_mp4(data)


def test_size_zero_box_runs_to_container_end():
    # a trailing free box with size==0 must consume exactly the rest
    data = make_mp4(32, 32, 10, seed=2) + struct.pack(">I", 0) + b"free" + b"\x00" * 5
    assert _parse_mp4(data)[2] == 10
    types = [t for t, _, _ in _mp4_boxes(data, 0, len(data))]
    assert types == [b"ftyp", b"mdat", b"moov", b"free"]


def test_rejects_garbage_truncation_and_overrun():
    data = make_mp4(32, 32, 10, seed=3)
    with pytest.raises(ValueError, match="missing ftyp"):
        _parse_mp4(b"\x00" * 64)
    with pytest.raises(ValueError, match="overruns"):
        _parse_mp4(data[:-10])  # cut inside the trailing moov box
    # moov stripped entirely
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    mdat_len = struct.unpack_from(">I", data, ftyp_len)[0]
    with pytest.raises(ValueError, match="missing moov"):
        _parse_mp4(data[: ftyp_len + mdat_len])


def test_rejects_fragmented_and_inconsistent_tables():
    data = make_mp4(32, 32, 10, seed=4)
    # replace moov type tag with moof -> explicit fragmented-MP4 raise
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    mdat_len = struct.unpack_from(">I", data, ftyp_len)[0]
    moov_at = ftyp_len + mdat_len
    frag = data[: moov_at + 4] + b"moof" + data[moov_at + 8 :]
    with pytest.raises(NotImplementedError, match="fragmented"):
        _parse_mp4(frag)
    # corrupt the stts run length -> stts/stsz cross-check must fire
    at = data.find(b"stts")
    bad = bytearray(data)
    struct.pack_into(">I", bad, at + 4 + 8, 11)  # sample_count 10 -> 11
    with pytest.raises(ValueError, match="stts sample total"):
        _parse_mp4(bytes(bad))


def test_audio_only_container_has_no_video_trak():
    # flip the hdlr handler type: a soun-only container is not video
    data = make_mp4(32, 32, 10, seed=5)
    bad = data.replace(b"vide", b"soun")
    with pytest.raises(ValueError, match="no video trak"):
        _parse_mp4(bad)
