"""H.264 I_PCM subset codec (core/h264.py): spec-pinned syntax vectors,
encode→decode roundtrips, framing detection, and the disclosed
out-of-subset boundaries.

The exp-Golomb vectors are hand-pinned from the published code table
(ITU-T H.264 §9.1, Table 9-1) so the decoder is checked against the
SPEC, not against the repo's own encoder (the independent-sides rule).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_spark.core.h264 import (
    _BitReader,
    _BitWriter,
    _insert_emulation,
    _strip_emulation,
    decode_ipcm_frame,
    encode_ipcm,
    parse_pps,
    parse_sps,
    split_nal_units,
)
from pdf_to_text_spark.core.mediacodec import MediaError


def _bits(s: str) -> bytes:
    """'1 010 011' → padded bytes (left-aligned, zero-padded)."""
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


# --------------------------------------------------------------------------
# §9.1 Table 9-1: ue(v) bit strings 1, 010, 011, 00100, 00101, 00110,
# 00111, 0001000 → codeNum 0..7.  se(v) mapping (Table 9-3):
# codeNum 0,1,2,3,4 → 0, 1, −1, 2, −2.
# --------------------------------------------------------------------------


def test_exp_golomb_ue_spec_table():
    r = _BitReader(_bits("1 010 011 00100 00101 00110 00111 0001000"))
    assert [r.ue() for _ in range(8)] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_exp_golomb_se_spec_table():
    r = _BitReader(_bits("1 010 011 00100 00101"))
    assert [r.se() for _ in range(5)] == [0, 1, -1, 2, -2]


def test_bitwriter_matches_spec_strings():
    w = _BitWriter()
    for v in range(8):
        w.ue(v)
    assert w.tobytes() == _bits("1 010 011 00100 00101 00110 00111 0001000")
    w = _BitWriter()
    for v in (0, 1, -1, 2, -2):
        w.se(v)
    assert w.tobytes() == _bits("1 010 011 00100 00101")


def test_emulation_prevention_spec_patterns():
    # §7.4.1.1: 00 00 00 / 00 00 01 / 00 00 02 / 00 00 03 are escaped
    for tail in (0, 1, 2, 3):
        rbsp = b"\x00\x00" + bytes([tail]) + b"\xaa"
        ebsp = _insert_emulation(rbsp)
        assert ebsp == b"\x00\x00\x03" + bytes([tail]) + b"\xaa"
        assert _strip_emulation(ebsp) == rbsp
    # 00 00 04 needs no escape
    assert _insert_emulation(b"\x00\x00\x04") == b"\x00\x00\x04"


# --------------------------------------------------------------------------
# roundtrips
# --------------------------------------------------------------------------


def _rand(h, w, seed=11):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@pytest.mark.parametrize("length_prefixed", [False, True])
@pytest.mark.parametrize("slices", [1, 2, 5])
def test_gray_roundtrip(length_prefixed, slices):
    f = _rand(32, 48)
    out = decode_ipcm_frame(
        encode_ipcm(f, slices=slices, length_prefixed=length_prefixed)
    )
    assert (out["width"], out["height"]) == (48, 32)
    assert (out["y"] == f).all()
    assert (out["cb"] == 128).all() and (out["cr"] == 128).all()


def test_yuv_roundtrip_cropped():
    """Non-multiple-of-16 frame → SPS frame cropping carries the size."""
    y, cb, cr = _rand(30, 44, 1), _rand(15, 22, 2), _rand(15, 22, 3)
    out = decode_ipcm_frame(encode_ipcm((y, cb, cr), slices=3))
    assert (out["width"], out["height"]) == (44, 30)
    assert (out["y"] == y).all() and (out["cb"] == cb).all() and (out["cr"] == cr).all()


def test_all_zero_frame_forces_emulation_escapes():
    stream = encode_ipcm(np.zeros((16, 32), np.uint8))
    assert b"\x00\x00\x03" in stream  # escapes actually present
    assert (decode_ipcm_frame(stream)["y"] == 0).all()


def test_sps_pps_fields():
    nals = split_nal_units(encode_ipcm(_rand(30, 44)))
    types = [t for t, _ in nals]
    assert types == [7, 8, 5]
    sps = parse_sps(nals[0][1])
    assert (sps["width"], sps["height"]) == (44, 30)
    assert (sps["mb_width"], sps["mb_height"]) == (3, 2)
    assert sps["crop"] == (0, 2, 0, 1)  # chroma crop units (×2 in luma)
    pps = parse_pps(nals[1][1])
    assert pps["cabac"] is False and pps["deblock_present"] is False


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(2, 40).map(lambda v: v * 2),
    h=st.integers(2, 40).map(lambda v: v * 2),
    slices=st.integers(1, 4),
    lp=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_property_roundtrip(w, h, slices, lp, seed):
    f = _rand(h, w, seed)
    out = decode_ipcm_frame(encode_ipcm(f, slices=slices, length_prefixed=lp))
    assert (out["y"] == f).all()


# --------------------------------------------------------------------------
# disclosed boundaries
# --------------------------------------------------------------------------


def _flip_mb_type(stream: bytes) -> bytes:
    """Re-encode the slice with mb_type 0 (I_4x4) instead of 25."""
    f = np.zeros((16, 16), np.uint8)
    good = encode_ipcm(f)
    nals = split_nal_units(good)
    # hand-build a slice whose first mb_type is I_4x4 (ue(0) = '1')
    w = _BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type I
    w.ue(0)   # pps_id
    w.u(0, 4)  # frame_num
    w.ue(0)   # idr_pic_id
    w.u(0, 2)  # dec_ref_pic_marking
    w.se(0)   # slice_qp_delta
    w.ue(0)   # mb_type I_4x4  ← out of subset
    w.trailing_bits()
    sps, pps = nals[0][1], nals[1][1]
    out = b""
    for hdr, rbsp in ((b"\x67", sps), (b"\x68", pps), (b"\x65", w.tobytes())):
        out += b"\x00\x00\x00\x01" + hdr + _insert_emulation(rbsp)
    return out


def test_non_ipcm_macroblock_is_disclosed_error():
    with pytest.raises(MediaError, match="I_PCM"):
        decode_ipcm_frame(_flip_mb_type(b""))


def test_cabac_pps_is_disclosed_error():
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode = CABAC
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.trailing_bits()
    cabac_pps = w.tobytes()
    good = split_nal_units(encode_ipcm(np.zeros((16, 16), np.uint8)))
    out = b""
    for hdr, rbsp in (
        (b"\x67", good[0][1]), (b"\x68", cabac_pps), (b"\x65", good[2][1])
    ):
        out += b"\x00\x00\x00\x01" + hdr + _insert_emulation(rbsp)
    with pytest.raises(MediaError, match="CABAC"):
        decode_ipcm_frame(out)


def test_truncated_and_malformed_are_errors():
    stream = encode_ipcm(_rand(16, 16))
    with pytest.raises(MediaError):
        decode_ipcm_frame(stream[: len(stream) // 2])
    with pytest.raises(MediaError):
        decode_ipcm_frame(b"\xffnot a bitstream")
    with pytest.raises(MediaError):
        decode_ipcm_frame(b"")


def test_missing_slice_and_missing_sps_are_errors():
    nals = split_nal_units(encode_ipcm(_rand(16, 16)))
    sps_only = b"\x00\x00\x00\x01\x67" + _insert_emulation(nals[0][1])
    with pytest.raises(MediaError, match="no slice"):
        decode_ipcm_frame(sps_only)
    slice_only = b"\x00\x00\x00\x01\x65" + _insert_emulation(nals[2][1])
    with pytest.raises(MediaError, match="SPS"):
        decode_ipcm_frame(slice_only)


def test_incomplete_picture_is_error():
    """Drop the second of two slices → macroblock coverage check fires."""
    stream = encode_ipcm(_rand(16, 32), slices=2)
    nals = split_nal_units(stream)
    assert len(nals) == 4  # sps pps slice slice
    out = b""
    for hdr_type, rbsp in nals[:3]:
        hdr = {7: b"\x67", 8: b"\x68", 5: b"\x65"}[hdr_type]
        out += b"\x00\x00\x00\x01" + hdr + _insert_emulation(rbsp)
    with pytest.raises(MediaError, match="incomplete"):
        decode_ipcm_frame(out)
