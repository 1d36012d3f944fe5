"""H.264 / AVC (ITU-T Rec. H.264, ISO/IEC 14496-10) — I_PCM intra decode.

Closes the multimodal tier's last disclosed stub (NAL → pixels) for the
subset of the public spec that is tractable and externally verifiable in
pure Python: **I_PCM macroblocks** — the spec's uncompressed-macroblock
escape (§7.3.5, mb_type 25 in I slices), in which the bitstream carries
raw 8-bit 4:2:0 samples after a byte alignment. The syntax layers above
the macroblock are decoded for real from the published spec:

- NAL units: Annex-B start codes AND AVCC 4-byte length prefixes (§B.1,
  §7.4.1); emulation-prevention 0x03 stripping (§7.4.1.1)
- Exp-Golomb ue(v)/se(v) (§9.1) — pinned against the spec's own code
  tables in the tests
- SPS (§7.3.2.1, incl. the high-profile chroma/bit-depth branch and
  frame cropping), PPS (§7.3.2.2), slice header (§7.3.3) for I/IDR
  slices, multi-slice pictures via first_mb_in_slice

The honest boundary (raised as a disclosed ``MediaError``): predicted /
transform-coded macroblocks need CAVLC residual decoding + intra
prediction + deblocking, and CABAC needs the spec's arithmetic-coder
state tables — the same cannot-validate-offline class as JPEG's QM
coder (see core/jpegcodec.py), so they stay out of the subset rather
than shipping a self-consistent-only implementation.

Reference parity: the reference repo does not decode video at all (its
scope is PDF/image OCR); this tier exists for the 100 TB training-data
pipeline axis (frame sampling for multimodal corpora). Generator side
(``encode_ipcm_annexb``) writes the bitstream with its own bit-writer so
encoder and decoder share only the public syntax, not lookup tables.
"""

from __future__ import annotations

import numpy as np

from pdf_to_text_spark.core.mediacodec import MediaError

# profiles whose SPS carries the chroma_format/bit_depth extension
_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an RBSP byte string."""

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise MediaError("bitstream truncated")
            bit = (self.data[byte] >> (7 - (self.bitpos & 7))) & 1
            v = (v << 1) | bit
            self.bitpos += 1
        return v

    def ue(self) -> int:
        lead = 0
        while True:
            if self.u(1):
                break
            lead += 1
            if lead > 32:
                raise MediaError("invalid exp-Golomb code")
        return (1 << lead) - 1 + (self.u(lead) if lead else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit* — each must be 0 (§7.3.5)."""
        while self.bitpos & 7:
            if self.u(1):
                raise MediaError("nonzero pcm_alignment bit")

    def read_bytes(self, n: int) -> bytes:
        if self.bitpos & 7:
            raise MediaError("byte read while unaligned")
        start = self.bitpos >> 3
        if start + n > len(self.data):
            raise MediaError("bitstream truncated in PCM samples")
        self.bitpos += 8 * n
        return self.data[start : start + n]

    def more_rbsp_data(self) -> bool:
        """True unless only rbsp_trailing_bits remain (§7.2): the last
        1-bit in the RBSP is the stop bit; data remains iff the current
        position is strictly before it."""
        for byte in range(len(self.data) - 1, -1, -1):
            b = self.data[byte]
            if b:
                low = b & -b  # lowest set bit
                stop_bitpos = byte * 8 + 7 - low.bit_length() + 1
                return self.bitpos < stop_bitpos
        return False


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def write_bytes(self, data: bytes) -> None:
        assert len(self.bits) & 7 == 0
        for b in data:
            self.u(b, 8)

    def trailing_bits(self) -> None:
        self.bits.append(1)
        self.align_zero()

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            chunk = self.bits[i : i + 8]
            byte = 0
            for bit in chunk:
                byte = (byte << 1) | bit
            out.append(byte << (8 - len(chunk)))  # left-align a partial tail
        return bytes(out)


# ---------------------------------------------------------------------------
# NAL layer
# ---------------------------------------------------------------------------


def _strip_emulation(data: bytes) -> bytes:
    """EBSP → RBSP: drop the 0x03 in 00 00 03 0x (§7.4.1.1)."""
    if b"\x00\x00\x03" not in data:
        return data
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
            out += data[i : i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _insert_emulation(rbsp: bytes) -> bytes:
    """RBSP → EBSP: escape 00 00 {00,01,02,03} with an 0x03 byte."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _try_avcc(data: bytes) -> list[bytes] | None:
    """Strict AVCC walk: 4-byte length prefixes must exactly tile the
    buffer and every NAL header must be plausible; None on mismatch."""
    nals: list[bytes] = []
    pos = 0
    while pos < len(data):
        if pos + 4 > len(data):
            return None
        ln = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        if ln == 0 or pos + ln > len(data):
            return None
        nal = data[pos : pos + ln]
        if nal[0] & 0x80 or not (nal[0] & 0x1F):
            return None
        nals.append(nal)
        pos += ln
    return nals or None


def split_nal_units(data: bytes) -> list[tuple[int, bytes]]:
    """Split an Annex-B or AVCC-length-prefixed stream into
    ``(nal_unit_type, rbsp)`` pairs. The two framings are signalled out
    of band in real containers; here a leading start code selects
    Annex-B (an AVCC stream cannot begin with a legal 1-byte NAL, so
    ``00 00 00 01`` is unambiguous), anything else takes a strict
    length-prefix walk (must tile the buffer exactly); a mismatch is a
    disclosed MediaError, never silent data."""
    if not data:
        raise MediaError("empty H.264 payload")
    leading = data.startswith(b"\x00\x00\x01") or data.startswith(b"\x00\x00\x00\x01")
    nals = None if leading else _try_avcc(data)
    if nals is None:
        # Annex-B: split on 00 00 01 (with optional extra leading zeros)
        if data.find(b"\x00\x00\x01") == -1:
            raise MediaError("payload is neither AVCC nor Annex-B framed")
        nals = []
        i = data.find(b"\x00\x00\x01")
        while i != -1:
            start = i + 3
            nxt = data.find(b"\x00\x00\x01", start)
            end = len(data) if nxt == -1 else nxt
            chunk = data[start:end].rstrip(b"\x00") if nxt != -1 else data[start:end]
            if chunk:
                nals.append(chunk)
            i = nxt
    out = []
    for nal in nals:
        hdr = nal[0]
        if hdr & 0x80:
            raise MediaError("forbidden_zero_bit set in NAL header")
        out.append((hdr & 0x1F, _strip_emulation(nal[1:])))
    if not out:
        raise MediaError("no NAL units found")
    return out


# ---------------------------------------------------------------------------
# parameter sets
# ---------------------------------------------------------------------------


def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    if profile in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        if r.ue() or r.ue():  # bit_depth_{luma,chroma}_minus8
            raise MediaError("only 8-bit depth in subset")
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):
            raise MediaError("seq_scaling_matrix not in subset")
    if chroma_format_idc != 1:
        raise MediaError(f"chroma_format_idc {chroma_format_idc}: only 4:2:0 in subset")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_poc_always_zero = False
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_poc_always_zero = bool(r.u(1))
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise MediaError("interlaced (field) coding not in subset")
    r.u(1)  # direct_8x8_inference_flag
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # left right top bottom
    # CropUnitX = 2, CropUnitY = 2 for 4:2:0 frame_mbs_only (§7.4.2.1.1)
    width = w_mbs * 16 - 2 * (crop[0] + crop[1])
    height = h_map_units * 16 - 2 * (crop[2] + crop[3])
    if width <= 0 or height <= 0:
        raise MediaError("cropping exceeds coded size")
    return {
        "sps_id": sps_id,
        "profile": profile,
        "level": level,
        "mb_width": w_mbs,
        "mb_height": h_map_units,
        "crop": crop,
        "width": width,
        "height": height,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "delta_poc_always_zero": delta_poc_always_zero,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    cabac = bool(r.u(1))
    bottom_field_poc = bool(r.u(1))
    if r.ue():  # num_slice_groups_minus1
        raise MediaError("slice groups (FMO) not in subset")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    r.se()  # pic_init_qp_minus26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    deblock_present = bool(r.u(1))
    r.u(1)  # constrained_intra_pred_flag
    redundant_present = bool(r.u(1))
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "cabac": cabac,
        "bottom_field_poc": bottom_field_poc,
        "deblock_present": deblock_present,
        "redundant_present": redundant_present,
    }


# ---------------------------------------------------------------------------
# slice + macroblock layer (I_PCM subset)
# ---------------------------------------------------------------------------


def _decode_slice(
    rbsp: bytes, nal_type: int, sps_by_id: dict, pps_by_id: dict,
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, covered: set,
) -> None:
    r = _BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise MediaError(
            f"slice_type {slice_type}: only I slices in the I_PCM subset "
            "(P/B prediction requires reference-frame motion compensation)"
        )
    pps = pps_by_id.get(r.ue())
    if pps is None:
        raise MediaError("slice references missing PPS")
    if pps["cabac"]:
        raise MediaError(
            "CABAC entropy coding not in subset (arithmetic-coder state "
            "tables are not externally validatable offline; same closure "
            "as arithmetic JPEG)"
        )
    sps = sps_by_id.get(pps["sps_id"])
    if sps is None:
        raise MediaError("PPS references missing SPS")
    r.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    elif sps["poc_type"] == 1 and not sps["delta_poc_always_zero"]:
        r.se()
        if pps["bottom_field_poc"]:
            r.se()
    if pps["redundant_present"]:
        r.ue()
    if nal_type == 5:
        r.u(1)  # no_output_of_prior_pics_flag
        r.u(1)  # long_term_reference_flag
    else:
        # non-IDR I slice in a reference picture
        if r.u(1):
            raise MediaError("adaptive ref-pic marking not in subset")
    r.se()  # slice_qp_delta
    if pps["deblock_present"]:
        if r.ue() != 1:
            r.se()
            r.se()

    mb_w, mb_h = sps["mb_width"], sps["mb_height"]
    total = mb_w * mb_h
    addr = first_mb
    while r.more_rbsp_data():
        if addr >= total:
            raise MediaError("macroblock address beyond picture")
        mb_type = r.ue()
        if mb_type != 25:
            raise MediaError(
                f"mb_type {mb_type}: only I_PCM macroblocks in subset "
                "(CAVLC residual + intra prediction out of scope)"
            )
        r.align_zero()
        luma = np.frombuffer(r.read_bytes(256), np.uint8).reshape(16, 16)
        cbb = np.frombuffer(r.read_bytes(64), np.uint8).reshape(8, 8)
        crb = np.frombuffer(r.read_bytes(64), np.uint8).reshape(8, 8)
        my, mx = divmod(addr, mb_w)
        y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = luma
        cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cbb
        cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = crb
        covered.add(addr)
        addr += 1


def decode_ipcm_frame(data: bytes) -> dict:
    """Decode one I_PCM-coded access unit (SPS+PPS+I/IDR slices, in-band)
    to pixel planes.

    Returns ``{"width", "height", "y", "cb", "cr"}`` with ``y`` a
    ``(height, width) uint8`` array and ``cb``/``cr`` the half-resolution
    4:2:0 chroma planes. Raises ``MediaError`` (with the boundary named)
    for anything outside the I_PCM subset.
    """
    sps_by_id: dict = {}
    pps_by_id: dict = {}
    planes = None
    covered: set = set()
    sps_used = None
    for nal_type, rbsp in split_nal_units(data):
        if nal_type == 7:
            s = parse_sps(rbsp)
            sps_by_id[s["sps_id"]] = s
        elif nal_type == 8:
            p = parse_pps(rbsp)
            pps_by_id[p["pps_id"]] = p
        elif nal_type in (1, 5):
            if planes is None:
                if not sps_by_id:
                    raise MediaError("slice before SPS (no in-band parameter sets)")
                sps_used = next(iter(sps_by_id.values()))
                mb_w, mb_h = sps_used["mb_width"], sps_used["mb_height"]
                planes = (
                    np.zeros((mb_h * 16, mb_w * 16), np.uint8),
                    np.zeros((mb_h * 8, mb_w * 8), np.uint8),
                    np.zeros((mb_h * 8, mb_w * 8), np.uint8),
                )
            _decode_slice(rbsp, nal_type, sps_by_id, pps_by_id, *planes, covered)
        # other NAL types (SEI, AUD, filler) are legal and skipped
    if planes is None:
        raise MediaError("no slice NAL in payload")
    total = sps_used["mb_width"] * sps_used["mb_height"]
    if len(covered) != total:
        raise MediaError(f"picture incomplete: {len(covered)}/{total} macroblocks")
    left, _right, top, _bottom = sps_used["crop"]
    w, h = sps_used["width"], sps_used["height"]
    y = planes[0][2 * top : 2 * top + h, 2 * left : 2 * left + w]
    cb = planes[1][top : top + h // 2 + h % 2, left : left + w // 2 + w % 2]
    cr = planes[2][top : top + h // 2 + h % 2, left : left + w // 2 + w % 2]
    return {"width": w, "height": h, "y": y.copy(), "cb": cb.copy(), "cr": cr.copy()}


# ---------------------------------------------------------------------------
# encoder (generator side — own bit-writer, shares only the public syntax)
# ---------------------------------------------------------------------------


def _encode_sps(mb_w: int, mb_h: int, crop: tuple[int, int, int, int]) -> bytes:
    w = _BitWriter()
    w.u(66, 8)   # profile_idc: Baseline
    w.u(0, 8)    # constraint flags
    w.u(20, 8)   # level_idc 2.0
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # pic_order_cnt_type 2 (no POC bits in slice header)
    w.ue(1)      # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num_value_allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)    # frame_mbs_only_flag
    w.u(1, 1)    # direct_8x8_inference_flag
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)    # vui_parameters_present
    w.trailing_bits()
    return w.tobytes()


def _encode_pps() -> bytes:
    w = _BitWriter()
    w.ue(0)      # pps_id
    w.ue(0)      # sps_id
    w.u(0, 1)    # entropy_coding_mode: CAVLC
    w.u(0, 1)    # bottom_field_pic_order_in_frame_present
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_default_active_minus1
    w.ue(0)      # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)    # weighted_pred_flag
    w.u(0, 2)    # weighted_bipred_idc
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(0, 1)    # deblocking_filter_control_present
    w.u(0, 1)    # constrained_intra_pred
    w.u(0, 1)    # redundant_pic_cnt_present
    w.trailing_bits()
    return w.tobytes()


def _encode_idr_slice(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
    mb_w: int, first_mb: int, mb_count: int,
) -> bytes:
    w = _BitWriter()
    w.ue(first_mb)
    w.ue(7)      # slice_type: I (all slices of this picture are I)
    w.ue(0)      # pps_id
    w.u(0, 4)    # frame_num (log2_max_frame_num = 4)
    w.ue(0)      # idr_pic_id
    w.u(0, 1)    # no_output_of_prior_pics
    w.u(0, 1)    # long_term_reference
    w.se(0)      # slice_qp_delta
    for addr in range(first_mb, first_mb + mb_count):
        my, mx = divmod(addr, mb_w)
        w.ue(25)  # mb_type: I_PCM
        w.align_zero()
        w.write_bytes(y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
        w.write_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
        w.write_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
    w.trailing_bits()
    return w.tobytes()


def _pad_to_mb(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_ipcm(
    frame, slices: int = 1, length_prefixed: bool = False
) -> bytes:
    """Encode one frame as an I_PCM-only IDR access unit with in-band
    SPS+PPS.

    ``frame``: a ``(h, w) uint8`` grayscale array (chroma set neutral)
    or a ``(y, cb, cr)`` tuple of 4:2:0 planes. Non-multiple-of-16 sizes
    are edge-padded and signalled via SPS frame cropping. ``slices``
    splits the picture into that many slice NALs (multi-slice decode
    coverage). ``length_prefixed`` emits AVCC 4-byte length prefixes
    (the MP4 sample shape) instead of Annex-B start codes.
    """
    if isinstance(frame, tuple):
        y, cb, cr = (np.asarray(p, np.uint8) for p in frame)
    else:
        y = np.asarray(frame, np.uint8)
        if y.ndim != 2:
            raise MediaError("grayscale frame must be 2-D")
        cb = np.full(((y.shape[0] + 1) // 2, (y.shape[1] + 1) // 2), 128, np.uint8)
        cr = cb.copy()
    h, w = y.shape
    yp = _pad_to_mb(y, 16)
    cbp = _pad_to_mb(cb, 8)
    crp = _pad_to_mb(cr, 8)
    mb_w, mb_h = yp.shape[1] // 16, yp.shape[0] // 16
    if cbp.shape != (mb_h * 8, mb_w * 8):
        raise MediaError("chroma planes are not 4:2:0 for the luma size")
    crop_right = (yp.shape[1] - w) // 2
    crop_bottom = (yp.shape[0] - h) // 2
    if (yp.shape[1] - w) % 2 or (yp.shape[0] - h) % 2:
        raise MediaError("odd frame sizes not representable in 4:2:0 cropping")
    nals = [_encode_sps(mb_w, mb_h, (0, crop_right, 0, crop_bottom)), _encode_pps()]
    total = mb_w * mb_h
    n_slices = max(1, min(slices, total))
    per = (total + n_slices - 1) // n_slices
    first = 0
    while first < total:
        count = min(per, total - first)
        nals.append(_encode_idr_slice(yp, cbp, crp, mb_w, first, count))
        first += count
    out = bytearray()
    for i, rbsp in enumerate(nals):
        # nal_ref_idc=3 for SPS/PPS/IDR; types 7, 8, then 5
        hdr = bytes([(0x67, 0x68)[i] if i < 2 else 0x65])
        ebsp = hdr + _insert_emulation(rbsp)
        if length_prefixed:
            out += len(ebsp).to_bytes(4, "big") + ebsp
        else:
            out += b"\x00\x00\x00\x01" + ebsp
    return bytes(out)
