"""Baseline JPEG codec (ITU-T T.81 subset), pure Python + numpy.

Upgrades the multimodal tier's JPEG path from "deterministic fake" to
REAL (`/root/reference` reads JPEGs via cv2/PIL, e.g.
``2_OpenCV_OCR/utils_list_images.py:5``; this container ships neither,
so the codec is implemented from the public spec):

- **decoder**: baseline sequential DCT (SOF0) — segment walk, DQT/DHT/
  DRI honored, Huffman entropy decode with byte unstuffing and restart
  markers, dequantize → IDCT (numpy), grayscale or YCbCr with ANY
  sampling factors (nearest-neighbor upsample), JFIF YCbCr→RGB.
  Progressive (SOF2) / arithmetic / 12-bit raise ``MediaError`` —
  honest subset, same row-level-tolerance contract as ``decode_png``.
- **encoder**: minimal baseline writer so fixtures are self-generated
  (no external data): grayscale or RGB (4:4:4), Annex-K quant tables
  scaled by the libjpeg quality formula, one DC + one AC Huffman table
  shared by all components.

Pixel contract matches ``mediacodec.decode_png``: (width, height,
channels, row-major channel-interleaved bytes).
"""

from __future__ import annotations

import struct

import numpy as np

from pdf_to_text_spark.core.mediacodec import MediaError

# ---------------------------------------------------------------- constants

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 quantization tables (natural order)
QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]

# Annex K.3 standard luminance Huffman specs (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis: C[u, x] = a(u) cos((2x+1)u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ------------------------------------------------------------------ decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker (leaves ``self.marker`` set)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.bitbuf, self.nbits = 0, 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise MediaError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
                self.marker = nxt
                raise _Restart()
            else:
                self.marker = nxt
                raise MediaError("marker inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def consume_restart(self) -> None:
        """Skip to just past the next RST marker and realign."""
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.bitbuf, self.nbits, self.marker = 0, 0, None
                return
            self.pos += 1
        raise MediaError("missing restart marker")


class _Restart(Exception):
    pass


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise MediaError("bad huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s > 0 and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG bytes → (width, height, channels, row-major
    channel-interleaved pixel bytes). channels = 1 (grayscale) or 3
    (RGB after JFIF YCbCr conversion). Raises MediaError on
    malformed/unsupported (progressive, arithmetic, >8-bit)."""
    if data[:2] != b"\xff\xd8":
        raise MediaError("not a jpeg")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise MediaError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise MediaError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise MediaError("16-bit quant tables unsupported")
                t = np.zeros(64)
                for i in range(64):
                    t[ZIGZAG[i]] = body[p + 1 + i]
                qtables[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _canonical_codes(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise MediaError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaError("non-baseline jpeg (progressive/arithmetic) unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaError("SOS before SOF")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan, qtables, htables, restart_interval
            )
        pos += 2 + seglen
    raise MediaError("no scan data")


def _decode_scan(data, pos, frame, scan, qtables, htables, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)))
    pred = [0] * len(comps)
    br = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu and mcu % dri == 0:
                br.consume_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_t = htables.get((0, td))
                ac_t = htables.get((1, ta))
                q = qtables.get(c["tq"])
                if dc_t is None or ac_t is None or q is None:
                    raise MediaError("missing huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        try:
                            s = _decode_symbol(br, dc_t)
                            diff = _extend(br.receive(s), s)
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 0
                            while k < 63:
                                rs = _decode_symbol(br, ac_t)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if rs == 0xF0:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r + 1
                                if k > 63:
                                    raise MediaError("ac index overflow")
                                coef[ZIGZAG[k]] = _extend(br.receive(s), s)
                        except _Restart as e:  # stray RST = corrupt stream
                            raise MediaError("unexpected restart marker") from e
                        block = coef.reshape(8, 8) * q
                        px = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1
    # upsample each plane to full resolution (pixel replication), crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(comps) != 3:
        raise MediaError(f"unsupported component count {len(comps)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


def jpeg_dims(data: bytes) -> tuple[int, int, int]:
    """Header-only (width, height, channels) from any SOFn marker —
    the cheap metadata path (no entropy decode); works for progressive
    streams too. Raises MediaError when no frame header exists."""
    if data[:2] != b"\xff\xd8":
        raise MediaError("not a jpeg")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise MediaError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) < 6:
                raise MediaError("truncated SOF")
            h, w = struct.unpack(">HH", body[1:5])
            return w, h, body[5]
        if marker == 0xDA:
            break  # scan before any SOF = malformed
        pos += 2 + seglen
    raise MediaError("no SOF header")


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nacc = 0, 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nacc = 0, 0

    def flush(self) -> None:
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nacc = 0, 0


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _scaled_quant(quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.array(QUANT_LUM, dtype=np.int64)
    t = np.clip((t * scale + 50) // 100, 1, 255)
    return t.reshape(8, 8).astype(float)


def encode_jpeg(
    w: int, h: int, channels: int, pixels: bytes, quality: int = 90
) -> bytes:
    """Minimal baseline encoder: grayscale (1ch) or RGB (3ch, coded as
    YCbCr 4:4:4). One quant table (Annex-K luminance scaled by the
    libjpeg quality formula) and one DC+AC Huffman table pair shared by
    all components — a valid simplification the decoder round-trips."""
    if channels not in (1, 3):
        raise MediaError(f"unsupported channel count {channels}")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(float).reshape(h, w, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        planes = [arr[..., 0]]
    # pad to block multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]

    q = _scaled_quant(quality)
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    pred = [0] * channels
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, p in enumerate(planes):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _C @ block @ _C.T
                qc = np.round(coef / q).astype(int)
                zz = [int(qc.flat[ZIGZAG[i]]) for i in range(64)]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                s = _size_cat(diff)
                code, ln = dc_codes[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _size_cat(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qz = bytes([0]) + bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    sof_comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([channels]) + sof_comps
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    )
    dht2 = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([channels]) + b"".join(bytes([i + 1, 0x00]) for i in range(channels)) + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, qz)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xC4, dht2)
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )
