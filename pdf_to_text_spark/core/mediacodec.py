"""Pure-Python media codecs for the multimodal tier.

The container ships no PIL/ffmpeg, but two real formats are fully
decodable with the standard library alone, which upgrades the
multimodal tier's decode step from "deterministic fake" to REAL for:

- **PNG** (non-interlaced, 8-bit gray / gray+alpha / RGB / RGBA — the
  shapes our own encoder and most screenshot/render pipelines emit):
  chunk walk, zlib inflate, all five scanline filters (None/Sub/Up/
  Average/Paeth) inverted per the PNG spec.
- **WAV** (RIFF PCM16): header walk + struct-unpacked samples.

JPEG has its own real baseline codec in ``core.jpegcodec`` (pure
Python + numpy Huffman/DCT). Only MP4 stays honestly faked in
operators/multimodal.py (an ISOBMFF+H.264 stack is out of scope). The
encoders exist so fixtures are self-generated — no external data.
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype → samples/pixel


class MediaError(ValueError):
    """Malformed/unsupported media payload (row-level tolerance)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, raw pixel bytes, row-major,
    channel-interleaved). Raises MediaError on malformed/unsupported."""
    if data[:8] != _PNG_MAGIC:
        raise MediaError("not a png")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise MediaError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or len(ihdr) < 13:
        raise MediaError("no IHDR")
    w, h, depth, colortype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise MediaError(f"unsupported png (depth={depth} color={colortype} interlace={interlace})")
    ch = _CHANNELS[colortype]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaError(f"idat inflate failed: {e}") from e
    if len(raw) != (stride + 1) * h:
        raise MediaError("pixel payload size mismatch")
    out = bytearray(stride * h)
    prev = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise MediaError(f"bad filter {f}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return w, h, ch, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(w: int, h: int, channels: int, pixels: bytes, row_filter: int = 0) -> bytes:
    """Minimal PNG writer (fixture generator). ``row_filter`` applies
    the SAME filter to every scanline — exercising each decoder
    unfilter path in tests (forward filter here, inverse in decode)."""
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    if len(pixels) != stride * h:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    if row_filter == 0:
        # identity filter: no per-byte work — just interleave the
        # filter-type byte per scanline (hot path for rasterized pages)
        for y in range(h):
            raw.append(0)
            raw += pixels[y * stride : (y + 1) * stride]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
        return (
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
    prev = bytearray(stride)
    for y in range(h):
        row = bytearray(pixels[y * stride : (y + 1) * stride])
        filt = bytearray(stride)
        for i in range(stride):
            left = row[i - channels] if i >= channels else 0
            ul = prev[i - channels] if i >= channels else 0
            # row_filter == 0 returned via the fast path above
            if row_filter == 1:
                v = row[i] - left
            elif row_filter == 2:
                v = row[i] - prev[i]
            elif row_filter == 3:
                v = row[i] - ((left + prev[i]) >> 1)
            elif row_filter == 4:
                v = row[i] - _paeth(left, prev[i], ul)
            else:
                raise ValueError(f"bad filter {row_filter}")
            filt[i] = v & 0xFF
        raw.append(row_filter)
        raw += filt
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def gray_thumbnail(w: int, h: int, ch: int, pixels: bytes, dim: int = 4) -> list[float]:
    """Nearest-pixel-free REAL downsample: mean luma over a dim×dim
    grid of cells → length dim² feature vector in [0, 255]. The image
    analog of a document embedding — feeds the cosine near-dup tier."""
    out: list[float] = []
    for cy in range(dim):
        y0, y1 = (h * cy) // dim, max((h * (cy + 1)) // dim, (h * cy) // dim + 1)
        for cx in range(dim):
            x0, x1 = (w * cx) // dim, max((w * (cx + 1)) // dim, (w * cx) // dim + 1)
            acc = n = 0
            for y in range(y0, min(y1, h)):
                base = y * w * ch
                for x in range(x0, min(x1, w)):
                    px = base + x * ch
                    if ch >= 3:
                        # integer BT.601-ish luma, deterministic
                        acc += (299 * pixels[px] + 587 * pixels[px + 1] + 114 * pixels[px + 2]) // 1000
                    else:
                        acc += pixels[px]
                    n += 1
            out.append(acc / n if n else 0.0)
    return out


def decode_wav(data: bytes) -> tuple[int, int, int, float, float]:
    """RIFF PCM16 WAV → (channels, sample_rate, n_samples, duration_s,
    rms). Raises MediaError on malformed/unsupported."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaError("not a wav")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            samples = body
        pos += 8 + length + (length & 1)
    if fmt is None or samples is None or len(fmt) < 16:
        raise MediaError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise MediaError(f"unsupported wav (fmt={audio_fmt} bits={bits})")
    n = len(samples) // 2
    if n == 0:
        return n_ch, rate, 0, 0.0, 0.0
    vals = struct.unpack(f"<{n}h", samples[: n * 2])
    rms = (sum(v * v for v in vals) / n) ** 0.5
    frames = n // max(n_ch, 1)
    return n_ch, rate, n, frames / rate if rate else 0.0, rms


def encode_wav(rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Minimal PCM16 WAV writer (fixture generator)."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
