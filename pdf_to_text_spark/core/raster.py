"""Deterministic page rasterizer + glyph OCR (M2 and a real M4 analog).

The reference renders PDF pages to images for OCR
(``/root/reference/1_pdf_to_image/convert_pdfs_pymupdf.py:18``
``page.get_pixmap``; ``core_document_processing.py:60-66``) and maps
pixels back to text with Tesseract (``ocr_engine.py:13-42``). The
container ships no font or OCR library, so the engine freezes its own
raster spec instead of faking the step:

- **Font**: a deterministic, injective 5x7 bitmap glyph per printable
  ASCII char — 35 bits drawn from ``md5("glyph:<ch>")``, space = blank
  cell, any md5 pattern that would collide with blank is nudged.
  Injectivity is asserted at import (95 distinct glyphs), which is the
  property OCR needs; human legibility is not (and is honestly not
  claimed).
- **Page**: fixed 64x48 character grid, 6x8 px cells (1 px inter-glyph
  gap), 8-bit grayscale, background 255 / ink 0, PNG-encoded by
  ``core.mediacodec.encode_png``.
- **OCR** (``ocr_png``): the exact inverse — threshold each cell's 35
  glyph bits and look the pattern up. Per real-OCR semantics the
  raster cannot distinguish trailing spaces / trailing blank lines
  from page margin, so recovered lines are right-stripped and trailing
  blank lines dropped; everything else round-trips bit-exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pdf_to_text_spark.core.mediacodec import decode_png, encode_png

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 8
PAGE_COLS, PAGE_ROWS = 64, 48


def _glyph_bits(ch: str) -> int:
    if ch == " ":
        return 0
    v = int.from_bytes(hashlib.md5(f"glyph:{ch}".encode()).digest()[:5], "big") >> 5
    return v if v else 1  # blank is reserved for space


GLYPHS: dict[str, int] = {chr(c): _glyph_bits(chr(c)) for c in range(0x20, 0x7F)}
_REV: dict[int, str] = {bits: ch for ch, bits in GLYPHS.items()}
assert len(_REV) == len(GLYPHS), "glyph table must be injective for OCR"

# vectorized tables (numpy does the per-pixel work — the Arrow-batch
# pattern: Python orchestrates, C kernels touch pixels)
_BIT_W = GLYPH_W * GLYPH_H
_SHIFTS = np.arange(_BIT_W - 1, -1, -1, dtype=np.int64)
# glyph index (0..94) → (7,5) ink mask
_GLYPH_ARR = (
    (np.array([GLYPHS[chr(c)] for c in range(0x20, 0x7F)], dtype=np.int64)[:, None]
     >> _SHIFTS[None, :]) & 1
).astype(bool).reshape(95, GLYPH_H, GLYPH_W)
_REV_KEYS = np.sort(np.array(list(_REV), dtype=np.int64))
_REV_CHARS = np.array([_REV[int(k)] for k in _REV_KEYS], dtype="<U1")


def _proj_line(line: str) -> str:
    return "".join(ch if 0x20 <= ord(ch) <= 0x7E else " " for ch in line)


def rasterize_text(text: str, cols: int = PAGE_COLS, rows: int = PAGE_ROWS) -> bytes:
    """Text → fixed-size grayscale PNG page (clips at the grid)."""
    w, h = cols * CELL_W, rows * CELL_H
    page = np.full((rows, CELL_H, cols, CELL_W), 255, dtype=np.uint8)
    for r, raw in enumerate(text.split("\n")[:rows]):
        line = _proj_line(raw)[:cols]
        if not line.strip(" "):
            continue
        idx = np.frombuffer(line.encode("latin-1"), dtype=np.uint8).astype(np.int64) - 0x20
        ink = _GLYPH_ARR[idx]  # (n, 7, 5) bool
        cell = page[r, :GLYPH_H, : len(line), :GLYPH_W]
        cell[ink.transpose(1, 0, 2)] = 0
    return encode_png(w, h, 1, page.reshape(h, w).tobytes())


def ocr_png(data: bytes) -> str:
    """PNG page → text (inverse of ``rasterize_text``)."""
    w, h, ch, px = decode_png(data)
    if ch != 1 or w % CELL_W or h % CELL_H:
        raise ValueError("not a rasterized page")
    cols, rows = w // CELL_W, h // CELL_H
    arr = np.frombuffer(px, dtype=np.uint8).reshape(rows, CELL_H, cols, CELL_W)
    ink = arr[:, :GLYPH_H, :, :GLYPH_W] < 128  # (rows, 7, cols, 5)
    bits = ink.transpose(0, 2, 1, 3).reshape(rows, cols, _BIT_W)
    packed = (bits.astype(np.int64) << _SHIFTS[None, None, :]).sum(axis=2)
    pos = np.searchsorted(_REV_KEYS, packed)
    pos_c = np.clip(pos, 0, len(_REV_KEYS) - 1)
    chars = np.where(_REV_KEYS[pos_c] == packed, _REV_CHARS[pos_c], "�")
    lines = ["".join(row.tolist()).rstrip(" ") for row in chars]
    return "\n".join(lines).rstrip("\n")


def ocr_expected(text: str, cols: int = PAGE_COLS, rows: int = PAGE_ROWS) -> str:
    """The raster→OCR fixpoint of ``text`` (oracle-side transform):
    ASCII-project, clip to the grid, right-strip lines, drop trailing
    blank lines."""
    lines = [_proj_line(ln)[:cols].rstrip(" ") for ln in text.split("\n")[:rows]]
    return "\n".join(lines).rstrip("\n")
