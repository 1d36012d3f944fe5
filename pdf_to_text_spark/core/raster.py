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


def _proj_line(line: str) -> str:
    return "".join(ch if 0x20 <= ord(ch) <= 0x7E else " " for ch in line)


def rasterize_text(text: str, cols: int = PAGE_COLS, rows: int = PAGE_ROWS) -> bytes:
    """Text → fixed-size grayscale PNG page (clips at the grid)."""
    w, h = cols * CELL_W, rows * CELL_H
    px = bytearray(b"\xff" * (w * h))
    lines = text.split("\n")[:rows]
    for r, raw in enumerate(lines):
        for k, ch in enumerate(_proj_line(raw)[:cols]):
            bits = GLYPHS[ch]
            if not bits:
                continue
            x0, y0 = k * CELL_W, r * CELL_H
            for b in range(GLYPH_W * GLYPH_H):
                if bits >> (GLYPH_W * GLYPH_H - 1 - b) & 1:
                    px[(y0 + b // GLYPH_W) * w + x0 + b % GLYPH_W] = 0
    return encode_png(w, h, 1, bytes(px))


def ocr_png(data: bytes) -> str:
    """PNG page → text (inverse of ``rasterize_text``)."""
    w, h, ch, px = decode_png(data)
    if ch != 1 or w % CELL_W or h % CELL_H:
        raise ValueError("not a rasterized page")
    cols, rows = w // CELL_W, h // CELL_H
    lines: list[str] = []
    for r in range(rows):
        out: list[str] = []
        for k in range(cols):
            x0, y0 = k * CELL_W, r * CELL_H
            bits = 0
            for b in range(GLYPH_W * GLYPH_H):
                if px[(y0 + b // GLYPH_W) * w + x0 + b % GLYPH_W] < 128:
                    bits |= 1 << (GLYPH_W * GLYPH_H - 1 - b)
            out.append(_REV.get(bits, "�"))
        lines.append("".join(out).rstrip(" "))
    return "\n".join(lines).rstrip("\n")


def ocr_expected(text: str, cols: int = PAGE_COLS, rows: int = PAGE_ROWS) -> str:
    """The raster→OCR fixpoint of ``text`` (oracle-side transform):
    ASCII-project, clip to the grid, right-strip lines, drop trailing
    blank lines."""
    lines = [_proj_line(ln)[:cols].rstrip(" ") for ln in text.split("\n")[:rows]]
    return "\n".join(lines).rstrip("\n")
