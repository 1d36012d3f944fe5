"""Scanned-page OCR: decoded PDF images → page text via the frozen raster.

Closes the engine's widest disclosed gap vs the reference — the
reference's core value prop is OCR of scanned pages
(``/root/reference/2_OpenCV_OCR/ocr_engine.py:13-102``, Tesseract
``--psm 6`` with a Gemini fallback; rasterize hop
``core_document_processing.py:60-66``). The container ships no OCR
library and the determinism north rule forbids a remote fallback, so
the engine OCRs scans rendered in its OWN frozen raster spec
(``core.raster``: injective 5x7 glyph grid, 6x8 px cells) — the same
already-disclosed shared-constant pattern as q29's rasterize→OCR
roundtrip. Real-world scans in unknown fonts remain the honest boundary
(README "Scope boundaries"); what this module adds is the full scanned
PIPELINE shape: image XObject decode (Flate raw gray / CCITT G4/G3 /
baseline JPEG via the repo's own codecs) → pixel threshold → glyph
inverse-match → page text, all deterministic.

Semantics (frozen, opt-in — ``extract_pdf_pages(page_ocr=...)``):

- the fallback fires only when a page's TEXT OPERATORS yield empty text
  (text layer always wins — the reference's P3 routing,
  ``core_document_processing.py:45-58``) and the page PAINTS at least
  one image XObject (``/Name Do`` in its decoded content stream);
- painted images are tried in paint order; the first whose pixels map
  onto the raster cell grid and OCR cleanly supplies the page text;
- no image decodes → the page stays empty — a decorative cover image is
  not an error (and default behavior, ``page_ocr=None``, is
  bit-identical to the frozen goldens).
"""

from __future__ import annotations

import numpy as np

from pdf_to_text_spark.core.mediacodec import encode_png
from pdf_to_text_spark.core.raster import CELL_H, CELL_W, ocr_png


def image_row_to_gray(row: dict) -> np.ndarray | None:
    """One ``extract_pdf_images`` row → (h, w) uint8 grayscale array,
    or None when the row cannot be a page scan this engine understands
    (wrong colorspace, size mismatch, unsupported/lossy-corrupt codec).

    Supported sample layouts — each decoded by the repo's own codec:
    - ``raw`` 8-bpc DeviceGray (e.g. /FlateDecode scans): bytes are the
      samples;
    - ``raw`` 1-bpc (CCITT G4 / G3 output): packed byte-aligned rows,
      1 bits white (§7.4.6 /BlackIs1 default) → 0/255;
    - ``jpeg`` (/DCTDecode): pixel-decoded by ``core.jpegcodec``;
      single-channel only.
    """
    if row.get("colorspace", "DeviceGray") != "DeviceGray":
        return None
    w, h, data = row["width"], row["height"], row["data"]
    if row["codec"] == "raw" and row["bpc"] == 8:
        if len(data) != w * h:
            return None
        return np.frombuffer(data, np.uint8).reshape(h, w)
    if row["codec"] == "raw" and row["bpc"] == 1:
        rb = (w + 7) // 8
        if len(data) != rb * h:
            return None
        bits = np.unpackbits(np.frombuffer(data, np.uint8).reshape(h, rb), axis=1)[:, :w]
        return (bits * np.uint8(255)).astype(np.uint8)
    if row["codec"] == "jpeg":
        from pdf_to_text_spark.core.jpegcodec import decode_jpeg

        try:
            jw, jh, ch, px = decode_jpeg(data)
        except Exception:  # noqa: BLE001 — undecodable scan = not a page
            return None
        if ch != 1 or (jw, jh) != (w, h):
            return None
        return np.frombuffer(px, np.uint8).reshape(h, w)
    return None


def ocr_scanned_images(imgs: list[dict]) -> str | None:
    """The ``page_ocr`` hook for ``extract_pdf_pages``: list of painted
    image rows (paint order) → page text from the first image that maps
    onto the raster cell grid, else None (page stays empty)."""
    for row in imgs:
        arr = image_row_to_gray(row)
        if arr is None:
            continue
        h, w = arr.shape
        if w % CELL_W or h % CELL_H or not w or not h:
            continue
        try:
            return ocr_png(encode_png(w, h, 1, arr.tobytes()))
        except ValueError:
            continue
    return None
