"""Minimal deterministic PDF writer for fixtures.

Emits the exact PDF subset that ``pdfparse`` defines (SURVEY.md §7.3.2):
Tj/TJ show operators, Td/TD/Tm/T*/' positioning, optional FlateDecode
content streams, one font, Letter media box. Replaces the reference's
input corpus (``/root/reference/0_Input_folder/*.pdf``) with seeded
synthetic documents — no external data.
"""

from __future__ import annotations

import zlib


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content_stream(
    lines: list[str],
    *,
    x0: float = 72.0,
    y0: float = 720.0,
    leading: float = 14.0,
    style: str = "td",
) -> bytes:
    """Content stream for one page; ``style`` picks the operator mix.

    td        — first Td then relative TD moves (the common emitter shape)
    tm        — absolute Tm per line
    tj_array  — TJ arrays with kerning numbers (< -180 ⇒ word gap)
    shuffled  — lines emitted in reversed order with absolute Tm
                (exercises the y/x reading-order sort)
    tstar     — TL + T* advance with ' (move-and-show)
    hex       — hex-string show ops (``<...> Tj``) with an inline BDC
                property dict (round-4 widened subset)
    """
    ops: list[str] = ["BT", "/F1 12 Tf"]
    if style == "td":
        ops.append(f"{x0:g} {y0:g} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                ops.append(f"0 -{leading:g} TD")
            ops.append(f"({_esc(ln)}) Tj")
    elif style == "tm":
        for i, ln in enumerate(lines):
            ops.append(f"1 0 0 1 {x0:g} {y0 - i * leading:g} Tm")
            ops.append(f"({_esc(ln)}) Tj")
    elif style == "tj_array":
        ops.append(f"{x0:g} {y0:g} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                ops.append(f"0 -{leading:g} TD")
            words = ln.split(" ")
            parts = " -250 ".join(f"({_esc(w)})" for w in words)
            ops.append(f"[{parts}] TJ")
    elif style == "shuffled":
        order = list(range(len(lines)))[::-1]
        for i in order:
            ops.append(f"1 0 0 1 {x0:g} {y0 - i * leading:g} Tm")
            ops.append(f"({_esc(lines[i])}) Tj")
    elif style == "tstar":
        ops.append(f"{leading:g} TL")
        ops.append(f"{x0:g} {y0:g} Td")
        for i, ln in enumerate(lines):
            ops.append(f"({_esc(ln)}) Tj" if i == 0 else f"({_esc(ln)}) '")
    elif style == "hex":
        # widened subset: hex strings need no escaping and an inline
        # dict (marked-content property list) must be skipped by the
        # tokenizer without emitting text
        ops.append("/Span << /ActualText (ignored) >> BDC")
        ops.append(f"{x0:g} {y0:g} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                ops.append(f"0 -{leading:g} TD")
            hx = ln.encode("latin-1", "replace").hex().upper()
            ops.append(f"<{hx}> Tj")
        ops.append("EMC")
    else:
        raise ValueError(f"unknown style {style!r}")
    ops.append("ET")
    return ("\n".join(ops)).encode("latin-1")


def build_pdf(
    pages: list[bytes], *, flate: bool = False, filter_array: bool = False,
    nested: bool = False,
) -> bytes:
    """Assemble a complete single-xref PDF from per-page content streams.

    Round-4 widened-subset knobs (both legal per PDF 32000):
    ``filter_array`` writes ``/Filter [/FlateDecode]`` (§7.3.8 array
    form; implies flate), ``nested`` splits the page tree into two
    intermediate /Pages nodes under the root (§7.7.3.2 allows arbitrary
    tree shapes) so readers must walk /Kids recursively.
    """
    flate = flate or filter_array
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    if nested and n_pages >= 2:
        mid_a, mid_b = font_num + 1, font_num + 2
        half = (n_pages + 1) // 2
        kids_a = " ".join(f"{3 + 2 * i} 0 R" for i in range(half))
        kids_b = " ".join(f"{3 + 2 * i} 0 R" for i in range(half, n_pages))
        objs[2] = f"<< /Type /Pages /Kids [{mid_a} 0 R {mid_b} 0 R] /Count {n_pages} >>".encode()
        objs[mid_a] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{kids_a}] /Count {half} >>".encode()
        )
        objs[mid_b] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{kids_b}] /Count {n_pages - half} >>".encode()
        )
        parent_of = lambda i: mid_a if i < half else mid_b  # noqa: E731
    else:
        kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
        objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
        parent_of = lambda i: 2  # noqa: E731
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    for i, content in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs[pnum] = (
            f"<< /Type /Page /Parent {parent_of(i)} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cnum} 0 R /Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        data = zlib.compress(content) if flate else content
        filt = (
            b" /Filter [/FlateDecode]" if filter_array
            else (b" /Filter /FlateDecode" if flate else b"")
        )
        objs[cnum] = (
            b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n"
            + data
            + b"\nendstream"
        )
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    maxn = max(objs)
    out += f"xref\n0 {maxn + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {maxn + 1} /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
