"""Deterministic PDF text extraction (pure Python, no dependencies).

The Spark-first replacement for the reference's per-image OCR hop
(``/root/reference/2_OpenCV_OCR/ocr_engine.py:13-102``): instead of
rasterize→Tesseract/Gemini, decode the PDF text objects directly and
reconstruct reading order by y-then-x sort — the deterministic
equivalent the reference itself prefers when a text layer exists
(``/root/reference/2_OpenCV_OCR/core_document_processing.py:71-79``).

Supported subset (defined by ``pdfgen``, SURVEY.md §7.3.2, widened in
round 4 toward the reference's accept-any-upload behavior,
``core_document_generator.py:122``): Tj/TJ/' show operators with
literal AND hex strings (``<48656C6C6F> Tj``), Td/TD/Tm/T*/TL
positioning (translation-only matrices), FlateDecode or identity
content streams with ``/Filter`` given as a name OR a filter array
(``/Filter [/FlateDecode]``), recursive page trees (nested ``/Kids``
with cycle + depth guards), inline dictionaries in content streams
(skipped, e.g. BDC property lists).

Raises ``PdfError`` on malformed input; callers map that to an
``error`` column (row-level tolerance, ``main.py:77-78`` analog).
"""

from __future__ import annotations

import re
import zlib

LINE_Y_TOL = 2.0  # runs within this many points of a line's y are one line
TJ_SPACE_KERN = -180.0  # TJ kerning beyond this inserts a word gap


class PdfError(ValueError):
    pass


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Map object number → raw object body (dict + optional stream)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        end = data.find(b"endobj", m.end())
        if end == -1:
            raise PdfError(f"object {num}: missing endobj")
        objs[num] = data[m.end() : end]
    if not objs:
        raise PdfError("no objects found")
    return objs


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def _filter_chain(head: bytes) -> list[bytes]:
    """The stream's filter names in application order — handles both the
    name form (``/Filter /FlateDecode``) and the array form
    (``/Filter [/FlateDecode]``, PDF 32000 §7.3.8)."""
    fm = _FILTER_RE.search(head)
    if fm is None:
        return []
    return _FILTER_NAME_RE.findall(fm.group(1))


def _stream_data(body: bytes) -> bytes:
    """Extract and decode the stream payload of an object body."""
    sm = re.search(rb"stream\r?\n", body)
    if sm is None:
        raise PdfError("contents object has no stream")
    head = body[: sm.start()]
    lm = _LENGTH_RE.search(head)
    if lm is None:
        raise PdfError("stream missing /Length")
    start = sm.end()
    data = body[start : start + int(lm.group(1))]
    for name in _filter_chain(head):
        if name == b"FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error as e:  # corrupt stream → row-level error
                raise PdfError(f"flate decode failed: {e}") from e
        else:  # honest subset boundary: unknown filter = error column
            raise PdfError(f"unsupported stream filter /{name.decode('latin-1')}")
    return data


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        if e in b"nrtbf":
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
            i += 1
        elif e in b"()\\":
            out.append(e)
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (10, 13):  # line continuation
            i += 1
            if e == 13 and i < n and raw[i] == 10:
                i += 1
        else:
            out.append(e)
            i += 1
    return out.decode("latin-1")


_NAME_RE = re.compile(rb"/[^\s()<>\[\]/]*")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_WS_BYTES = frozenset(b" \t\r\n\f\x00")


def _tokenize(content: bytes):
    """Yield ('str', s) | ('num', f) | ('name', b) | ('op', b) | ('arr', list).

    Positional matching throughout (no ``content[i:]`` slices) — the
    tokenizer must stay O(n) on multi-MB whale content streams."""
    i, n = 0, len(content)
    arr_stack: list[list] = []

    def emit(tok):
        if arr_stack:
            arr_stack[-1].append(tok)
            return None
        return tok

    while i < n:
        if content[i] in _WS_BYTES:
            i += 1
            continue
        c = content[i : i + 1]
        if c == b"(":
            depth, j, buf = 1, i + 1, bytearray()
            while j < n and depth:
                ch = content[j]
                if ch == 0x5C:
                    buf += content[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                buf.append(ch)
                j += 1
            tok = emit(("str", _unescape(bytes(buf))))
            if tok:
                yield tok
            i = j
        elif c == b"<":
            if content[i + 1 : i + 2] == b"<":  # inline dict (e.g. BDC
                # property list): skip the balanced << ... >> — no text
                depth, j = 1, i + 2
                while j < n and depth:
                    if content[j : j + 2] == b"<<":
                        depth += 1
                        j += 2
                    elif content[j : j + 2] == b">>":
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                if depth:
                    raise PdfError("unterminated inline dictionary")
                i = j
            else:  # hex string <48656C6C6F>; whitespace legal, odd pads 0
                j = content.find(b">", i + 1)
                if j == -1:
                    raise PdfError("unterminated hex string")
                hx = bytes(
                    b for b in content[i + 1 : j] if b not in _WS_BYTES
                )
                if not re.fullmatch(rb"[0-9A-Fa-f]*", hx):
                    raise PdfError("bad hex string")
                if len(hx) % 2:
                    hx += b"0"
                tok = emit(("str", bytes.fromhex(hx.decode("ascii")).decode("latin-1")))
                if tok:
                    yield tok
                i = j + 1
        elif c == b"[":
            arr_stack.append([])
            i += 1
        elif c == b"]":
            items = arr_stack.pop()
            tok = emit(("arr", items))
            if tok:
                yield tok
            i += 1
        elif c == b"/":
            m = _NAME_RE.match(content, i)
            tok = emit(("name", m.group(0)))
            if tok:
                yield tok
            i = m.end()
        else:
            m = _NUM_RE.match(content, i)
            if m and m.group(0):
                tok = emit(("num", float(m.group(0))))
                if tok:
                    yield tok
                i = m.end()
            else:
                m = _OP_RE.match(content, i)
                if not m:
                    raise PdfError(f"bad content token at {i}")
                tok = emit(("op", m.group(0)))
                if tok:
                    yield tok
                i = m.end()


def _runs_from_content(content: bytes) -> list[tuple[float, float, str]]:
    """Interpret text operators → (y, x, text) runs."""
    runs: list[tuple[float, float, str]] = []
    x = y = 0.0
    leading = 0.0
    stack: list = []

    def tj_text(items: list) -> str:
        parts: list[str] = []
        for kind, val in items:
            if kind == "str":
                parts.append(val)
            elif kind == "num" and val <= TJ_SPACE_KERN:
                parts.append(" ")
        return "".join(parts)

    for tok in _tokenize(content):
        kind, val = tok
        if kind != "op":
            stack.append(tok)
            continue
        if val == b"BT":
            x = y = 0.0
        elif val == b"Td":
            x += stack[-2][1]
            y += stack[-1][1]
        elif val == b"TD":
            leading = -stack[-1][1]
            x += stack[-2][1]
            y += stack[-1][1]
        elif val == b"Tm":
            x, y = stack[-2][1], stack[-1][1]
        elif val == b"TL":
            leading = stack[-1][1]
        elif val == b"T*":
            y -= leading
        elif val == b"Tj":
            runs.append((y, x, stack[-1][1]))
        elif val == b"'":
            y -= leading
            runs.append((y, x, stack[-1][1]))
        elif val == b"TJ":
            runs.append((y, x, tj_text(stack[-1][1])))
        # Tf, ET, and anything else: no text-position effect in our subset
        stack.clear()
    return runs


def _runs_to_text(runs: list[tuple[float, float, str]]) -> str:
    """Reading-order reconstruction: group runs into lines by y
    (tolerance LINE_Y_TOL), order lines top-to-bottom, runs within a
    line left-to-right (the north-star y/x coordinate clustering)."""
    if not runs:
        return ""
    srt = sorted(runs, key=lambda r: (-r[0], r[1]))
    lines: list[list[tuple[float, float, str]]] = []
    cur_y: float | None = None
    for r in srt:
        if cur_y is None or abs(r[0] - cur_y) > LINE_Y_TOL:
            lines.append([r])
            cur_y = r[0]
        else:
            lines[-1].append(r)
    return "\n".join("".join(t for _, _, t in sorted(ln, key=lambda r: r[1])) for ln in lines)


_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages(?![A-Za-z])")
_ROOT_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_MAX_TREE_DEPTH = 64


def _collect_leaf_pages(objs: dict[int, bytes], num: int, visited: set, depth: int) -> list[int]:
    """Depth-first walk of a (possibly nested) page tree: /Pages nodes
    recurse into /Kids in order, anything else is a leaf page. Cycle
    and depth guards keep adversarial trees in the error column instead
    of hanging an executor."""
    if depth > _MAX_TREE_DEPTH:
        raise PdfError("page tree too deep")
    if num in visited:
        raise PdfError("page tree cycle")
    visited.add(num)
    body = objs.get(num)
    if body is None:
        raise PdfError("dangling page ref")
    if _TYPE_PAGES_RE.search(body):
        km = _KIDS_RE.search(body)
        if km is None:
            raise PdfError("no /Kids")
        leaves: list[int] = []
        for rm in _REF_RE.finditer(km.group(1)):
            leaves += _collect_leaf_pages(objs, int(rm.group(1)), visited, depth + 1)
        return leaves
    return [num]


def extract_pdf_pages(data: bytes) -> list[str]:
    """bytes → ordered per-page text (1-based page order list).

    Page order is the depth-first /Kids order from the root /Pages node
    (nested intermediate /Pages nodes supported). Empty page text is
    legal and preserved (golden analog:
    ``/root/reference/3_Extracted_Texts/Synopsis/page_1.txt`` is 0 bytes).
    """
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (magic bytes)")
    objs = _parse_objects(data)
    # root: the Catalog's /Pages ref; fallback to the first /Type /Pages
    # object for catalog-less fragments
    root_num = None
    for n_, b in objs.items():
        if b"/Type /Catalog" in b:
            rm = _ROOT_PAGES_RE.search(b)
            if rm:
                root_num = int(rm.group(1))
            break
    if root_num is None:
        root_num = next(
            (n_ for n_, b in objs.items()
             if b.lstrip().startswith(b"<<") and _TYPE_PAGES_RE.search(b)),
            None,
        )
    if root_num is None:
        raise PdfError("no /Pages object")
    texts: list[str] = []
    for pnum in _collect_leaf_pages(objs, root_num, set(), 0):
        page = objs[pnum]
        cm = _CONTENTS_RE.search(page)
        if cm is None:
            texts.append("")
            continue
        cobj = objs.get(int(cm.group(1)))
        if cobj is None:
            raise PdfError("dangling contents ref")
        content = _stream_data(cobj)
        # frozen spec: \x02 (the engine's internal page sentinel) is
        # stripped from page text — a PDF string could inject it via an
        # octal escape and would otherwise split one page into two in
        # the fused operator's PAGE_SEP join/split round-trip
        texts.append(_runs_to_text(_runs_from_content(content)).replace("\x02", ""))
    return texts


def extract_pdf_pages_safe(data: bytes) -> tuple[list[str] | None, str | None]:
    """Total version of ``extract_pdf_pages``: never raises.

    Row-level error tolerance (the reference catches ``Exception`` per
    file, ``/root/reference/2_OpenCV_OCR/main.py:77-78``): any exception
    from malformed-but-magic-valid input (missing operands, bad operand
    types, truncated objects) becomes an error string instead of killing
    the executor task — with deterministic task retries, an unguarded
    raise would make the whole job permanently unable to finish on that
    input. Returns ``(pages, None)`` or ``(None, error)``.
    """
    try:
        return extract_pdf_pages(data), None
    except PdfError as e:
        return None, str(e)
    except Exception as e:  # noqa: BLE001 — row-level tolerance by design
        return None, f"unexpected:{type(e).__name__}"
