"""Minimal deterministic PDF writer for fixtures.

Emits the exact PDF subset that ``pdfparse`` defines (SURVEY.md §7.3.2):
Tj/TJ show operators, Td/TD/Tm/T*/' positioning, optional FlateDecode
content streams, one font, Letter media box. Replaces the reference's
input corpus (``/root/reference/0_Input_folder/*.pdf``) with seeded
synthetic documents — no external data.
"""

from __future__ import annotations

import functools
import re
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
    elif style == "cid":
        # notch-2 widened subset: 2-byte CID codes through the
        # synthetic ToUnicode CMap (``tounicode_cmap``) — code =
        # ord(ch) + 0x100 for printable ASCII, 0x0001 for '§'. Proves
        # the CMap is actually applied: the code points on the wire
        # differ from the Unicode they decode to.
        ops.append(f"{x0:g} {y0:g} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                ops.append(f"0 -{leading:g} TD")
            codes = "".join(f"{cid_code(ch):04X}" for ch in ln)
            ops.append(f"<{codes}> Tj")
    else:
        raise ValueError(f"unknown style {style!r}")
    ops.append("ET")
    return ("\n".join(ops)).encode("latin-1")


def ascii_hex_encode(data: bytes) -> bytes:
    return data.hex().upper().encode() + b">"


def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data) - 3, 4):
        v = int.from_bytes(data[i : i + 4], "big")
        if v == 0:
            out += b"z"
            continue
        grp = bytearray(5)
        for k in range(4, -1, -1):
            grp[k] = 33 + v % 85
            v //= 85
        out += grp
    tail = len(data) % 4
    if tail:
        v = int.from_bytes(data[-tail:] + b"\x00" * (4 - tail), "big")
        grp = bytearray(5)
        for k in range(4, -1, -1):
            grp[k] = 33 + v % 85
            v //= 85
        out += grp[: tail + 1]
    return bytes(out) + b"~>"


def rle_encode(data: bytes) -> bytes:
    """PDF RunLengthDecode inverse: repeat runs ≥3 as (257-n, byte),
    everything else as ≤128-byte literal chunks, EOD 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            chunk = data[j : min(j + 128, end)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += 128

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literal(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    out.append(128)
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode inverse (EarlyChange=1): the width bumps when the
    NEXT free code reaches 2^w - 1, matching the parser's decoder."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    codes: list[tuple[int, int]] = [(256, 9)]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code >= (1 << width) - 1 and width < 12:
                width += 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    out = bytearray()
    bitbuf = bits = 0
    for code, cw in codes:
        bitbuf = (bitbuf << cw) | code
        bits += cw
        while bits >= 8:
            out.append((bitbuf >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((bitbuf << (8 - bits)) & 0xFF)
    return bytes(out)


_FILTER_ENCODERS = {
    "FlateDecode": zlib.compress,
    "ASCIIHexDecode": ascii_hex_encode,
    "ASCII85Decode": ascii85_encode,
    "RunLengthDecode": rle_encode,
    "LZWDecode": lzw_encode,
}


def cid_code(ch: str) -> int:
    """The synthetic CID encoding matching ``tounicode_cmap``: printable
    ASCII shifts by +0x100 (the CMap's bfrange undoes it), '§' maps via
    the bfchar entry at code 0x0001."""
    if ch == "§":
        return 0x0001
    o = ord(ch)
    if 0x20 <= o <= 0x7E:
        return o + 0x100
    raise ValueError(f"cid style supports printable ASCII + '§', got {ch!r}")


def tounicode_cmap() -> bytes:
    """Deterministic /ToUnicode CMap (PDF 32000 §9.10.3) exercising all
    three mapping constructs the parser supports: a 2-byte codespace,
    a bfchar pair, and bfrange in BOTH the increment and array-dst
    forms (codes 0x180-0x182 → A/B/C are redundant with the bulk range
    on purpose — they exist to pin the array form)."""
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfchar\n<0001> <00A7>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<0120> <017E> <0020>\n"
        b"<0180> <0182> [<0041> <0042> <0043>]\n"
        b"endbfrange\n"
        b"endcmap\n"
        b"CMapName currentdict /CMap defineresource pop\nend\nend\n"
    )


def png_predict(data: bytes, columns: int) -> bytes:
    """Apply PNG row predictors (1 color, 8 bpc) for a /DecodeParms
    ``/Predictor 15 /Columns columns`` stream: pads to a whole number of
    rows with newlines (token-safe trailing whitespace in content
    streams), then tags each row with a cycling filter type 0–4
    (None/Sub/Up/Average/Paeth) — /Predictor ≥ 10 only declares "PNG";
    the per-row tag is authoritative (PDF 32000 §7.4.4.4)."""
    if len(data) % columns:
        data += b"\n" * (columns - len(data) % columns)
    out = bytearray()
    prev = bytes(columns)
    for rs in range(0, len(data), columns):
        row = data[rs : rs + columns]
        ft = (rs // columns) % 5
        out.append(ft)
        for j in range(columns):
            left = row[j - 1] if j >= 1 else 0
            if ft == 0:
                v = row[j]
            elif ft == 1:
                v = row[j] - left
            elif ft == 2:
                v = row[j] - prev[j]
            elif ft == 3:
                v = row[j] - (left + prev[j]) // 2
            else:
                c = prev[j - 1] if j >= 1 else 0
                p = left + prev[j] - c
                pa, pb, pc = abs(p - left), abs(p - prev[j]), abs(p - c)
                pr = left if (pa <= pb and pa <= pc) else (prev[j] if pb <= pc else c)
                v = row[j] - pr
            out.append(v & 0xFF)
        prev = row
    return bytes(out)


def tiff_predict(data: bytes, columns: int) -> bytes:
    """Apply the TIFF horizontal-differencing predictor (/Predictor 2,
    8-bit, 1 color): within each row, byte[i] -= byte[i-1]."""
    if len(data) % columns:
        data += b"\n" * (columns - len(data) % columns)
    out = bytearray(data)
    for rs in range(0, len(out), columns):
        for i in range(rs + columns - 1, rs, -1):
            out[i] = (out[i] - out[i - 1]) & 0xFF
    return bytes(out)


# §7.6.3.3 Table 21 padding constant (spec-fixed)
_ENC_PAD = bytes(
    [0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
     0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
     0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A]
)


def _rc4e(key: bytes, data: bytes) -> bytes:
    # independent of pdfparse.rc4 on purpose: a shared implementation
    # would let a key-schedule bug cancel out in roundtrip tests.
    # KSA key expansion (r6): key[i % len] inside the 256-iteration
    # schedule paid a len() + modulo per step — ~40% of the whole
    # cipher for the 16-32 byte payloads the handler algorithms feed.
    kx = (key * (256 // len(key) + 1))[:256]
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + kx[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    a = b = 0
    for k, c in enumerate(data):
        a = (a + 1) & 0xFF
        b = (b + S[a]) & 0xFF
        S[a], S[b] = S[b], S[a]
        out[k] = c ^ S[(S[a] + S[b]) & 0xFF]
    return bytes(out)


@functools.lru_cache(maxsize=64)
def _o_entry(owner_pw: bytes, user_pw: bytes, r: int, nbits: int) -> bytes:
    """§7.6.3.4 Algorithm 3: the /O entry (and its 20-round RC4 chain
    for /R ≥ 3). Split out of ``std_handler_entries`` because it is
    ID-independent and therefore memoizable across documents."""
    import hashlib

    klen = nbits // 8
    upad = (user_pw + _ENC_PAD)[:32]
    h = hashlib.md5((owner_pw + _ENC_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):  # Alg 3 step c: full 16-byte rehash
            h = hashlib.md5(h).digest()
    okey = h[:klen]
    o = _rc4e(okey, upad)  # Alg 3 step e: the PADDED USER password
    if r >= 3:
        for i in range(1, 20):
            o = _rc4e(bytes(x ^ i for x in okey), o)
    return o


def std_handler_entries(
    owner_pw: bytes, r: int, nbits: int, p: int, id0: bytes, user_pw: bytes = b""
) -> tuple[bytes, bytes, bytes]:
    """Standard security handler entries — (file_key, /O, /U) per PDF
    32000 §7.6.3.4 Algorithms 3 (O), 2 (file key) and 4/5 (U), for an
    EMPTY user password by default or a supplied ``user_pw`` (round-5
    item 6). Independent spec implementation (see _rc4e)."""
    import hashlib

    klen = nbits // 8
    upad = (user_pw + _ENC_PAD)[:32]
    # Algorithm 3 (/O) depends only on the passwords/r/nbits, never on
    # the per-document ID — memoized (r6) so a corpus encrypted under
    # one credential pair pays its 20-round RC4 chain once, not per doc
    o = _o_entry(owner_pw, user_pw, r, nbits)
    key = hashlib.md5(
        upad + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if r >= 3:
        for _ in range(50):  # Alg 2 step f: first-klen-bytes rehash
            key = hashlib.md5(key[:klen]).digest()
    key = key[:klen]
    if r == 2:
        u = _rc4e(key, _ENC_PAD)
    else:
        u = _rc4e(key, hashlib.md5(_ENC_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4e(bytes(x ^ i for x in key), u)
        u += bytes(16)  # /U padding, arbitrary per spec
    return key, o, u


def build_pdf(
    pages: list[bytes], *, flate: bool = False, filter_array: bool = False,
    nested: bool = False, cid_font: bool = False, split_content: bool = False,
    objstm: bool = False, filters: list[str] | None = None,
    predictor: int | None = None, pred_columns: int = 64,
    images: list[tuple[int, int, bytes]] | None = None,
    encrypt: int | None = None, owner_pw: bytes = b"owner",
    user_pw: bytes = b"", xref_stream: bool = False,
    encoding: bytes | None = None, encoding_indirect: bool = False,
) -> bytes:
    """Assemble a complete single-xref PDF from per-page content streams.

    Round-4 widened-subset knobs (all legal per PDF 32000):
    ``filter_array`` writes ``/Filter [/FlateDecode]`` (§7.3.8 array
    form; implies flate), ``nested`` splits the page tree into two
    intermediate /Pages nodes under the root (§7.7.3.2 allows arbitrary
    tree shapes) so readers must walk /Kids recursively.

    Notch-2 knobs: ``cid_font`` emits a /Type0 /Identity-H font whose
    /ToUnicode CMap (``tounicode_cmap``) decodes the ``cid``-style
    2-byte hex show strings; ``split_content`` divides each page's
    content stream into TWO objects at a newline token boundary and
    references them as a ``/Contents [a 0 R b 0 R]`` array (§7.7.3.3);
    ``objstm`` packs every non-stream object (catalog, page tree, page
    dicts, font) into a /Type /ObjStm container (§7.5.7) and bumps the
    header to %PDF-1.5 — the classic xref table is retained for the
    top-level objects (hybrid-reference shape; our parser ignores xref
    and scans, as many repair-mode readers do).

    Notch-3 knob: ``filters`` names an explicit decode chain in DECODE
    order (e.g. ``["ASCII85Decode", "FlateDecode"]`` means the reader
    85-decodes first, then inflates — so the writer compresses first,
    then 85-encodes). Supported: FlateDecode, LZWDecode (EarlyChange=1),
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode. Overrides
    ``flate``/``filter_array``.

    Notch-4 knobs: ``predictor`` (2 = TIFF differencing, ≥10 = PNG row
    filters; §7.4.4.4) pre-transforms every stream before its
    compression filter and declares it via ``/DecodeParms``; attached to
    the LAST filter in decode order when a chain is present (array form
    with ``null`` placeholders). ``images`` embeds ``(width, height,
    jpeg_bytes)`` tuples as ``/Subtype /Image`` XObjects with
    ``/Filter /DCTDecode`` (§7.4.8), registered as ``/Im{i}`` in every
    page's Resources — content streams may then paint them with
    ``q w 0 0 h x y cm /Im{i} Do Q``.
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
    tounicode_num = font_num + 3  # slots +1/+2 reserved for nested mids
    extra_content_base = font_num + 4
    img_base = extra_content_base + len(pages) + 1  # after the ObjStm slot
    xobj_entry = ""
    if images:
        refs = " ".join(f"/Im{i} {img_base + i} 0 R" for i in range(len(images)))
        xobj_entry = f" /XObject << {refs} >>"
        for i, img in enumerate(images):
            if len(img) == 4 and img[3] == "gray":
                # uncompressed-sample scan shape: 8-bpc DeviceGray
                # under /FlateDecode (the PNG-less raw-gray XObject
                # real scanners emit for grayscale pages)
                iw, ih, raw = img[0], img[1], img[2]
                payload = zlib.compress(raw)
                objs[img_base + i] = (
                    f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
                    f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                    f"/Filter /FlateDecode /Length {len(payload)} >>".encode()
                    + b"\nstream\n" + payload + b"\nendstream"
                )
                continue
            if len(img) == 4 and img[3] in ("g4", "g3", "g3_2d"):
                # bitonal scan shape: CCITT with explicit /DecodeParms
                # — /K -1 = Group 4 pure 2-D, /K 0 = Group 3 1-D MH,
                # /K 4 = Group 3 mixed (payload from encode_g3_2d(k=4))
                iw, ih, payload = img[0], img[1], img[2]
                k = {"g4": -1, "g3": 0, "g3_2d": 4}[img[3]]
                objs[img_base + i] = (
                    f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
                    f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                    f"/Filter /CCITTFaxDecode /DecodeParms << /K {k} "
                    f"/Columns {iw} /Rows {ih} /BlackIs1 false >> "
                    f"/Length {len(payload)} >>".encode()
                    + b"\nstream\n" + payload + b"\nendstream"
                )
                continue
            iw, ih, jpeg = img[0], img[1], img[2]
            objs[img_base + i] = (
                f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
                f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                f"/Filter /DCTDecode /Length {len(jpeg)} >>".encode()
                + b"\nstream\n" + jpeg + b"\nendstream"
            )

    def _stream_obj(content: bytes) -> bytes:
        parms = b""
        if predictor:
            content = (
                tiff_predict(content, pred_columns) if predictor == 2
                else png_predict(content, pred_columns)
            )
            pdict = (
                f"<< /Predictor {predictor} /Columns {pred_columns} >>".encode()
            )
        if filters:
            data = content
            for name in reversed(filters):  # encode inverse of decode order
                data = _FILTER_ENCODERS[name](data)
            names = " ".join(f"/{n}" for n in filters)
            filt = (
                f" /Filter [{names}]" if len(filters) > 1 else f" /Filter /{filters[0]}"
            ).encode()
            if predictor:
                # predictor attaches to the LAST filter in decode order
                nulls = b" ".join([b"null"] * (len(filters) - 1))
                parms = (
                    b" /DecodeParms [" + (nulls + b" " if nulls else b"") + pdict + b"]"
                    if len(filters) > 1 else b" /DecodeParms " + pdict
                )
        else:
            data = zlib.compress(content) if (flate or predictor) else content
            filt = (
                b" /Filter [/FlateDecode]" if filter_array
                else (b" /Filter /FlateDecode" if (flate or predictor) else b"")
            )
            if predictor:
                parms = b" /DecodeParms " + pdict
        return (
            b"<< /Length " + str(len(data)).encode() + filt + parms + b" >>\nstream\n"
            + data
            + b"\nendstream"
        )

    for i, content in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        if split_content:
            mid = content.find(b"\n", len(content) // 2)
            parts = (
                [content[:mid], content[mid:]] if mid != -1 else [content]
            )
        else:
            parts = [content]
        if len(parts) == 2:
            cnum2 = extra_content_base + i
            contents_entry = f"/Contents [{cnum} 0 R {cnum2} 0 R]"
            objs[cnum2] = _stream_obj(parts[1])
        else:
            contents_entry = f"/Contents {cnum} 0 R"
        objs[pnum] = (
            f"<< /Type /Page /Parent {parent_of(i)} 0 R /MediaBox [0 0 612 792] "
            f"{contents_entry} /Resources << /Font << /F1 {font_num} 0 R >>"
            f"{xobj_entry} >> >>"
        ).encode()
        objs[cnum] = _stream_obj(parts[0])
    if cid_font:
        objs[font_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
            f"/Encoding /Identity-H /ToUnicode {tounicode_num} 0 R >>"
        ).encode()
        objs[tounicode_num] = _stream_obj(tounicode_cmap())
    else:
        enc_entry = b""
        if encoding is not None:
            # round-5 /Encoding knob: caller passes the RAW value bytes
            # (a bare name like b"/WinAnsiEncoding" or a dict like
            # b"<< /Type /Encoding /Differences [65 /alpha] >>") so the
            # generator shares no glyph table with the parser —
            # expected text in tests is hand-written, not derived.
            if encoding_indirect:
                enc_entry = f" /Encoding {tounicode_num} 0 R".encode()
                objs[tounicode_num] = encoding
            else:
                enc_entry = b" /Encoding " + encoding
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            + enc_entry + b" >>"
        )

    if objstm:
        # pack every non-stream object into one /Type /ObjStm container
        packed = {n_: b for n_, b in objs.items() if b"\nstream\n" not in b}
        for n_ in packed:
            del objs[n_]
        objstm_num = extra_content_base + n_pages
        bodies = [packed[n_] for n_ in sorted(packed)]
        offs: list[int] = []
        pos = 0
        for b in bodies:
            offs.append(pos)
            pos += len(b) + 1
        header = " ".join(
            f"{n_} {off}" for n_, off in zip(sorted(packed), offs)
        ).encode()
        payload = header + b"\n" + b"\n".join(bodies) + b"\n"
        first = len(header) + 1
        objs[objstm_num] = (
            f"<< /Type /ObjStm /N {len(packed)} /First {first} "
            f"/Length {len(payload)} >>".encode()
            + b"\nstream\n" + payload + b"\nendstream"
        )

    trailer_extra = ""
    if encrypt:
        # notches 5+7: Standard security handler, empty user password —
        # encrypt = revision: 2 ⇒ /V 1 RC4-40, 3 ⇒ /V 2 RC4-128,
        # 4 ⇒ /V 4 crypt filters with /CFM /AESV2 (AES-128-CBC,
        # IV-prefixed payload, PKCS#7-style padding; /Length refers to
        # the ENCRYPTED byte count). RC4 preserves stream length; AES
        # does not, so its post-pass rewrites /Length.
        import hashlib

        r_ = encrypt
        nbits = 40 if r_ == 2 else (256 if r_ >= 5 else 128)
        klen = nbits // 8
        p_ = -44  # print + copy denied: a typical permissions mask
        id0 = hashlib.md5(
            b"".join(objs[k][:64] for k in sorted(objs))
        ).digest()
        if r_ >= 5:
            # AES-256 (ISO 32000-2 §7.6.4): deterministic salts + file
            # key from the document ID; /U = KDF-hash || salts, /UE
            # wraps the file key; owner entries absorb /U as udata.
            # /R 6 uses the hardened 2.B KDF; /R 5 (deprecated Adobe
            # ExtensionLevel 3) a single SHA-256(pw || salt || udata).
            from pdf_to_text_spark.core.aescipher import (
                cbc_encrypt_nopad,
                encrypt_block,
                pdf_hash_2b,
            )

            hfn = (
                pdf_hash_2b
                if r_ == 6
                else (lambda pw, s, u: hashlib.sha256(pw + s + u).digest())
            )
            key = hashlib.sha256(b"filekey" + id0).digest()
            vs = hashlib.md5(b"vs" + id0).digest()[:8]
            ks_ = hashlib.md5(b"ks" + id0).digest()[:8]
            u_ = hfn(user_pw, vs, b"") + vs + ks_
            ue_ = cbc_encrypt_nopad(hfn(user_pw, ks_, b""), bytes(16), key)
            ovs = hashlib.md5(b"ovs" + id0).digest()[:8]
            oks = hashlib.md5(b"oks" + id0).digest()[:8]
            o_ = hfn(owner_pw, ovs, u_) + ovs + oks
            oe_ = cbc_encrypt_nopad(hfn(owner_pw, oks, u_), bytes(16), key)
            perms_ = encrypt_block(
                key,
                (p_ & 0xFFFFFFFF).to_bytes(4, "little")
                + b"\xff\xff\xff\xff" + b"Tadb" + id0[:4],
            )
        else:
            key, o_, u_ = std_handler_entries(owner_pw, r_, nbits, p_, id0, user_pw)
        for num in sorted(objs):
            body = objs[num]
            sm = body.find(b"\nstream\n")
            if sm == -1:
                continue
            head = body[:sm]
            lm = re.search(rb"/Length\s+(\d+)", head)
            start = sm + len(b"\nstream\n")
            ln = int(lm.group(1))
            if r_ >= 5:
                okey = key  # AESV3: the file key, no per-object derivation
            else:
                salt = b"sAlT" if r_ == 4 else b""
                okey = hashlib.md5(
                    key + num.to_bytes(3, "little") + (0).to_bytes(2, "little") + salt
                ).digest()[: min(klen + 5, 16)]
            if r_ in (4, 5, 6):
                from pdf_to_text_spark.core.aescipher import cbc_encrypt

                iv = hashlib.md5(b"iv" + num.to_bytes(3, "little") + id0).digest()
                enc_payload = iv + cbc_encrypt(okey, iv, body[start : start + ln])
                head = re.sub(
                    rb"/Length\s+\d+",
                    b"/Length " + str(len(enc_payload)).encode(),
                    head, count=1,
                )
                objs[num] = (
                    head + b"\nstream\n" + enc_payload + body[start + ln :]
                )
            else:
                objs[num] = (
                    body[:start]
                    + _rc4e(okey, body[start : start + ln])
                    + body[start + ln :]
                )
        enc_num = max(objs) + 1
        if r_ >= 5:
            objs[enc_num] = (
                f"<< /Filter /Standard /V 5 /R {r_} /Length 256 /P {p_} "
                f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                f"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
                f"/O <{o_.hex()}> /U <{u_.hex()}> "
                f"/OE <{oe_.hex()}> /UE <{ue_.hex()}> /Perms <{perms_.hex()}> >>"
            ).encode()
        elif r_ == 4:
            objs[enc_num] = (
                f"<< /Filter /Standard /V 4 /R 4 /Length {nbits} /P {p_} "
                f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                f"/Length {nbits // 8} >> >> /StmF /StdCF /StrF /StdCF "
                f"/O <{o_.hex()}> /U <{u_.hex()}> >>"
            ).encode()
        else:
            objs[enc_num] = (
                f"<< /Filter /Standard /V {1 if r_ == 2 else 2} /R {r_} "
                f"/Length {nbits} /P {p_} /O <{o_.hex()}> /U <{u_.hex()}> >>"
            ).encode()
        trailer_extra = (
            f" /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]"
        )

    out = bytearray(b"%PDF-1.5\n" if (objstm or xref_stream) else b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    maxn = max(objs)
    if xref_stream:
        # notch 6: a cross-reference STREAM (§7.5.8) replaces the classic
        # table entirely — trailer entries live in the stream dict, rows
        # are /W [1 4 2] binary tuples (type, offset, gen), and the data
        # is flate+PNG-predictor-12 encoded, the shape real writers emit.
        # XRef streams are never encrypted (§7.5.8.2), matching the
        # post-`encrypt` construction point here.
        xnum = maxn + 1
        rows = bytearray()
        rows += b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for num in range(1, xnum):
            rows += (
                b"\x01" + offsets.get(num, 0).to_bytes(4, "big") + (0).to_bytes(2, "big")
            )
        rows += b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        data = zlib.compress(png_predict(bytes(rows), 7))
        out += (
            f"{xnum} 0 obj\n<< /Type /XRef /Size {xnum + 1} /W [1 4 2] "
            f"/Index [0 {xnum + 1}] /Root 1 0 R{trailer_extra} "
            f"/Filter /FlateDecode "
            f"/DecodeParms << /Predictor 12 /Columns 7 >> "
            f"/Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream\nendobj\n"
        )
        out += f"startxref\n{xref_off}\n%%EOF\n".encode()
        return bytes(out)
    out += f"xref\n0 {maxn + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {maxn + 1} /Root 1 0 R{trailer_extra} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_scanned_pdf(
    page_texts: list[str], kind: str = "g4", jpeg_quality: int = 95, **kw
) -> bytes:
    """Scanned-document generator: each text page becomes a full-page
    image XObject painted by an image-only content stream (``q cm Do
    Q``; NO text operators) — the shape a scanner/phone-photo PDF has
    and the reference feeds to Tesseract
    (``/root/reference/2_OpenCV_OCR/main.py:86-127``).

    ``kind`` picks the image codec: ``gray`` (8-bpc /FlateDecode raw
    samples), ``g4``/``g3``/``g3_2d`` (CCITT bitonal, threshold <128 →
    black), ``jpeg`` (baseline DCT at ``jpeg_quality``). ``**kw`` is
    forwarded to ``build_pdf`` (e.g. ``encrypt=``/``user_pw=``).

    DISCLOSURE (independent-sides rule): pages are rasterized with
    ``core.raster``'s frozen glyph grid — the same already-disclosed
    shared constant as the q29 rasterize→OCR pair; the image CODECS
    between generator and parser remain independently-tested
    encoder/decoder pairs (ccittfax / jpegcodec / zlib) with their own
    structural + roundtrip gates.
    """
    from pdf_to_text_spark.core.mediacodec import decode_png
    from pdf_to_text_spark.core.raster import rasterize_text

    imgs: list[tuple] = []
    pages: list[bytes] = []
    for i, text in enumerate(page_texts):
        w, h, _, px = decode_png(rasterize_text(text))
        if kind == "gray":
            imgs.append((w, h, px, "gray"))
        elif kind == "jpeg":
            from pdf_to_text_spark.core.jpegcodec import encode_jpeg

            imgs.append((w, h, encode_jpeg(w, h, 1, px, quality=jpeg_quality)))
        elif kind in ("g4", "g3", "g3_2d"):
            from pdf_to_text_spark.core.ccittfax import (
                encode_g3_1d,
                encode_g3_2d,
                encode_g4,
            )

            bm = [
                [1 if px[r * w + c] < 128 else 0 for c in range(w)]
                for r in range(h)
            ]
            payload = {
                "g4": lambda: encode_g4(bm, w),
                "g3": lambda: encode_g3_1d(bm, w),
                "g3_2d": lambda: encode_g3_2d(bm, w, k=4),
            }[kind]()
            imgs.append((w, h, payload, kind))
        else:
            raise ValueError(f"unknown scan kind {kind!r}")
        pages.append(f"q {w} 0 0 {h} 72 360 cm /Im{i} Do Q".encode())
    return build_pdf(pages, images=imgs, **kw)


def content_stream_obj(content: bytes, *, flate: bool = False) -> bytes:
    """A standalone content-stream object body (for incremental
    updates): ``<< /Length n [/Filter] >> stream ... endstream``."""
    data = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    return (
        b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n"
        + data + b"\nendstream"
    )


def append_incremental(pdf: bytes, updates: dict[int, bytes]) -> bytes:
    """Append an incremental-update section (§7.5.6): replacement object
    bodies, an update xref subsection per object, and a trailer with
    /Prev pointing at the previous startxref. Readers must honor the
    LATEST definition of each object — the semantics a repair-mode
    object scan gets for free by letting later definitions win."""
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", pdf)
    prev = int(m.group(1)) if m else 0
    sm = re.search(rb"/Size\s+(\d+)", pdf)
    size = int(sm.group(1)) if sm else (max(updates) + 1)
    out = bytearray(pdf)
    offsets: dict[int, int] = {}
    for num in sorted(updates):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + updates[num] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n"
    for num in sorted(offsets):
        out += f"{num} 1\n{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Prev {prev} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
