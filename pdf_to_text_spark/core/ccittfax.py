"""CCITT Group 4 (ITU-T T.6) two-dimensional bitonal codec.

PDF's ``/CCITTFaxDecode`` with ``/K < 0`` (§7.4.6) — the most common
image filter in real scanned PDFs after DCT (the reference accepts it
transparently through fitz, ``core_document_generator.py:122``; this
engine decodes it natively so scanned-page XObjects surface through
``operators/multimodal.pdf_embedded_images`` like DCT ones do).

Scope: all three ``/K`` regimes of §7.4.6 — Group 4 (``/K -1``, pure
T.6 2-D), Group 3 one-dimensional (``/K 0``, T.4 MH), and Group 3
mixed (``/K > 0``, T.4 §2.2.4: every line introduced by EOL plus a
tag bit selecting 1-D or 2-D coding, at most K-1 consecutive 2-D
lines per 1-D anchor). All share one MH run table, one 2-D line
coder, and one row-packing contract.

Internal convention: bitmaps are rows of 0/1 ints with **1 = black**
(the coding domain of T.6, which codes runs of white starting first).
The PDF sample-space mapping (``/BlackIs1 false`` ⇒ 0 bits are black,
§7.4.6 Table 11) happens only at ``decode_g4``'s packing step.

Disclosure (same pattern as the AES-256 2.B KDF, NOTES_r4): encoder
and decoder share the ONE modified-Huffman run-length table below, so
a transcription error would cancel in roundtrips. Mitigations: the
table is gated by structural tests (prefix-freeness of every decode
space, completeness of terminating 0–63 and make-up 64–2560 entries,
spec-pinned bit widths), and the 2-D mode codes (V/H/P/EOFB) are
spec-exact by construction of the decoder's bit walk.
"""

from __future__ import annotations

from bisect import bisect_right

from pdf_to_text_spark.core.pdfparse import PdfError

# ---------------------------------------------------------------- tables
# ITU-T T.4 §2.2.2 modified-Huffman run-length codes (shared by T.6
# horizontal mode). Key = run length, value = code bits as a string.

WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# T.4 §2.2.3 extended make-up codes 1792–2560 (shared by both colours)
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §2.2.4 two-dimensional mode codes (vertical offsets −3..+3)
_VCODES = {
    0: "1", 1: "011", 2: "000011", 3: "0000011",
    -1: "010", -2: "000010", -3: "0000010",
}
_PASS, _HORIZ = "0001", "001"
_EOL = "000000000001"

_WHITE_ALL = {**WHITE_TERM, **WHITE_MAKEUP, **EXT_MAKEUP}
_BLACK_ALL = {**BLACK_TERM, **BLACK_MAKEUP, **EXT_MAKEUP}
# decode maps: (nbits, code-as-int) -> run
_WHITE_DEC = {(len(b), int(b, 2)): r for r, b in _WHITE_ALL.items()}
_BLACK_DEC = {(len(b), int(b, 2)): r for r, b in _BLACK_ALL.items()}
_MAX_CODE_BITS = 14


# ---------------------------------------------------------------- encode

def _run_code(run: int, white: bool) -> str:
    """Make-up code(s) + terminating code for one run (multiple 2560
    make-ups for very wide runs, per T.4 §2.2.2.3)."""
    table = _WHITE_ALL if white else _BLACK_ALL
    out: list[str] = []
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        if run - m > 63:  # still too long after the largest make-up
            m = 2560
        out.append(table[m])
        run -= m
    out.append(table[run])
    return "".join(out)


def _transitions(row) -> list[int]:
    """Positions where the pixel colour changes (row starts white)."""
    t: list[int] = []
    prev = 0
    for i, px in enumerate(row):
        px = 1 if px else 0
        if px != prev:
            t.append(i)
            prev = px
    return t


def _encode_2d_line(cur: list[int], ref: list[int], columns: int) -> str:
    """One 2-D-coded line (shared by T.6 and T.4 ``/K > 0``):
    vertical/horizontal/pass modes against the reference line's
    colour-change positions."""
    curs = cur + [columns, columns]
    refs = ref + [columns, columns]
    bits: list[str] = []
    a0, color, ci = -1, 0, 0
    while a0 < columns:
        while ci < len(curs) - 2 and curs[ci] <= a0:
            ci += 1
        a1 = curs[ci] if curs[ci] > a0 else columns
        i = bisect_right(refs, a0)
        if (i & 1) != color:
            i += 1
        b1 = refs[i] if i < len(refs) else columns
        b2 = refs[i + 1] if i + 1 < len(refs) else columns
        if b2 < a1:
            bits.append(_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bits.append(_VCODES[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            a2 = curs[ci + 1] if ci + 1 < len(curs) and curs[ci + 1] > a1 else columns
            bits.append(_HORIZ)
            start = a0 if a0 >= 0 else 0
            bits.append(_run_code(a1 - start, color == 0))
            bits.append(_run_code(a2 - a1, color == 1))
            a0 = a2
    return "".join(bits)


def _encode_1d_line(cur: list[int], columns: int) -> str:
    """One 1-D MH-coded line from colour-change positions (white
    first; a line starting black begins with a zero-length white
    run, T.4 §2.2.2)."""
    bits: list[str] = []
    pos, white = 0, True
    for t in cur + [columns]:
        bits.append(_run_code(t - pos, white))
        pos, white = t, not white
    if pos < columns:
        bits.append(_run_code(columns - pos, white))
    return "".join(bits)


def _pack_bits(bits: list[str]) -> bytes:
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def encode_g4(bitmap, columns: int) -> bytes:
    """T.6-encode rows of 0/1 ints (1 = black) + trailing EOFB."""
    bits: list[str] = []
    ref: list[int] = []
    for row in bitmap:
        cur = _transitions(row)
        bits.append(_encode_2d_line(cur, ref, columns))
        ref = cur
    bits.append(_EOL * 2)  # EOFB
    return _pack_bits(bits)


# ------------------------------------------------------- Group 3 1-D

def encode_g3_1d(bitmap, columns: int, with_eol: bool = True) -> bytes:
    """T.4 one-dimensional MH coding (PDF ``/K 0``): each line is the
    alternating white/black run lengths, white first; optional EOL
    before each line (writers vary — PDF readers must accept both)."""
    bits: list[str] = []
    for row in bitmap:
        if with_eol:
            bits.append(_EOL)
        bits.append(_encode_1d_line(_transitions(row), columns))
    if with_eol:
        bits.append(_EOL * 6)  # RTC
    return _pack_bits(bits)


def encode_g3_2d(bitmap, columns: int, k: int = 4) -> bytes:
    """T.4 mixed one/two-dimensional coding (PDF ``/K > 0``,
    §2.2.4): every line is preceded by EOL plus a tag bit (1 = the
    line is 1-D MH coded, 0 = 2-D coded against the previous line);
    a 1-D anchor line starts every ``k``-th line so transmission
    damage cannot propagate past k-1 lines. Ends with RTC — six
    (EOL + tag 1) pairs."""
    if k <= 0:
        raise ValueError("encode_g3_2d requires K > 0")
    bits: list[str] = []
    ref: list[int] = []
    for idx, row in enumerate(bitmap):
        cur = _transitions(row)
        one_d = idx % k == 0
        bits.append(_EOL)
        bits.append("1" if one_d else "0")
        bits.append(
            _encode_1d_line(cur, columns)
            if one_d
            else _encode_2d_line(cur, ref, columns)
        )
        ref = cur
    bits.append((_EOL + "1") * 6)  # RTC
    return _pack_bits(bits)


def decode_g3_1d(
    data: bytes, columns: int, rows: int | None = None, black_is_1: bool = False
) -> bytes:
    """Decode T.4 1-D MH (``/K 0``) to packed 1-bpc byte-aligned rows,
    same sample contract as ``decode_g4``. EOLs between lines are
    tolerated wherever they appear; decoding stops after ``rows`` lines
    when given, else at RTC/exhaustion."""
    if columns <= 0:
        raise PdfError("G3 columns must be positive")
    br = _BitReader(data)
    out = bytearray()
    n_rows = 0

    def _skip_eols() -> None:
        """Consume any EOL(s) incl. legal 0-fill bits before them
        (§4.1.2: writers may pad so EOL ends on a byte boundary)."""
        while True:
            save = br.pos
            zeros, saw_one = 0, False
            while br.pos < br.n and zeros <= 64:
                if br.bit():
                    saw_one = True
                    break
                zeros += 1
            if saw_one and zeros >= 11:
                continue  # fill + EOL consumed; loop for RTC runs
            br.pos = save
            return

    def _only_padding() -> bool:
        """True when what remains cannot be a line: every MH code
        contains a 1 bit, so an all-zero tail (< 8 bits of byte
        padding, or RTC remnants) is end-of-data."""
        rem = br.n - br.pos
        if rem == 0:
            return True
        if rem >= 12:
            return False
        save = br.pos
        allz = all(br.bit() == 0 for _ in range(rem))
        br.pos = save
        return allz

    while rows is None or n_rows < rows:
        _skip_eols()
        if _only_padding():
            break
        out += _pack_row(_decode_1d_line(br, columns), columns, black_is_1)
        if len(out) > (256 << 20):
            raise PdfError("g3 output exceeds decode cap")
        n_rows += 1
    return bytes(out)


def decode_g3_2d(
    data: bytes, columns: int, rows: int | None = None, black_is_1: bool = False
) -> bytes:
    """Decode T.4 mixed 1-D/2-D (PDF ``/K > 0``) to packed 1-bpc
    byte-aligned rows — the same sample contract as ``decode_g4``.
    Every line must be introduced by EOL plus its tag bit (the tag is
    what makes /K > 0 streams self-describing, so the /K magnitude is
    not needed to decode); 0-fill before EOL is tolerated (§4.1.2).
    Stops after ``rows`` lines when given, else at RTC / exhaustion."""
    if columns <= 0:
        raise PdfError("G3 columns must be positive")
    br = _BitReader(data)
    out = bytearray()
    ref: list[int] | None = None
    n_rows = 0
    while rows is None or n_rows < rows:
        if not _consume_eol(br):
            break  # all-zero tail = byte padding after the last line
        if br.pos >= br.n:
            break
        tag = br.bit()
        if tag and _peek_eol(br):
            break  # RTC: (EOL + 1) repeated — no more lines
        if tag:
            cur = _decode_1d_line(br, columns)
        else:
            if ref is None:
                raise PdfError("G3 2-D line with no 1-D reference line")
            cur = _decode_2d_line(br, ref, columns)
        out += _pack_row(cur, columns, black_is_1)
        if len(out) > (256 << 20):
            raise PdfError("g3 output exceeds decode cap")
        ref = [t for t in cur if t < columns]
        n_rows += 1
    return bytes(out)


def _consume_eol(br: _BitReader) -> bool:
    """Consume optional 0-fill plus one EOL. Returns False when the
    remainder is an all-zero tail (end-of-data byte padding); raises
    on a malformed line start (a 1 bit before 11 zeros)."""
    start = br.pos
    zeros = 0
    while br.pos < br.n:
        if br.bit():
            if zeros >= 11:
                return True
            raise PdfError("expected EOL before G3 line")
        zeros += 1
        if zeros > 4096:
            raise PdfError("runaway fill before G3 EOL")
    br.pos = start
    return False


def _peek_eol(br: _BitReader) -> bool:
    """True when the next bits (after optional fill) are another EOL —
    unambiguous, since no MH code has more than 7 leading zeros."""
    save = br.pos
    try:
        zeros = 0
        while br.pos < br.n and zeros <= 4096:
            if br.bit():
                return zeros >= 11
            zeros += 1
        return False
    finally:
        br.pos = save


# ---------------------------------------------------------------- decode

class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data, self.pos, self.n = data, 0, len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise PdfError("truncated G4 stream")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def peek_eofb(self) -> bool:
        if self.n - self.pos < 12:
            return True  # nothing but padding left
        save = self.pos
        got = all(
            ((self.data[(save + k) >> 3] >> (7 - ((save + k) & 7))) & 1)
            == (1 if k == 11 else 0)
            for k in range(12)
        )
        return got


def _read_mode(br: _BitReader) -> str:
    if br.bit():
        return "V0"
    if br.bit():
        return "VR1" if br.bit() else "VL1"
    if br.bit():
        return "H"
    if br.bit():
        return "P"
    if br.bit():
        return "VR2" if br.bit() else "VL2"
    if br.bit():
        return "VR3" if br.bit() else "VL3"
    return "EOL"  # seven zeros — only EOL/EOFB starts this way in G4


_MODE_DELTA = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3, "VL1": -1, "VL2": -2, "VL3": -3}


def _read_one_code(br: _BitReader, white: bool) -> int:
    dec = _WHITE_DEC if white else _BLACK_DEC
    code = 0
    for n in range(1, _MAX_CODE_BITS + 1):
        code = (code << 1) | br.bit()
        run = dec.get((n, code))
        if run is not None:
            return run
    raise PdfError("bad G4 run-length code")


def _read_run(br: _BitReader, white: bool) -> int:
    total = 0
    while True:
        run = _read_one_code(br, white)
        total += run
        if run < 64:
            return total


def _pack_row(cur: list[int], columns: int, black_is_1: bool) -> bytearray:
    """Materialize colour-change positions (1 = black internally) into
    one packed 1-bpc byte-aligned row, applying the PDF sample-space
    inversion when ``/BlackIs1 false`` (the default)."""
    rowbytes = (columns + 7) // 8
    rowbits = bytearray(rowbytes)
    px, pos = 0, 0
    for t in cur:
        t = min(t, columns)
        if px:  # black span [pos, t)
            for j in range(pos, t):
                rowbits[j >> 3] |= 0x80 >> (j & 7)
        px ^= 1
        pos = t
    if px:
        for j in range(pos, columns):
            rowbits[j >> 3] |= 0x80 >> (j & 7)
    if not black_is_1:
        mask_last = (0xFF << (-columns % 8)) & 0xFF if columns % 8 else 0xFF
        for j in range(rowbytes):
            rowbits[j] ^= 0xFF if j < rowbytes - 1 else mask_last
    return rowbits


def _decode_2d_line(br: _BitReader, ref: list[int], columns: int) -> list[int]:
    """Decode one 2-D-coded line (shared by T.6 and T.4 ``/K > 0``)
    against the reference line's colour-change positions."""
    refs = ref + [columns, columns]
    cur: list[int] = []
    a0, color = -1, 0
    while a0 < columns:
        mode = _read_mode(br)
        if mode == "EOL":
            raise PdfError("unexpected EOL inside 2-D line")
        if mode == "P" or mode == "H":
            i = bisect_right(refs, a0)
            if (i & 1) != color:
                i += 1
            b2 = refs[i + 1] if i + 1 < len(refs) else columns
            if mode == "P":
                a0 = b2
            else:
                r1 = _read_run(br, color == 0)
                r2 = _read_run(br, color == 1)
                start = a0 if a0 >= 0 else 0
                a1 = start + r1
                a2 = a1 + r2
                cur.append(a1)
                cur.append(a2)
                a0 = a2
        else:
            i = bisect_right(refs, a0)
            if (i & 1) != color:
                i += 1
            b1 = refs[i] if i < len(refs) else columns
            a1 = b1 + _MODE_DELTA[mode]
            if a1 < 0 or a1 > columns:
                raise PdfError("2-D vertical offset out of range")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def _decode_1d_line(br: _BitReader, columns: int) -> list[int]:
    """Decode one 1-D MH line to colour-change positions."""
    cur: list[int] = []
    pos, white = 0, True
    while pos < columns:
        run = _read_run(br, white)
        pos += run
        cur.append(min(pos, columns))
        white = not white
    if pos != columns:
        raise PdfError("G3 line overruns declared columns")
    return cur


def decode_g4(
    data: bytes, columns: int, rows: int | None = None, black_is_1: bool = False
) -> bytes:
    """Decode a T.6 stream to packed 1-bpc samples, each row padded to
    a byte boundary (the sample layout §7.4.6 prescribes for image
    XObjects). ``black_is_1=False`` (the PDF default) packs black
    pixels as 0 bits. Stops after ``rows`` lines when given, else at
    EOFB / data exhaustion."""
    if columns <= 0:
        raise PdfError("G4 columns must be positive")
    br = _BitReader(data)
    ref: list[int] = []
    out = bytearray()
    n_rows = 0
    while rows is None or n_rows < rows:
        if rows is None and br.peek_eofb():
            break
        cur = _decode_2d_line(br, ref, columns)
        out += _pack_row(cur, columns, black_is_1)
        if len(out) > (256 << 20):  # decompression-bomb guard
            raise PdfError("g4 output exceeds decode cap")
        ref = [t for t in cur if t < columns]
        n_rows += 1
        if rows is None and br.n - br.pos < 1:
            break
    if rows is not None and br.peek_eofb():
        pass  # EOFB (or padding) after the declared rows — fine
    return bytes(out)
