"""Unit tests for the pure-Python PDF writer/parser core (SURVEY §5.2.1)."""

import pytest

from pdf_to_text_spark.core.pdfgen import build_pdf, page_content_stream
from pdf_to_text_spark.core.pdfparse import PdfError, extract_pdf_pages

LINES = ["Hello world line one", "Second (with parens) and \\backslash", "Third-line"]


@pytest.mark.parametrize("style", ["td", "tm", "tj_array", "shuffled", "tstar", "hex"])
@pytest.mark.parametrize("flate", [False, True])
def test_roundtrip_styles(style, flate):
    pdf = build_pdf([page_content_stream(LINES, style=style)], flate=flate)
    assert extract_pdf_pages(pdf) == ["\n".join(LINES)]


def test_widened_subset_nested_tree_filter_array_hex():
    """Round-4 widened subset, all features at once: nested /Kids tree,
    /Filter [/FlateDecode] array form, hex-string Tj, inline BDC dict —
    page order is the depth-first /Kids walk."""
    pages = [
        page_content_stream([f"page {i} line a", f"page {i} line b"], style="hex")
        for i in range(5)
    ]
    pdf = build_pdf(pages, filter_array=True, nested=True)
    assert b"/Filter [/FlateDecode]" in pdf
    got = extract_pdf_pages(pdf)
    assert got == [f"page {i} line a\npage {i} line b" for i in range(5)]


def test_hex_string_oddity_and_whitespace():
    """Hex strings: embedded whitespace is legal, odd length pads a
    trailing zero nibble (PDF 32000 §7.3.4.3)."""
    content = b"BT /F1 12 Tf 72 700 Td <48 65\n6C6C 6F2> Tj ET"  # 'Hello' + 0x20
    assert extract_pdf_pages(build_pdf([content])) == ["Hello "]


def test_widened_errors_stay_pdferror():
    good = build_pdf([page_content_stream(LINES)], flate=True)
    # unsupported filter name → subset boundary, not a crash
    with pytest.raises(PdfError, match="unsupported stream filter"):
        extract_pdf_pages(good.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode"))
    with pytest.raises(PdfError, match="unsupported stream filter"):
        extract_pdf_pages(
            good.replace(b"/Filter /FlateDecode", b"/Filter [/ASCIIHexDecode /FlateDecode]")
        )
    # page-tree cycle and unterminated constructs → PdfError
    single = build_pdf([page_content_stream(LINES)])
    with pytest.raises(PdfError, match="cycle"):
        extract_pdf_pages(single.replace(b"/Kids [3 0 R]", b"/Kids [2 0 R]"))
    with pytest.raises(PdfError, match="unterminated hex"):
        extract_pdf_pages(build_pdf([b"BT <48656C ET"]))
    with pytest.raises(PdfError, match="unterminated inline"):
        extract_pdf_pages(build_pdf([b"BT /Span << /A (b) BDC ET"]))


def test_multi_page_order_and_empty_page():
    pdf = build_pdf([page_content_stream(["p1"]), b"", page_content_stream(["p3"])])
    assert extract_pdf_pages(pdf) == ["p1", "", "p3"]


def test_shuffled_ops_reading_order():
    """Out-of-order emission must reconstruct top-to-bottom order (north rule)."""
    lines = [f"line {i}" for i in range(8)]
    pdf = build_pdf([page_content_stream(lines, style="shuffled")])
    assert extract_pdf_pages(pdf) == ["\n".join(lines)]


def test_same_line_x_order():
    """Two runs at one y join left-to-right regardless of emit order."""
    content = b"BT /F1 12 Tf 1 0 0 1 200 700 Tm (right) Tj 1 0 0 1 72 700 Tm (left ) Tj ET"
    pdf = build_pdf([content])
    assert extract_pdf_pages(pdf) == ["left right"]


def test_escapes_and_octal():
    content = rb"BT /F1 12 Tf 72 700 Td (a\(b\)c \\ d \101 e\n) Tj ET"
    pdf = build_pdf([content])
    # the escaped \n stays embedded in the run (normalization handles it later)
    assert extract_pdf_pages(pdf) == ["a(b)c \\ d A e\n"]


def test_errors_raise_pdferror():
    with pytest.raises(PdfError):
        extract_pdf_pages(b"%PDF-1.4\nno objects here")
    with pytest.raises(PdfError):
        extract_pdf_pages(b"not a pdf at all")
