"""Unit tests for the pure-Python PDF writer/parser core (SURVEY §5.2.1)."""

import pytest

from pdf_to_text_spark.core.pdfgen import build_pdf, page_content_stream
from pdf_to_text_spark.core.pdfparse import PdfError, extract_pdf_pages

LINES = ["Hello world line one", "Second (with parens) and \\backslash", "Third-line"]


@pytest.mark.parametrize("style", ["td", "tm", "tj_array", "shuffled", "tstar"])
@pytest.mark.parametrize("flate", [False, True])
def test_roundtrip_styles(style, flate):
    pdf = build_pdf([page_content_stream(LINES, style=style)], flate=flate)
    assert extract_pdf_pages(pdf) == ["\n".join(LINES)]


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
