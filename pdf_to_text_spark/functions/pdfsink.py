"""K3 PDF sink — text → complete PDF document, pure Catalyst.

The reference exports extracted text back to PDF
(``/root/reference/2_OpenCV_OCR/ppt_formation.py:51-60`` FPDF
``multi_cell``; ``final_output_generator.py:11-19`` reportlab). This is
the Spark-native equivalent: a column expression that renders
``extracted_text`` into a byte-exact minimal PDF (the same frozen
subset ``core/pdfgen.py`` emits and ``core/pdfparse.py`` reads), so the
sink is just ``df.select(url, text_to_pdf(text).cast("binary"))`` +
any writer — no UDF, no driver loop, JVM-side end to end.

Layout spec (== ``core.pdfgen.build_pdf([page_content_stream(lines,
style="td")])``): one page, Helvetica 12, first line at (72, 720),
-14pt leading via relative TD moves, single xref, no compression.
Text is ASCII-projected (codepoints outside 0x20-0x7E become spaces —
the reference's FPDF sink is latin-1-bound the same way) and
PDF-string-escaped. Tests pin byte-identity against ``core/pdfgen``
and a writer→parser roundtrip through ``core/pdfparse``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PDF_HEADER = "%PDF-1.4\n"


def _lit(s: str) -> Column:
    return F.lit(s)


def _esc(c: Column) -> Column:
    """ASCII-project then PDF-string-escape one text line.

    Order matters: backslashes first, then parens (else the escapes
    themselves get re-escaped). Literal ``F.replace``, not regex — the
    replacement text contains characters Java regex replacement would
    interpret.
    """
    c = F.regexp_replace(c, r"[^\x20-\x7e]", " ")
    c = F.replace(c, _lit("\\"), _lit("\\\\"))
    c = F.replace(c, _lit("("), _lit("\\("))
    return F.replace(c, _lit(")"), _lit("\\)"))


def _obj_body(num: int, inner: Column) -> Column:
    return F.concat(_lit(f"{num} 0 obj\n"), inner, _lit("\nendobj\n"))


def text_to_pdf(c: Column) -> Column:
    """Render a text column into a complete single-page PDF (string;
    ``.cast("binary")`` for a bytes sink column). All-ASCII output, so
    char offsets == byte offsets in the xref table."""
    shows = F.transform(
        F.split(c, "\n"), lambda ln: F.concat(_lit("("), _esc(ln), _lit(") Tj"))
    )
    content = F.concat(
        _lit("BT\n/F1 12 Tf\n72 720 Td\n"),
        F.array_join(shows, "\n0 -14 TD\n"),
        _lit("\nET"),
    )
    length_s = F.length(content).cast("string")

    b1 = _obj_body(1, _lit("<< /Type /Catalog /Pages 2 0 R >>"))
    b2 = _obj_body(2, _lit("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    b3 = _obj_body(
        3,
        _lit(
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ),
    )
    b4 = _obj_body(
        4,
        F.concat(
            _lit("<< /Length "), length_s, _lit(" >>\nstream\n"), content, _lit("\nendstream")
        ),
    )
    b5 = _obj_body(5, _lit("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))

    o1 = F.lit(len(PDF_HEADER))
    o2 = o1 + F.length(b1)
    o3 = o2 + F.length(b2)
    o4 = o3 + F.length(b3)
    o5 = o4 + F.length(b4)
    xref_off = o5 + F.length(b5)

    def entry(off: Column) -> Column:
        return F.concat(F.lpad(off.cast("string"), 10, "0"), _lit(" 00000 n \n"))

    xref = F.concat(
        _lit("xref\n0 6\n0000000000 65535 f \n"),
        entry(o1), entry(o2), entry(o3), entry(o4), entry(o5),
        _lit("trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"),
        xref_off.cast("string"),
        _lit("\n%%EOF\n"),
    )
    return F.concat(_lit(PDF_HEADER), b1, b2, b3, b4, b5, xref)
