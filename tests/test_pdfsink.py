"""K3 PDF sink: Catalyst writer vs the python writer (byte identity)
and writer→parser roundtrip (text survives its own PDF)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pdf_to_text_spark.core.pdfgen import build_pdf, page_content_stream
from pdf_to_text_spark.core.pdfparse import extract_pdf_pages
from pdf_to_text_spark.functions.pdfsink import text_to_pdf


def _proj(s: str) -> str:
    return "".join(ch if 0x20 <= ord(ch) <= 0x7E else " " for ch in s)


def _expected_pdf(text: str) -> str:
    lines = [_proj(ln) for ln in text.split("\n")]
    return build_pdf([page_content_stream(lines, style="td")]).decode("latin-1")


CASES = [
    "hello world",
    "",
    "   ",
    "line one\nline two\nline three",
    "parens (nested (deep)) and \\backslash\\ mix",
    "a\n\n\nb",                      # blank lines preserved
    "unicode: café • bullet 中文",
    "ctrl\x02chars\x1fhere\ttab",
    ")",
    "\\",
    "trailing spaces   \nand more  ",
]


def test_catalyst_writer_matches_python_writer(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, t string")
    got = {r["i"]: r["pdf"] for r in df.select("i", text_to_pdf(F.col("t")).alias("pdf")).collect()}
    for i, s in enumerate(CASES):
        assert got[i] == _expected_pdf(s), (i, s)


def test_writer_parser_roundtrip(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, t string")
    got = {r["i"]: r["pdf"] for r in df.select("i", text_to_pdf(F.col("t")).alias("pdf")).collect()}
    for i, s in enumerate(CASES):
        pages = extract_pdf_pages(got[i].encode("latin-1"))
        assert pages == ["\n".join(_proj(ln) for ln in s.split("\n"))], (i, s)


def test_writer_fuzz_parity_and_roundtrip(spark):
    rng = random.Random(2027)
    alphabet = "ab (){}\\[]\t\x02é•:.,!?0123456789\n \n"
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80))) for _ in range(120)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, t string")
    got = {r["i"]: r["pdf"] for r in df.select("i", text_to_pdf(F.col("t")).alias("pdf")).collect()}
    for i, s in enumerate(cases):
        assert got[i] == _expected_pdf(s), (i, repr(s))
        pages = extract_pdf_pages(got[i].encode("latin-1"))
        assert pages == ["\n".join(_proj(ln) for ln in s.split("\n"))], (i, repr(s))
