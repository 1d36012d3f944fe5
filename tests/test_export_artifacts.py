"""Artifact-export job: all five formats render from an extracted
table in ONE shuffle-free projection, and each artifact is valid."""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

from jobs.export_artifacts_job import FORMATS, build_artifacts
from pdf_to_text_spark.core.pdfparse import extract_pdf_pages
from pdf_to_text_spark.core.raster import ocr_expected, ocr_png


def test_export_all_formats_valid(spark):
    df = spark.createDataFrame(
        [
            ("u1", "# Title One\n- point a\n- point b\n# Part Two\n- more"),
            ("u2", "plain text, no headings"),
        ],
        "url string, extracted_text string",
    )
    out = build_artifacts(df, "extracted_text", "url", list(FORMATS))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    rows = {r["url"]: r for r in out.collect()}
    r = rows["u1"]
    # pdf parses back through the engine's own parser
    assert extract_pdf_pages(bytes(r["pdf"]))[0].startswith("# Title One")
    # docx: valid zip, well-formed document part
    zd = zipfile.ZipFile(io.BytesIO(r["docx"]))
    assert zd.testzip() is None
    ET.fromstring(zd.read("word/document.xml"))
    # pptx: valid zip, one slide part per blueprint section
    zp = zipfile.ZipFile(io.BytesIO(r["pptx"]))
    assert zp.testzip() is None
    assert sum(1 for n in zp.namelist() if n.startswith("ppt/slides/")) == 2
    # md report format
    assert r["md"].startswith("# Presentation Content Report\n\n## Title One\n")
    # png round-trips through OCR
    assert ocr_png(bytes(r["png"])) == ocr_expected(
        "# Title One\n- point a\n- point b\n# Part Two\n- more"
    )
    # headingless text still renders every format
    assert rows["u2"]["pdf"] is not None and rows["u2"]["png"] is not None
