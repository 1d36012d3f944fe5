"""K4 DOCX sink: WordprocessingML builder + OPC zip container —
well-formedness, reference create_docx semantics
(core_document_generator.py:380-413), deterministic packaging."""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import functions as F

from pdf_to_text_spark.functions.udfs import docx_package
from pdf_to_text_spark.operators.blueprint import (
    blueprint_to_docx_xml,
    text_to_blueprint,
)

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

SAMPLE = (
    "# Intro & <Overview>\n"
    "- first point\n"
    "- second > point\n"
    "# Details\n"
    "- only point\n"
    "# Empty section"
)


def _xml_for(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        blueprint_to_docx_xml(text_to_blueprint(F.col("t"))).alias("x")
    ).collect()[0]["x"]


def test_docx_xml_reference_semantics(spark):
    x = _xml_for(spark, SAMPLE)
    root = ET.fromstring(x)  # well-formed despite &/<> in source text
    body = root.find(f"{W_NS}body")
    paras = body.findall(f"{W_NS}p")
    styles = [
        p.find(f"{W_NS}pPr/{W_NS}pStyle").get(f"{W_NS}val")
        for p in paras
        if p.find(f"{W_NS}pPr/{W_NS}pStyle") is not None
    ]
    # slide 0 -> Heading1, later slides -> Heading2; bullets ListBullet
    assert styles == [
        "Heading1", "ListBullet", "ListBullet",
        "Heading2", "ListBullet",
        "Heading2",
    ]
    texts = [t.text or "" for t in body.iter(f"{W_NS}t")]
    assert texts[0] == "Intro & <Overview>"   # escaping round-trips
    assert texts[1] == "first point"          # bullet marker stripped
    # page break between slides, none after the last
    breaks = [b for b in body.iter(f"{W_NS}br") if b.get(f"{W_NS}type") == "page"]
    assert len(breaks) == 2


def test_docx_package_valid_and_deterministic(spark):
    df = spark.createDataFrame([(SAMPLE,), (SAMPLE,)], "t string")
    out = df.select(
        blueprint_to_docx_xml(text_to_blueprint(F.col("t"))).alias("x")
    ).select(F.col("x"), docx_package(F.col("x")).alias("d")).collect()
    assert out[0]["d"] == out[1]["d"]  # equal input -> byte-equal .docx
    z = zipfile.ZipFile(io.BytesIO(out[0]["d"]))
    assert z.namelist() == ["[Content_Types].xml", "_rels/.rels", "word/document.xml"]
    assert z.testzip() is None  # CRCs valid
    assert z.read("word/document.xml").decode() == out[0]["x"]
    for zi in z.infolist():
        assert zi.date_time == (1980, 1, 1, 0, 0, 0)
        assert zi.compress_type == zipfile.ZIP_STORED
