"""K5 PPTX sink (basic variant): slide XML semantics + OPC container
consistency (zip, rels, content types, determinism)."""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import functions as F

from pdf_to_text_spark.functions.pptxsink import blueprint_to_slide_xml, pptx_package
from pdf_to_text_spark.operators.blueprint import text_to_blueprint

P_NS = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"

SAMPLE = (
    "# Deck & <Title>\n"
    "- alpha point\n"
    "- beta > point\n"
    "# Second slide\n"
    "- gamma\n"
    "# Bare heading"
)


def _slides_for(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        blueprint_to_slide_xml(text_to_blueprint(F.col("t"))).alias("s")
    ).collect()[0]["s"]


def test_slide_xml_semantics(spark):
    slides = _slides_for(spark, SAMPLE)
    assert len(slides) == 3
    for i, sx in enumerate(slides):
        root = ET.fromstring(sx)  # well-formed despite &/<> in source
        phs = [ph.get("type") for ph in root.iter(f"{P_NS}ph")]
        # O4 first-slide rule: ctrTitle on slide 0, title after
        assert phs[0] == ("ctrTitle" if i == 0 else "title")
    texts0 = [t.text for t in ET.fromstring(slides[0]).iter(f"{A_NS}t")]
    assert texts0 == ["Deck & <Title>", "alpha point", "beta > point"]
    # slide with no content points has no body placeholder
    assert 'type="body"' not in slides[2]


def test_pptx_package_consistent_and_deterministic(spark):
    df = spark.createDataFrame([(SAMPLE,), (SAMPLE,)], "t string")
    out = df.select(
        pptx_package(blueprint_to_slide_xml(text_to_blueprint(F.col("t")))).alias("p")
    ).collect()
    assert out[0]["p"] == out[1]["p"]
    z = zipfile.ZipFile(io.BytesIO(out[0]["p"]))
    assert z.testzip() is None
    names = set(z.namelist())
    # every part well-formed XML
    for n in names:
        ET.fromstring(z.read(n))
    # content types cover every slide part; rels resolve to real members
    ct = z.read("[Content_Types].xml").decode()
    for n in names:
        if n.startswith("ppt/slides/"):
            assert f'PartName="/{n}"' in ct
    rels = z.read("ppt/_rels/presentation.xml.rels").decode()
    for tgt in re.findall(r'Target="([^"]+)"', rels):
        assert f"ppt/{tgt}" in names, tgt
    # presentation sldIdLst references every slide rel id
    pres = z.read("ppt/presentation.xml").decode()
    rel_ids = set(re.findall(r'Id="(rId\d+)"', rels))
    for rid in re.findall(r'r:id="(rId\d+)"', pres):
        assert rid in rel_ids
    assert sum(1 for n in names if n.startswith("ppt/slides/")) == 3
