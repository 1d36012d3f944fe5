"""K5 PPTX sink (basic variant): blueprint → PresentationML slides +
deterministic OPC container.

The reference ships four PPTX writers (plain lines
``ppt_formation.py:68-78``, heading-split
``core_document_processing.py:299-379``, markdown-levels, themed+charts
``pptx_designer.py:177-370``). This implements the structural core they
share — one slide per blueprint entry, title placeholder + one bullet
paragraph per content point, first slide on the title layout (O4,
``core_document_processing.py:314-326``) — as a pure-Catalyst
slide-XML builder (hash-checkable in DuckDB) plus an Arrow-UDF zip
packager mirroring ``functions.udfs.docx_package``. Theming/charts
remain out of scope (they are presentation styling, not data
processing). Packages are structurally valid OPC (zip + rels +
content types all consistent, pinned by tests); no Office install
exists here to certify rendering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NS = (
    ' xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    ' xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
)

SLIDE_XML_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    f"<p:sld{_NS}><p:cSld><p:spTree>"
    '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>'
    "<p:grpSpPr/>"
)
SLIDE_XML_TAIL = "</p:spTree></p:cSld></p:sld>"


from pdf_to_text_spark.operators.blueprint import _xml_escape  # noqa: E402 — one escape spec


def _sp(ph: Column, body: Column, *, shape_id: int, name: str) -> Column:
    return F.concat(
        F.lit(
            f'<p:sp><p:nvSpPr><p:cNvPr id="{shape_id}" name="{name}"/><p:cNvSpPr/>'
            "<p:nvPr><p:ph "
        ),
        ph,
        F.lit("/></p:nvPr></p:nvSpPr><p:spPr/><p:txBody><a:bodyPr/>"),
        body,
        F.lit("</p:txBody></p:sp>"),
    )


def slide_to_xml(slide: Column, slide_no: Column) -> Column:
    """One blueprint entry → a complete ``slideN.xml`` string.

    Slide 0 uses the title placeholder (``type="ctrTitle"`` on the
    title layout), later slides ``type="title"`` — the O4 first-slide
    rule. Each content point is one ``<a:p>`` bullet paragraph."""
    title_ph = F.when(slide_no == 0, F.lit('type="ctrTitle"')).otherwise(F.lit('type="title"'))
    title_body = F.concat(
        F.lit("<a:p><a:r><a:t>"), _xml_escape(slide["title"]), F.lit("</a:t></a:r></a:p>")
    )
    points = F.array_join(
        F.transform(
            slide["content"],
            lambda pt: F.concat(
                F.lit("<a:p><a:r><a:t>"), _xml_escape(pt), F.lit("</a:t></a:r></a:p>")
            ),
        ),
        "",
    )
    body_sp = F.when(
        F.size(slide["content"]) > 0,
        _sp(F.lit('type="body" idx="1"'), points, shape_id=3, name="Content"),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(SLIDE_XML_HEAD),
        _sp(title_ph, title_body, shape_id=2, name="Title"),
        body_sp,
        F.lit(SLIDE_XML_TAIL),
    ).alias("slide_xml")


def blueprint_to_slide_xml(bp: Column) -> Column:
    """Blueprint array → array of slide-XML strings (explode for the
    per-slide frame)."""
    return F.transform(bp, lambda s, i: slide_to_xml(s, i))


# ---------------------------------------------------------- OPC container

_CT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    '<Override PartName="/ppt/slideMasters/slideMaster1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.slideMaster+xml"/>'
    '<Override PartName="/ppt/slideLayouts/slideLayout1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.slideLayout+xml"/>'
    '<Override PartName="/ppt/theme/theme1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.theme+xml"/>'
)
_SLIDE_CT = (
    '<Override PartName="/ppt/slides/slide{n}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"'
    ' Target="ppt/presentation.xml"/>'
    "</Relationships>"
)
_MASTER_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    f"<p:sldMaster{_NS}><p:cSld><p:spTree>"
    '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>'
    "<p:grpSpPr/></p:spTree></p:cSld>"
    '<p:clrMap bg1="lt1" tx1="dk1" bg2="lt2" tx2="dk2" accent1="accent1"'
    ' accent2="accent2" accent3="accent3" accent4="accent4" accent5="accent5"'
    ' accent6="accent6" hlink="hlink" folHlink="folHlink"/>'
    '<p:sldLayoutIdLst><p:sldLayoutId id="2147483649" r:id="rId1"/></p:sldLayoutIdLst>'
    "</p:sldMaster>"
)
_MASTER_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slideLayout"'
    ' Target="../slideLayouts/slideLayout1.xml"/>'
    '<Relationship Id="rId2" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/theme"'
    ' Target="../theme/theme1.xml"/>'
    "</Relationships>"
)
_LAYOUT_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    f'<p:sldLayout{_NS} type="title"><p:cSld><p:spTree>'
    '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>'
    "<p:grpSpPr/></p:spTree></p:cSld></p:sldLayout>"
)
_LAYOUT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slideMaster"'
    ' Target="../slideMasters/slideMaster1.xml"/>'
    "</Relationships>"
)
_THEME_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<a:theme xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    ' name="Office"><a:themeElements><a:clrScheme name="Office">'
    "<a:dk1><a:sysClr val=\"windowText\" lastClr=\"000000\"/></a:dk1>"
    "<a:lt1><a:sysClr val=\"window\" lastClr=\"FFFFFF\"/></a:lt1>"
    '<a:dk2><a:srgbClr val="44546A"/></a:dk2><a:lt2><a:srgbClr val="E7E6E6"/></a:lt2>'
    '<a:accent1><a:srgbClr val="4472C4"/></a:accent1>'
    '<a:accent2><a:srgbClr val="ED7D31"/></a:accent2>'
    '<a:accent3><a:srgbClr val="A5A5A5"/></a:accent3>'
    '<a:accent4><a:srgbClr val="FFC000"/></a:accent4>'
    '<a:accent5><a:srgbClr val="5B9BD5"/></a:accent5>'
    '<a:accent6><a:srgbClr val="70AD47"/></a:accent6>'
    '<a:hlink><a:srgbClr val="0563C1"/></a:hlink>'
    '<a:folHlink><a:srgbClr val="954F72"/></a:folHlink></a:clrScheme>'
    '<a:fontScheme name="Office"><a:majorFont><a:latin typeface="Calibri Light"/>'
    '<a:ea typeface=""/><a:cs typeface=""/></a:majorFont>'
    '<a:minorFont><a:latin typeface="Calibri"/><a:ea typeface=""/>'
    '<a:cs typeface=""/></a:minorFont></a:fontScheme>'
    '<a:fmtScheme name="Office"><a:fillStyleLst>'
    '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
    '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
    '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:fillStyleLst>'
    '<a:lnStyleLst><a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln>'
    '<a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln>'
    '<a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln></a:lnStyleLst>'
    "<a:effectStyleLst><a:effectStyle><a:effectLst/></a:effectStyle>"
    "<a:effectStyle><a:effectLst/></a:effectStyle>"
    "<a:effectStyle><a:effectLst/></a:effectStyle></a:effectStyleLst>"
    '<a:bgFillStyleLst><a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
    '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
    '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:bgFillStyleLst>'
    "</a:fmtScheme></a:themeElements></a:theme>"
)


def _presentation_xml(n_slides: int) -> str:
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{2 + i}"/>' for i in range(n_slides)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f"<p:presentation{_NS}>"
        '<p:sldMasterIdLst><p:sldMasterId id="2147483648" r:id="rId1"/></p:sldMasterIdLst>'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst>"
        '<p:sldSz cx="9144000" cy="6858000"/><p:notesSz cx="6858000" cy="9144000"/>'
        "</p:presentation>"
    )


def _presentation_rels(n_slides: int) -> str:
    rels = (
        '<Relationship Id="rId1" Type='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slideMaster"'
        ' Target="slideMasters/slideMaster1.xml"/>'
    )
    for i in range(n_slides):
        rels += (
            f'<Relationship Id="rId{2 + i}" Type='
            '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide"'
            f' Target="slides/slide{i + 1}.xml"/>'
        )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rels}</Relationships>"
    )


@F.pandas_udf(T.BinaryType())
def pptx_package(slide_xmls: pd.Series) -> pd.Series:
    """``array<string>`` of slide XMLs → one deterministic .pptx
    (shared ``functions.udfs.opc_zip`` container contract)."""
    from pdf_to_text_spark.functions.udfs import opc_zip

    def pack(slides) -> bytes | None:
        if slides is None:
            return None
        slides = list(slides)
        n = len(slides)
        ct = (
            _CT_HEAD
            + "".join(_SLIDE_CT.format(n=i + 1) for i in range(n))
            + "</Types>"
        )
        members: list[tuple[str, str]] = [
            ("[Content_Types].xml", ct),
            ("_rels/.rels", _ROOT_RELS),
            ("ppt/presentation.xml", _presentation_xml(n)),
            ("ppt/_rels/presentation.xml.rels", _presentation_rels(n)),
            ("ppt/slideMasters/slideMaster1.xml", _MASTER_XML),
            ("ppt/slideMasters/_rels/slideMaster1.xml.rels", _MASTER_RELS),
            ("ppt/slideLayouts/slideLayout1.xml", _LAYOUT_XML),
            ("ppt/slideLayouts/_rels/slideLayout1.xml.rels", _LAYOUT_RELS),
            ("ppt/theme/theme1.xml", _THEME_XML),
        ]
        members += [(f"ppt/slides/slide{i + 1}.xml", s) for i, s in enumerate(slides)]
        return opc_zip(members)

    return slide_xmls.map(pack)
