"""F11 chart-string parse + F14 filename helpers — reference-parity
micro-cases (/root/reference/2_OpenCV_OCR/pptx_designer.py:131-157,
main.py:45,68-70)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_text_spark.functions import text as X


def _parse_one(spark, s: str):
    df = spark.createDataFrame([(s,)], "cs string")
    return df.select(X.parse_chart_string(F.col("cs")).alias("ch")).collect()[0]["ch"]


def test_chart_parse_reference_semantics(spark):
    ch = _parse_one(spark, "Sales 2024 , revenue, Q1: $1,200 , Q2: 3.5, skipme, Q3:abc")
    assert ch.title == "Sales 2024"
    assert ch.series == "revenue"
    # "$1,200" splits on the comma → point value "$1" → 1.0, then "200 "
    # has no colon → skipped (exactly what the reference's split(',') does)
    cats = [p.category for p in ch.points]
    vals = [p.value for p in ch.points]
    assert cats == ["Q1", "Q2", "Q3"]
    assert vals == [1.0, 3.5, 0.0]  # "abc" cleans to "" → float fails → 0.0


def test_chart_parse_multidot_and_first_colon(spark):
    ch = _parse_one(spark, "t, s, a:1.2.3, b:12:30")
    # "1.2.3" → float raises → 0.0 ; split on FIRST colon: "12:30"→"1230"
    assert [p.value for p in ch.points] == [0.0, 1230.0]


def test_chart_parse_too_few_parts_is_null(spark):
    assert _parse_one(spark, "only-title, series") is None


def test_filename_helpers(spark):
    df = spark.createDataFrame([("/data/in/srcA/my_doc-v2.PDF",)], "p string")
    row = df.select(
        X.file_ext(F.col("p")).alias("ext"),
        X.file_stem(F.col("p")).alias("stem"),
        X.rel_path(F.col("p"), "/data/in").alias("rel"),
        X.title_from_stem(X.file_stem(F.col("p"))).alias("title"),
    ).collect()[0]
    assert row.ext == "pdf"
    assert row.stem == "my_doc-v2"
    assert row.rel == "srcA/my_doc-v2.PDF"
    assert row.title == "My Doc V2"


def test_filename_helpers_no_extension(spark):
    df = spark.createDataFrame([("/x/README",)], "p string")
    row = df.select(
        X.file_ext(F.col("p")).alias("ext"), X.file_stem(F.col("p")).alias("stem")
    ).collect()[0]
    assert row.ext == ""
    assert row.stem == "README"


def test_chart_parse_fuzz_vs_reference_algorithm(spark):
    """300 seeded adversarial chart strings: the Catalyst parse must
    equal a pure-Python port of the reference's algorithm
    (pptx_designer.py:131-157) field-for-field. One Spark job total."""
    import random
    import re as _re

    def ref_parse(s):
        parts = s.split(",")
        if len(parts) < 3:
            return None
        out = []
        for part in parts[2:]:
            if ":" in part:
                label, value = part.split(":", 1)
                try:
                    v = float(_re.sub(r"[^0-9.]", "", value))
                except ValueError:
                    v = 0.0
                out.append((label.strip(), v))
        return (parts[0].strip(), parts[1].strip(), out)

    rng = random.Random(7)
    alphabet = "abz 09.:$%-•\t:."
    strings = []
    for i in range(300):
        n_parts = rng.randint(1, 8)
        parts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
                 for _ in range(n_parts)]
        strings.append(",".join(parts))
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, cs string")
    got = {
        r["i"]: r["ch"]
        for r in df.select("i", X.parse_chart_string(F.col("cs")).alias("ch")).collect()
    }
    for i, s in enumerate(strings):
        exp = ref_parse(s)
        g = got[i]
        if exp is None:
            assert g is None, (i, s)
            continue
        assert g is not None, (i, s)
        assert (g.title, g.series) == (exp[0], exp[1]), (i, s)
        assert [(p.category, p.value) for p in g.points] == exp[2], (i, s)


def test_is_topic_reference_semantics(spark):
    """P8: < 10 whitespace-separated words => topic
    (core_document_generator.py:270-274); Python str.split() parity on
    empties/blank runs."""
    cases = [
        "graph algorithms",                      # 2 words -> topic
        " ".join(f"w{i}" for i in range(9)),     # 9 -> topic
        " ".join(f"w{i}" for i in range(10)),    # 10 -> text
        "",                                      # 0 words -> topic
        "   \t  ",                               # blank -> 0 words -> topic
        "a\t b\n c  d\x0be f g h i j",           # mixed ws, 10 -> text
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: (r["n"], r["t"])
        for r in df.select(
            "i", X.token_count(F.col("s")).alias("n"), X.is_topic(F.col("s")).alias("t")
        ).collect()
    }
    for i, s in enumerate(cases):
        exp_n = len(s.split())
        assert got[i] == (exp_n, exp_n < 10), (i, s, got[i])


def test_image_tag_extract_and_render(spark):
    """F10 reference semantics (core_document_processing.py:348-357):
    case-insensitive re.search anywhere in the line, topic .strip()ped,
    tagged lines replaced wholesale by '🖼️ [PROMPT: X]', others
    untouched."""
    cases = [
        ("[Image of a red fox]", "a red fox", "🖼️ [PROMPT: a red fox]"),
        ("see [IMAGE OF spark shuffle] diagram", "spark shuffle", "🖼️ [PROMPT: spark shuffle]"),
        ("[image of  padded topic  ]", "padded topic", "🖼️ [PROMPT: padded topic]"),
        ("plain bullet line", "", "plain bullet line"),
        ("[Image of]", "", "[Image of]"),  # no topic group -> no match
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _, _) in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: (r["tag"], r["rendered"])
        for r in df.select(
            "i",
            X.extract_image_tag(F.col("s")).alias("tag"),
            X.render_image_placeholder(F.col("s")).alias("rendered"),
        ).collect()
    }
    for i, (s, tag, rendered) in enumerate(cases):
        assert got[i] == (tag, rendered), (i, s, got[i])
