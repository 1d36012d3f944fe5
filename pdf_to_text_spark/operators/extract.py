"""Extraction operators: content-type routing + Arrow-batched parse UDFs.

Spark-first re-expression of the reference's per-file pipeline
(``/root/reference/2_OpenCV_OCR/main.py:86-127``,
``core_document_processing.py:45-89``):

- routing is pure Catalyst (magic bytes / text-layer sniff, SURVEY P3) —
  the ``F.when`` ladder, no UDF;
- parsing is the ONLY Python: scalar Arrow-batched pandas UDFs that call
  the frozen core spec (``core.pdfparse`` / ``core.htmlextract``), so
  UDF output is byte-identical to the sequential oracle by construction;
- all normalization is the Catalyst chain (``functions.text``);
- the doc-level result needs NO shuffle: the PDF UDF returns the ordered
  page array and reassembly is ``array_join(transform(...))`` — at 100 TB
  the extraction stage is embarrassingly parallel (scan → project →
  write), which is what makes ≥0.8 scaling efficiency attainable.

Per-row ``extract_ms`` is measured inside the UDF batch loop and feeds
the per-partition lineage table (north rule).
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes
from pdf_to_text_spark.core.pdfparse import extract_pdf_pages_safe
from pdf_to_text_spark.functions.text import normalize_extracted, text_layer_sufficient

ROUTE_TEXT, ROUTE_PDF, ROUTE_HTML, ROUTE_ERROR = "text_layer", "pdf", "html", "error"

_SNIFF_WINDOW = 32  # bytes; frozen spec, mirrored in fixtures.oracle_extract

_PDF_RESULT = T.StructType(
    [
        T.StructField("pages", T.ArrayType(T.StringType())),
        T.StructField("error", T.StringType()),
        T.StructField("ms", T.DoubleType()),
    ]
)

_HTML_RESULT = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("ms", T.DoubleType()),
    ]
)


def _html_main_safe(data: bytes) -> tuple[str | None, str | None]:
    """Row-level error tolerance for the HTML branch (same contract as
    ``extract_pdf_pages_safe``): never raises."""
    try:
        return extract_main_content_bytes(data), None
    except Exception as e:  # noqa: BLE001 — row-level tolerance by design
        return None, f"unexpected:{type(e).__name__}"


def make_pdf_pages_udf(password: bytes | str = b"", ocr_scanned: bool = False):
    """binary → (ordered page texts, error, parse-ms). SURVEY M1/M2/M5:
    deterministic text-object decode replaces rasterize+OCR. Errors
    (including unexpected exceptions on malformed-but-magic-valid input)
    become rows, never task failures. ``password`` is the user password
    applied to every encrypted document in the frame (round-5 item 6) —
    wrong or missing passwords stay disclosed error rows.
    ``ocr_scanned`` enables the scanned-page fallback (round 5,
    ``core.scanocr``): pages with no text layer that paint a readable
    image OCR via the frozen raster; default OFF = goldens unchanged."""
    if ocr_scanned:
        from pdf_to_text_spark.core.scanocr import ocr_scanned_images as _hook
    else:
        _hook = None

    @F.pandas_udf(_PDF_RESULT)
    def pdf_pages_udf(html: pd.Series) -> pd.DataFrame:
        pages_out, err_out, ms_out = [], [], []
        for data in html:
            t0 = time.perf_counter()
            pages, err = extract_pdf_pages_safe(bytes(data), password, _hook)
            pages_out.append(pages)
            err_out.append(err)
            ms_out.append((time.perf_counter() - t0) * 1000.0)
        return pd.DataFrame({"pages": pages_out, "error": err_out, "ms": ms_out})

    return pdf_pages_udf


pdf_pages_udf = make_pdf_pages_udf()


@F.pandas_udf(_HTML_RESULT)
def html_main_udf(html: pd.Series) -> pd.DataFrame:
    """binary → (raw main-content blocks, error, parse-ms). North-rule
    DOM text-density/link-density boilerplate strip (core.htmlextract)."""
    out, err_out, ms_out = [], [], []
    for data in html:
        t0 = time.perf_counter()
        content, err = _html_main_safe(bytes(data))
        out.append(content)
        err_out.append(err)
        ms_out.append((time.perf_counter() - t0) * 1000.0)
    return pd.DataFrame({"content": out, "error": err_out, "ms": ms_out})


def _is_empty(html: Column) -> Column:
    return html.isNull() | (F.octet_length(html) == 0)


def _is_pdf_magic(html: Column) -> Column:
    return F.substring(html, 1, 5) == F.lit(b"%PDF-")


# bytes.lstrip()'s whitespace set — the Python routers (fused UDF,
# fixtures oracle) lstrip raw BYTES, which never strips U+00A0, so the
# Catalyst sniff must not either (WS_A includes \xa0 and would diverge
# on a latin-1 NBSP-leading payload)
_WS_SNIFF = " \t\n\r\x0b\f"


def _is_html_magic(html: Column) -> Column:
    prefix = F.decode(F.substring(html, 1, _SNIFF_WINDOW), "ISO-8859-1")
    return F.substring(F.regexp_replace(prefix, f"^[{_WS_SNIFF}]+", ""), 1, 1) == "<"


def sniff_route(html: Column, text: Column, threshold: int = 250) -> Column:
    """P3 routing ladder, pure Catalyst. Order is frozen spec:
    text-layer fast path → empty guard → %PDF- magic → '<' within a
    32-byte lstripped window → error."""
    return (
        F.when(text_layer_sufficient(text, threshold), ROUTE_TEXT)
        .when(_is_empty(html), ROUTE_ERROR)
        .when(_is_pdf_magic(html), ROUTE_PDF)
        .when(_is_html_magic(html), ROUTE_HTML)
        .otherwise(ROUTE_ERROR)
    )


def _assemble_pdf_doc(r: Column) -> Column:
    """Ordered page array → normalized doc text, shuffle-free (A5)."""
    pages_norm = F.transform(r["pages"], lambda p: normalize_extracted(p))
    return normalize_extracted(F.array_join(pages_norm, "\n\n"))


def extract_documents(
    pages_df: DataFrame,
    threshold: int = 250,
    pdf_password: bytes | str = b"",
    ocr_scanned: bool = False,
) -> DataFrame:
    """The headline operator: pages table → (url, extracted_text, error,
    route, bytes_in, extract_ms).

    Branch-filtered sub-frames + ``unionByName`` so each UDF only sees
    its own rows (SURVEY §4.1: the reference's cost-based routing).
    The branch predicates are spelled out (not ``route == x`` over the
    when-ladder) so Catalyst prunes ``html`` entirely from the
    text-layer branch's parquet scan — verified via ReadSchema in
    tests/test_plans.py.
    """
    suff = text_layer_sufficient(F.col("text"), threshold)
    empty = _is_empty(F.col("html"))
    pdfm = _is_pdf_magic(F.col("html"))
    htmlm = _is_html_magic(F.col("html"))
    routed = pages_df
    bytes_in = F.coalesce(F.octet_length("html"), F.lit(0)).alias("bytes_in")

    text_b = routed.filter(suff).select(
        "url",
        normalize_extracted(F.col("text")).alias("extracted_text"),
        F.lit(None).cast("string").alias("error"),
        F.lit(ROUTE_TEXT).alias("route"),
        F.lit(0).alias("bytes_in"),  # html never read on the fast path
        F.lit(0.0).alias("extract_ms"),
    )

    pdf_udf = (
        pdf_pages_udf
        if not pdf_password and not ocr_scanned
        else make_pdf_pages_udf(pdf_password, ocr_scanned)
    )
    pdf_b = (
        routed.filter(~suff & ~empty & pdfm)
        .withColumn("r", pdf_udf("html"))
        .select(
            "url",
            F.when(F.col("r.error").isNotNull(), F.lit(None).cast("string"))
            .otherwise(_assemble_pdf_doc(F.col("r")))
            .alias("extracted_text"),
            F.when(F.col("r.error").isNotNull(), F.concat(F.lit("pdf:"), F.col("r.error")))
            .alias("error"),
            F.lit(ROUTE_PDF).alias("route"),
            bytes_in,
            F.col("r.ms").alias("extract_ms"),
        )
    )

    html_b = (
        routed.filter(~suff & ~empty & ~pdfm & htmlm)
        .withColumn("r", html_main_udf("html"))
        .select(
            "url",
            F.when(F.col("r.error").isNotNull(), F.lit(None).cast("string"))
            .otherwise(normalize_extracted(F.col("r.content")))
            .alias("extracted_text"),
            F.when(F.col("r.error").isNotNull(), F.concat(F.lit("html:"), F.col("r.error")))
            .alias("error"),
            F.lit(ROUTE_HTML).alias("route"),
            bytes_in,
            F.col("r.ms").alias("extract_ms"),
        )
    )

    err_b = routed.filter(~suff & (empty | (~pdfm & ~htmlm))).select(
        "url",
        F.lit(None).cast("string").alias("extracted_text"),
        F.when(empty, "empty_payload").otherwise("unknown_format").alias("error"),
        F.lit(ROUTE_ERROR).alias("route"),
        bytes_in,
        F.lit(0.0).alias("extract_ms"),
    )

    return text_b.unionByName(pdf_b).unionByName(html_b).unionByName(err_b)


# internal page sentinel — guaranteed absent from page text because
# extract_pdf_pages strips \x02 as part of the frozen spec (a PDF string
# could otherwise inject it via an octal escape)
PAGE_SEP = "\x02"

_FUSED_RESULT = T.StructType(
    [
        T.StructField("raw", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("route", T.StringType()),
        T.StructField("ms", T.DoubleType()),
    ]
)


def make_parse_any_udf(password: bytes | str = b"", ocr_scanned: bool = False):
    """Single-pass routed parse (SURVEY §7.2 decision record: adopted
    after profiling showed the 4-branch union re-reading the shuffled
    input 4×). Routing logic is the same frozen spec as ``sniff_route``;
    PDF pages are joined on PAGE_SEP so normalization can stay Catalyst.
    ``password`` is threaded to the PDF decryptor (round-5 item 6);
    ``ocr_scanned`` enables the scanned-page OCR fallback
    (``core.scanocr``, default OFF = goldens unchanged)."""
    if ocr_scanned:
        from pdf_to_text_spark.core.scanocr import ocr_scanned_images as _hook
    else:
        _hook = None

    @F.pandas_udf(_FUSED_RESULT)
    def parse_any_udf(html: pd.Series, text: pd.Series) -> pd.DataFrame:
        from pdf_to_text_spark.core.textnorm import text_layer_sufficient as _suff

        raws, errs, routes, mss = [], [], [], []
        for h, t in zip(html, text):
            t0 = time.perf_counter()
            raw = err = None
            if _suff(t):
                raw, route = t, ROUTE_TEXT
            else:
                data = bytes(h) if h is not None else b""
                if not data:
                    err, route = "empty_payload", ROUTE_ERROR
                elif data.startswith(b"%PDF-"):
                    route = ROUTE_PDF
                    pages, perr = extract_pdf_pages_safe(data, password, _hook)
                    if perr is not None:
                        err = f"pdf:{perr}"
                    else:
                        raw = PAGE_SEP.join(pages)
                elif data[:32].lstrip()[:1] == b"<":
                    route = ROUTE_HTML
                    raw, herr = _html_main_safe(data)
                    if herr is not None:
                        err = f"html:{herr}"
                else:
                    err, route = "unknown_format", ROUTE_ERROR
            raws.append(raw)
            errs.append(err)
            routes.append(route)
            mss.append((time.perf_counter() - t0) * 1000.0)
        return pd.DataFrame({"raw": raws, "error": errs, "route": routes, "ms": mss})

    return parse_any_udf


parse_any_udf = make_parse_any_udf()


def extract_documents_fused(
    pages_df: DataFrame,
    threshold: int = 250,
    pdf_password: bytes | str = b"",
    ocr_scanned: bool = False,
) -> DataFrame:
    """Fused single-UDF-stage variant of ``extract_documents`` — same
    output, byte-identical (tests pin equality to the goldens).

    Tradeoff vs the branch-filtered variant: one pass over the shuffled
    input (4× less shuffle read, 4× fewer tasks) but the ``html`` column
    is read for every row — on tables where most rows take the
    text-layer fast path, prefer ``extract_documents`` (column pruning);
    on parse-heavy crawl tables this one wins. ``threshold`` is fixed at
    250 here (the frozen spec) — the pure-Python router has it baked in.
    """
    if threshold != 250:
        raise ValueError("fused variant pins the frozen-spec threshold (250)")
    fused_udf = (
        parse_any_udf
        if not pdf_password and not ocr_scanned
        else make_parse_any_udf(pdf_password, ocr_scanned)
    )
    parsed = pages_df.withColumn("r", fused_udf("html", "text"))
    r = F.col("r")
    pages_arr = F.split(r["raw"], PAGE_SEP)
    pdf_doc = normalize_extracted(
        F.array_join(F.transform(pages_arr, lambda p: normalize_extracted(p)), "\n\n")
    )
    extracted = (
        F.when(r["error"].isNotNull() | (r["route"] == ROUTE_ERROR), F.lit(None).cast("string"))
        .when(r["route"] == ROUTE_PDF, pdf_doc)
        .otherwise(normalize_extracted(r["raw"]))
    )
    return parsed.select(
        "url",
        extracted.alias("extracted_text"),
        r["error"].alias("error"),
        r["route"].alias("route"),
        F.when(r["route"] == ROUTE_TEXT, F.lit(0))
        .otherwise(F.coalesce(F.octet_length("html"), F.lit(0)))
        .alias("bytes_in"),
        r["ms"].alias("extract_ms"),
    )


def extract_pdf_page_table(
    pages_df: DataFrame, ocr_scanned: bool = False
) -> DataFrame:
    """Per-page table for the PDF branch: (url, page_num, page_text) —
    the golden_pages contract (analog of the reference's per-page
    ``3_Extracted_Texts/*/page_N.txt`` files). Uses posexplode (M1/O2);
    empty pages are preserved as empty strings. ``ocr_scanned`` enables
    the opt-in scanned-page fallback (SPEC v1.2 item 4)."""
    routed = pages_df.withColumn("route", sniff_route(F.col("html"), F.col("text")))
    page_udf = pdf_pages_udf if not ocr_scanned else make_pdf_pages_udf(b"", True)
    return (
        routed.filter(F.col("route") == ROUTE_PDF)
        .withColumn("r", page_udf("html"))
        .filter(F.col("r.error").isNull())
        .select("url", F.posexplode("r.pages").alias("pos", "page_text_raw"))
        .select(
            "url",
            (F.col("pos") + 1).alias("page_num"),
            normalize_extracted(F.col("page_text_raw")).alias("page_text"),
        )
    )


def reassemble_documents(
    page_df: DataFrame,
    order: str = "numeric",
    header_fmt: str = "\n\n---- {name} ----\n\n",
    separator: str = "\n" + "=" * 50 + "\n",
) -> DataFrame:
    """A4/A5: per-document ordered concat of page texts with headers —
    the reference's ``combine_texts.py:17-30`` (lexicographic) and
    ``core_document_generator.py:185-187`` (numeric) variants, one
    parameterized operator.

    Input: (url, page_num, page_text). Output: (url, combined_text).
    One shuffle on url; map-side partial aggregation applies since
    collect_list is partial-izable.
    """
    if order == "lexicographic":
        # page_10 sorts before page_2 — the reference's quirk, preserved
        sort_key = F.concat(F.lit("page_"), F.col("page_num").cast("string"))
    elif order == "numeric":
        sort_key = F.lpad(F.col("page_num").cast("string"), 9, "0")
    else:
        raise ValueError(order)
    named = F.struct(
        sort_key.alias("k"),
        F.concat(F.lit("page_"), F.col("page_num").cast("string")).alias("name"),
        F.col("page_text").alias("t"),
    )
    pre, post = header_fmt.split("{name}")
    return (
        page_df.groupBy("url")
        .agg(F.array_sort(F.collect_list(named)).alias("parts"))
        .select(
            "url",
            F.array_join(
                F.transform(
                    F.col("parts"),
                    lambda p: F.concat(F.lit(pre), p["name"], F.lit(post), p["t"]),
                ),
                separator,
            ).alias("combined_text"),
        )
    )
