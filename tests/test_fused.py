"""Fused single-pass extractor must be byte-identical to the goldens
and to the branch-filtered operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_text_spark.operators.extract import extract_documents, extract_documents_fused


def test_fused_matches_golden(pages_df, golden_extracted):
    got = extract_documents_fused(pages_df).select("url", "extracted_text", "error", "route")
    j = got.alias("g").join(golden_extracted.alias("o"), "url", "full_outer")
    diff = j.filter(
        ~F.col("g.extracted_text").eqNullSafe(F.col("o.extracted_text"))
        | ~F.col("g.error").eqNullSafe(F.col("o.error"))
        | ~F.col("g.route").eqNullSafe(F.col("o.route"))
    )
    assert diff.count() == 0


def test_fused_matches_branched(pages_df):
    a = extract_documents(pages_df).select("url", "extracted_text", "error", "route", "bytes_in")
    b = extract_documents_fused(pages_df).select("url", "extracted_text", "error", "route", "bytes_in")
    j = a.alias("a").join(b.alias("b"), "url", "full_outer")
    diff = j.filter(
        ~F.col("a.extracted_text").eqNullSafe(F.col("b.extracted_text"))
        | ~F.col("a.error").eqNullSafe(F.col("b.error"))
        | ~F.col("a.route").eqNullSafe(F.col("b.route"))
        | ~F.col("a.bytes_in").eqNullSafe(F.col("b.bytes_in"))
    )
    assert diff.count() == 0
