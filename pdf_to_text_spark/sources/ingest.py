"""Ingest sources: build the pages table from raw inputs (SURVEY §2.1).

The reference walks directories one file at a time
(``main.py:28-35``, ``convert_pdfs_pymupdf.py:38``); the Spark-native
equivalents are declarative scans that parallelize and prune for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def scan_document_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.{pdf,html,htm}",
    recursive: bool = True,
) -> DataFrame:
    """S1/S2: recursive file scan → pages-table rows.

    ``binaryFile`` gives (path, modificationTime, length, content);
    at scale prefer many medium files per directory — the driver lists
    files in parallel but tiny-file floods still hurt any FS."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def pages_from_bytes(
    spark: SparkSession, rows: list[tuple[str, bytes]]
) -> DataFrame:
    """S3/S4: in-memory uploads → pages rows (upload-source analog)."""
    data = [(u, None, b, None, None) for u, b in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def scan_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """S5: whole-file text source with filename (text-file ingest,
    ``ppt_formation.py:20-22``)."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("url"),
            F.col("value").alias("text"),
        )
    )
