"""Artifact-export job (the reference's download formats, ship shape):

    spark-submit --master <cluster> --py-files engine.zip \
        jobs/export_artifacts_job.py --in <extracted parquet> --out <dir> \
        [--formats pdf,docx,pptx,md,png] [--id-col url] [--text-col extracted_text]

Reads the extract job's output table and emits one row per document
with the requested artifact columns — the Spark-native equivalent of
the reference's export_all_outputs / Streamlit download buttons
(``/root/reference/2_OpenCV_OCR/final_output_generator.py:63-74``,
``ui.py:433-471``):

- pdf   : complete single-page PDF bytes (pure Catalyst, K3)
- docx  : WordprocessingML + OPC zip bytes (K4)
- pptx  : PresentationML slides + OPC zip bytes; [CHART: ...] content
          lines become chart slides with real c:chartSpace parts (K5)
- md    : markdown content report string (K6)
- png   : rasterized page image bytes (M2)

Everything except the two zip containers and the rasterizer is
JVM-side; those three are Arrow-batched. Output is plain parquet —
binary columns are first-class, so downstream jobs (or an object-store
exporter doing ``foreachPartition`` writes of individual files) read
them without re-rendering.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FORMATS = ("pdf", "docx", "pptx", "md", "png")


def build_artifacts(df, text_col: str, id_col: str, formats: list[str]):
    from pdf_to_text_spark.functions.pdfsink import text_to_pdf
    from pdf_to_text_spark.functions.pptxsink import (
        blueprint_to_pptx_parts,
        pptx_package_with_charts,
    )
    from pdf_to_text_spark.functions.udfs import docx_package
    from pdf_to_text_spark.operators.blueprint import (
        blueprint_to_docx_xml,
        blueprint_to_markdown,
        text_to_blueprint,
    )
    from pdf_to_text_spark.operators.multimodal import rasterize_col

    text = F.col(text_col)
    cols = [F.col(id_col)]
    if "pdf" in formats:
        cols.append(text_to_pdf(text).cast("binary").alias("pdf"))
    if "docx" in formats or "pptx" in formats or "md" in formats:
        bp = text_to_blueprint(text)
        if "docx" in formats:
            cols.append(docx_package(blueprint_to_docx_xml(bp)).alias("docx"))
        if "pptx" in formats:
            # chart-routed deck: [CHART: ...] content lines become real
            # chart slides with c:chartSpace parts (reference
            # create_pptx_with_style), text slides render as before
            parts = blueprint_to_pptx_parts(bp)
            cols.append(
                pptx_package_with_charts(parts["slides"], parts["charts"]).alias("pptx")
            )
        if "md" in formats:
            cols.append(blueprint_to_markdown(bp).alias("md"))
    if "png" in formats:
        cols.append(rasterize_col(text).alias("png"))
    # one shuffle-free projection per document row — every format is a
    # column expression (the zips/raster are Arrow-batched UDF columns)
    return df.select(*cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", dest="out_dir", required=True)
    ap.add_argument("--formats", default=",".join(FORMATS))
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="extracted_text")
    args = ap.parse_args()
    formats = [f.strip() for f in args.formats.split(",") if f.strip()]
    unknown = sorted(set(formats) - set(FORMATS))
    if unknown:
        raise SystemExit(f"unknown formats {unknown}; pick from {FORMATS}")

    spark = (
        SparkSession.builder.appName("pdf_to_text_spark.export_artifacts")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.in_path)
    build_artifacts(df, args.text_col, args.id_col, formats).write.mode(
        "overwrite"
    ).parquet(args.out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
