"""Stateful cross-batch url dedup (applyInPandasWithState)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_to_text_spark.streaming.stream import stream_dedup_urls


def _drain(spark, in_dir, out_dir, ck):
    stream = (
        spark.readStream.schema("url string, v int")
        .format("parquet")
        .load(in_dir)
    )
    q = (
        stream_dedup_urls(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_cross_batch_url_dedup(spark, tmp_path):
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(in_dir)
    batch1 = spark.createDataFrame([(f"u{i}", 1) for i in range(50)], "url string, v int")
    batch1.write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == 50

    # second drop: 30 repeats + 20 new → only the 20 new pass through
    batch2 = spark.createDataFrame(
        [(f"u{i}", 2) for i in range(30)] + [(f"w{i}", 2) for i in range(20)],
        "url string, v int",
    )
    batch2.write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    assert out.count() == 70
    assert out.filter(F.col("url").startswith("w")).count() == 20
    # repeats kept their FIRST version
    assert out.filter((F.col("url") == "u5") & (F.col("v") == 2)).count() == 0
