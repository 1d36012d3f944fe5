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
    # per-drain state-store I/O, summed over the drain's micro-batches
    updated = rows_total = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            updated += so.get("numRowsUpdated", 0)
            rows_total = max(rows_total, so.get("numRowsTotal", 0))
    return updated, rows_total


def test_cross_batch_url_dedup(spark, tmp_path):
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(in_dir)
    batch1 = spark.createDataFrame([(f"u{i}", 1) for i in range(50)], "url string, v int")
    batch1.write.mode("append").parquet(in_dir)
    upd1, total1 = _drain(spark, in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == 50

    # second drop: 30 repeats + 20 new → only the 20 new pass through
    batch2 = spark.createDataFrame(
        [(f"u{i}", 2) for i in range(30)] + [(f"w{i}", 2) for i in range(20)],
        "url string, v int",
    )
    batch2.write.mode("append").parquet(in_dir)
    upd2, total2 = _drain(spark, in_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    assert out.count() == 70
    assert out.filter(F.col("url").startswith("w")).count() == 20
    # repeats kept their FIRST version
    assert out.filter((F.col("url") == "u5") & (F.col("v") == 2)).count() == 0

    # state-I/O bound (the 100 TB property): writes per drain = NEW keys
    # only — history is never rewritten, so drop 2 writes 20 rows (its
    # new urls), not 70 (the total seen set)
    assert upd1 == 50
    assert upd2 == 20
    assert total2 == 70  # the store holds one tiny row per unique url
