"""Structured Streaming surface (SURVEY §2.8 — optional extension).

The reference is purely batch; the north rule's resume story is the
manifest mechanism in plans/pipeline.py. This module adds the
incremental-crawl capability: the SAME extraction operators run under
``readStream`` with ``trigger(availableNow=True)`` — checkpointed,
exactly-once per file, so a recurring crawl drop-off is picked up
incrementally with zero code divergence from the batch path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pdf_to_text_spark.operators.extract import extract_documents


def run_incremental_extraction(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
) -> None:
    """Process any parquet files in ``in_dir`` not yet seen by this
    checkpoint, extract, append results. Returns after draining
    (availableNow) — cron-friendly incremental batch."""
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 64)
        .load(in_dir)
    )
    extracted = extract_documents(stream)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_urls(
    pages_stream,
    key_col: str = "url",
):
    """Custom stateful operator (task brief: applyInPandasWithState):
    exactly-once url dedup ACROSS micro-batches — a recurring crawl
    drop-off often re-ships documents; state remembers seen keys per
    hash-group and emits each url's row only the first time.

    State layout: one row-group per ``pmod(xxhash64(url), 1024)`` so
    state is bounded per key-group and shuffles hash-evenly. At 10^12
    docs the state store backs onto RocksDB
    (``spark.sql.streaming.stateStore.providerClass``); the operator
    code is unchanged.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedup_group(key, pdfs, state: GroupState):
        seen = set(state.get[0].split("\x00")) if state.exists else set()
        out = []
        for pdf in pdfs:
            fresh = pdf[~pdf[key_col].isin(seen)]
            fresh = fresh.drop_duplicates(subset=[key_col])
            seen.update(fresh[key_col].tolist())
            out.append(fresh)
        state.update(("\x00".join(sorted(seen)),))
        result = pd.concat(out) if out else pd.DataFrame()
        yield result.drop(columns=["_grp"])

    with_grp = pages_stream.withColumn(
        "_grp", F.pmod(F.xxhash64(key_col), F.lit(1024)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages_stream.schema.fields
    )
    return with_grp.groupBy("_grp").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType="seen string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(events_df, window: str = "1 hour"):
    """Tumbling event-time window aggregation (engine capability check
    against the driver's ``events`` table; watermark applies only under
    a streaming source)."""
    return (
        events_df.groupBy(F.window("ts", window).alias("w"), "event_type")
        # decimal addends: order-independent sum (see __spark_entry__._dsum)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
