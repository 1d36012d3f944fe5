"""The production extraction job (north rule, end-to-end).

``run_extraction(spark, in_path, out_dir, ...)``:

1. bucket every url deterministically: ``bucket = pmod(xxhash64(url), n_buckets)``
   — the unit of commit, resume and output partitioning;
2. **resume**: buckets listed in ``out_dir/_manifest`` are complete from
   a previous run and are filtered out (partition pruning makes the
   re-scan cheap; output is keyed by url so re-running is idempotent);
3. **skew handling**: whale rows (html bytes above ``whale_bytes``) are
   split off and repartitioned one-per-task, small rows get a salted
   ``repartition(n, bucket, salt)`` — a single 200-page PDF never
   serializes a whole task behind it (north rule skew clause);
4. extraction (operators/extract.py — shuffle-free);
5. write results parquet partitioned by bucket with dynamic partition
   overwrite (re-runs replace exactly the buckets they recompute);
6. **lineage**: per-output-partition metrics rows
   ``(run_id, partition_id, doc_count, bytes_in, extract_ms)`` appended
   to ``out_dir/metrics`` (north-star metrics table);
7. **manifest**: after the write action succeeds, one JSON line per
   completed bucket in ``out_dir/_manifest/`` — checkpointed
   partition-completion (north rule), written only after commit so a
   mid-job kill leaves the bucket uncommitted and it is redone whole.

At 100 TB: n_buckets scales to ~#cores×4 of the cluster; everything
here is per-bucket-parallel with exactly one shuffle (the explicit
repartition), no driver-side collect of data rows (only the tiny
per-bucket/metric aggregates, O(n_buckets)).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_to_text_spark.operators.extract import extract_documents, extract_documents_fused

DEFAULT_WHALE_BYTES = 1 << 20  # 1 MiB: above this a row is a "whale"


def bucket_of(url_col, n_buckets: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def committed_buckets(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("status") == "committed":
                        done.add(int(rec["bucket"]))
    return done


def _write_manifest(out_dir: str, run_id: str, buckets: list[int]) -> None:
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{run_id}.json")
    tmp = path + ".tmp"
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(tmp, "w") as f:
        for b in sorted(buckets):
            f.write(
                json.dumps(
                    {"run_id": run_id, "bucket": b, "status": "committed", "committed_at": now}
                )
                + "\n"
            )
    os.replace(tmp, path)  # atomic: manifest appears whole or not at all


def _write_metrics(out_dir: str, run_id: str, mrows) -> None:
    """Append the per-partition lineage rows (O(n_buckets), tiny) as one
    parquet file written driver-side with pyarrow — a Spark write of a
    64-row frame costs seconds of committer overhead for no benefit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mdir = os.path.join(out_dir, "metrics")
    os.makedirs(mdir, exist_ok=True)
    table = pa.Table.from_pylist(
        [
            {
                "run_id": run_id,
                "partition_id": int(r["partition_id"]),
                "doc_count": int(r["doc_count"]),
                "bytes_in": int(r["bytes_in"] or 0),
                "extract_ms": int(r["extract_ms"] or 0),
            }
            for r in mrows
        ],
        schema=pa.schema(
            [
                ("run_id", pa.string()),
                ("partition_id", pa.int32()),
                ("doc_count", pa.int64()),
                ("bytes_in", pa.int64()),
                ("extract_ms", pa.int64()),
            ]
        ),
    )
    pq.write_table(table, os.path.join(mdir, f"metrics-{run_id}.parquet"))


def size_aware_repartition(
    df: DataFrame,
    n_partitions: int,
    bytes_col: str = "html",
    whale_bytes: int = DEFAULT_WHALE_BYTES,
    salt_mod: int = 8,
) -> DataFrame:
    """Salted repartition with whale isolation (SURVEY §7.1 M4).

    Small rows: hash-shuffle on (bucketable key, salt) so many small
    docs pack evenly. Whales: one row per task via round-robin
    ``repartition()`` on a whale-only frame — AQE cannot split a
    single oversized *row*, so we place whales explicitly.

    General-purpose operator for flows without a bucketed write; the
    production extraction job uses ``bucket_colocated_repartition``
    instead (same skew guarantees, one shuffle for shuffle+write).
    """
    is_whale = F.octet_length(bytes_col) > F.lit(whale_bytes)
    salt = F.pmod(F.xxhash64("url", F.lit(0x5A17)), F.lit(salt_mod))
    small = df.filter(~is_whale | is_whale.isNull()).repartition(
        n_partitions, F.col("url"), salt
    )
    whales = df.filter(is_whale).repartition(max(2, n_partitions // 2))
    return small.unionByName(whales)


def bucket_colocated_repartition(
    df: DataFrame,
    n_buckets: int,
    bytes_col: str = "html",
    whale_bytes: int = DEFAULT_WHALE_BYTES,
    whale_parallelism: int = 16,
) -> DataFrame:
    """ONE shuffle for the whole extraction job.

    Small rows hash-shuffle on the OUTPUT bucket key, so after
    extraction each task already owns whole buckets and the partitioned
    write needs no second repartition — one less full-corpus shuffle,
    which on a real cluster is a full NETWORK pass of the extracted
    text. Measured single-node tradeoff (115k docs, interleaved A/B):
    a wash at 16 cores (39.1 s vs 40.6 s) but +23% wall at 4 cores
    (110 s vs 136 s) — the coarse bucket-granularity tasks pack badly
    at low parallelism (sub-bucket salting was tried and measured WORSE,
    139 s, plus 4× the files). Hence ``run_extraction`` defaults to
    output-side co-location (fastest at every measured level on shared-
    disk local mode) and exposes this input-side variant via
    ``colocate="input"`` for network-bound clusters where the saved
    shuffle pass dominates.

    Skew guarantees are unchanged in kind:
    - input-order/key skew: bucket = pmod(xxhash64(url), n_buckets) is
      itself the salt — any adversarial input layout randomizes;
    - granularity: set n_buckets ≥ 4× cluster cores (the documented
      sizing rule), so bucket-cost variance amortizes across waves; the
      shuffle targets 4×n_buckets slots so hash collisions between
      buckets rarely stack two buckets on one task;
    - row-size skew (the one AQE cannot fix — a single oversized row):
      whales are still split onto their own frame, one-per-task.
    """
    is_whale = F.octet_length(bytes_col) > F.lit(whale_bytes)
    small = df.filter(~is_whale | is_whale.isNull()).repartition(
        n_buckets * 4, F.col("bucket")
    )
    whales = df.filter(is_whale).repartition(max(2, whale_parallelism))
    return small.unionByName(whales)


def run_extraction(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    *,
    n_buckets: int = 64,
    n_partitions: int | None = None,
    whale_bytes: int = DEFAULT_WHALE_BYTES,
    resume: bool = True,
    threshold: int = 250,
    fused: bool = True,
    colocate: str = "output",
    ocr_scanned: bool = False,
) -> dict:
    """Run the extraction job; returns a small summary dict.

    ``fused=True`` uses the single-UDF-stage operator (one pass over the
    shuffled input — profiled 4× less shuffle read than the 4-branch
    union); ``fused=False`` keeps the branch-filtered variant whose
    text-layer fast path prunes the html column at the scan.

    ``colocate`` picks where the bucket co-location shuffle happens:
    ``"output"`` (default) = salted input repartition + repartition of
    the extracted text before the write (fastest measured at every
    local parallelism level); ``"input"`` = one shuffle total on the
    bucket key (see ``bucket_colocated_repartition`` — the choice for
    network-bound clusters). Both emit O(n_buckets) files.

    ``ocr_scanned`` enables the opt-in scanned-page OCR fallback
    (SPEC v1.2 item 4; default OFF = frozen-spec output)."""
    run_id = uuid.uuid4().hex[:12]
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2

    # project the shuffle payload down to what extraction consumes —
    # every other column would ride the explicit repartition for nothing
    pages = spark.read.parquet(in_path).select("url", "html", "text")
    pages = pages.withColumn("bucket", bucket_of(F.col("url"), n_buckets))

    done = committed_buckets(out_dir) if resume else set()
    all_buckets = set(range(n_buckets))
    pending = sorted(all_buckets - done)
    if not pending:
        return {"run_id": run_id, "buckets_done": len(done), "buckets_run": 0, "rows": 0}
    if done:
        pages = pages.filter(F.col("bucket").isin(pending))

    # co-location keeps the write at O(n_buckets) files, never
    # O(n_tasks × n_buckets): the small-file explosion is the classic
    # 100 TB killer (measured 5× pipeline cost at bench scale without
    # co-location). Where the co-locating shuffle happens is the
    # ``colocate`` tradeoff — see the docstring.
    if colocate == "input":
        staged = bucket_colocated_repartition(
            pages, n_buckets, whale_bytes=whale_bytes,
            whale_parallelism=max(2, n_partitions // 2),
        )
    elif colocate == "output":
        staged = size_aware_repartition(pages, n_partitions, whale_bytes=whale_bytes)
    else:
        raise ValueError(f"colocate must be 'input' or 'output', got {colocate!r}")

    extract = extract_documents_fused if fused else extract_documents
    # re-derive bucket after extraction (a projection — rows never move)
    result = extract(staged, threshold=threshold, ocr_scanned=ocr_scanned).withColumn(
        "bucket", bucket_of(F.col("url"), n_buckets)
    )
    if colocate == "output":
        result = result.repartition(n_buckets, "bucket")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out_path = os.path.join(out_dir, "extracted")
    result.write.partitionBy("bucket").mode("overwrite").parquet(out_path)

    # lineage from the WRITTEN output (single extraction pass, no
    # persist): a columnar read of 3 small columns — the text and html
    # bytes are never re-read (column pruning). partition_id == bucket:
    # the bucket IS the physical output partition.
    mrows = (
        spark.read.parquet(out_path)
        .filter(F.col("bucket").isin(pending))
        .groupBy(F.col("bucket").alias("partition_id"))
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("extract_ms").cast("long").alias("extract_ms"),
        )
        .collect()
    )
    n_rows = sum(r["doc_count"] for r in mrows)
    _write_metrics(out_dir, run_id, mrows)

    _write_manifest(out_dir, run_id, pending)
    return {
        "run_id": run_id,
        "buckets_done": len(done),
        "buckets_run": len(pending),
        "rows": n_rows,
    }
