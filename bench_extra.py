"""Extra benchmark harness for optimization work (guide §1.4).

NOT part of the driver contract — ``bench.py`` is frozen for
measurement. This tool isolates individual declared queries with the
noop sink, captures ``explain("formatted")`` plans, and times stages so
optimizations are driven by numbers rather than guesses.

Usage::

    python bench_extra.py --sf /root/testdata/sf1.0 --queries q33_ngram_jaccard
    python bench_extra.py --sf /root/testdata/sf0.1 --all --repeats 3
    python bench_extra.py --sf /root/testdata/sf1.0 --queries q33_ngram_jaccard --plan plans/r06/q33_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

from pdf_to_text_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get(
    "SPARK_GRAFT_SCRATCH", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--plan", default=None, help="write explain('formatted') to this file")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--bench-materialize",
        action="store_true",
        help="materialize like bench.py (count + xxhash64 collect) instead of the noop sink",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="bench-extra",
        cores=args.cores,
        shuffle_partitions=args.cores,
        extra_conf={"spark.local.dir": f"{SCRATCH}/sg_spark_local_{os.getpid()}"},
    )
    qs = E.queries()
    names = list(qs) if args.all else (args.queries or [])
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.plan:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            os.makedirs(os.path.dirname(args.plan) or ".", exist_ok=True)
            with open(args.plan, "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.bench_materialize:
                from pyspark.sql import functions as F

                df.select(
                    F.count("*").alias("n"),
                    F.sum(
                        F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
                    ).alias("h"),
                ).collect()
            else:
                noop(df)
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "cores": args.cores, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
