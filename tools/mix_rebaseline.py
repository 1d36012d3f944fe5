"""Measure the old-mix → new-mix throughput ratio (round-5 item 9).

The round-5 default corpus mix adds pdf_encrypted (2%) and pdf_15_pure
(2%) classes. The scaling campaign's per-side healthy-band floors were
calibrated on the old mix; this script measures both mixes back-to-back
at the same core count in ONE window (common-mode host noise cancels in
the ratio) so the floors can be re-baselined:

    new_floor = old_floor × (new_mix_docs_per_sec / old_mix_docs_per_sec)

Usage: python tools/mix_rebaseline.py [--cores 16] [--rows 115200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OLD_MIX = [
    ("pdf_digital", 14), ("pdf_flate", 9), ("pdf_sparse", 7),
    ("pdf_shuffled_ops", 7), ("html_article", 22),
    ("html_article_textlayer", 8), ("html_menu", 8), ("html_messy", 10),
    ("html_empty", 5), ("broken", 5), ("pdf_whale", 1), ("nonenglish", 4),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--rows", type=int, default=115200)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_PAGES_ROWS"] = str(args.rows)

    from bench import SCRATCH, _load1, bench_corpus, time_extraction
    from pdf_to_text_spark.fixtures import write_corpus
    from pdf_to_text_spark.session import get_spark

    # old mix: regenerate under an explicit tag (the pre-r5 cache dir is
    # reused if it already holds exactly this corpus shape)
    old_dir = f"/tmp/sg_bench_pages_r{args.rows}_s42"
    if not os.path.exists(os.path.join(old_dir, "_complete")):
        write_corpus(old_dir, args.rows, 42, goldens=False, classes=OLD_MIX)
        open(os.path.join(old_dir, "_complete"), "w").close()
    new_dir, _ = bench_corpus(0.1)  # current default mix, MIX_TAG-keyed

    spark = get_spark(
        app_name="mix-rebaseline",
        cores=args.cores,
        shuffle_partitions=args.cores,
        extra_conf={"spark.local.dir": f"{SCRATCH}/sg_spark_local_{os.getpid()}"},
    )
    load0 = _load1()
    best: dict[str, float] = {"old": 0.0, "new": 0.0}
    try:
        # interleave old/new so slow host drift cancels in the ratio
        for rep in range(2):
            for label, d in (("old", old_dir), ("new", new_dir)):
                reps = args.repeats if rep == 0 else 1
                _, dps = time_extraction(spark, d, args.rows, reps)
                best[label] = max(best[label], dps)
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(f"{SCRATCH}/sg_spark_local_{os.getpid()}", ignore_errors=True)
    ratio = best["new"] / best["old"]
    print(json.dumps({
        "old_docs_per_sec": round(best["old"], 1),
        "new_docs_per_sec": round(best["new"], 1),
        "ratio": round(ratio, 4),
        "cores": args.cores,
        "rows": args.rows,
        "load1_start": load0,
        "load1_end": _load1(),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }))


if __name__ == "__main__":
    main()
