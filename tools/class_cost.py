"""Per-class PDF parse cost (round-5 judge item 3, second half).

Times ``extract_pdf_pages`` per fixture class, single-core, no Spark —
run in the repo AND in a pre-widening worktree (same seeds, each era's
own generator+parser) to make the "widening did not slow the default
classes" claim a measured number for BENCH/BASELINE.md.

Usage: python tools/class_cost.py [--docs 60] [--classes a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import time

# SPARK_GRAFT_REPO points the import at another checkout (e.g. a
# pre-widening worktree) so both eras run the SAME measurement script
REPO = os.environ.get(
    "SPARK_GRAFT_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

DEFAULT_CLASSES = "pdf_digital,pdf_flate,pdf_sparse,pdf_shuffled_ops,pdf_whale"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60)
    ap.add_argument("--classes", default=DEFAULT_CLASSES)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from pdf_to_text_spark.core.pdfparse import extract_pdf_pages
    from pdf_to_text_spark.fixtures import _make_pdf

    out: dict[str, float] = {}
    for cls in args.classes.split(","):
        docs = [
            _make_pdf(random.Random((5 << 20) ^ i), cls) for i in range(args.docs)
        ]
        for d in docs:  # warm
            extract_pdf_pages(d)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for d in docs:
                extract_pdf_pages(d)
            times.append((time.perf_counter() - t0) / len(docs) * 1000)
        out[cls] = round(statistics.median(times), 4)
    print(json.dumps({"ms_per_doc": out, "docs": args.docs, "repeats": args.repeats}))


if __name__ == "__main__":
    main()
