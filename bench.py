"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus extraction throughput fields (docs/sec over a cached deterministic
pages corpus — the engine's true headline per BASELINE.json).

Extra knobs (for bench_scaling.py): ``--cores N`` overrides the env,
``--extraction-only`` times just the extraction pipeline.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from pdf_to_text_spark.fixtures import write_corpus  # noqa: E402
from pdf_to_text_spark.plans.pipeline import run_extraction  # noqa: E402
from pdf_to_text_spark.session import get_spark  # noqa: E402


# Scratch space for shuffle spill + benchmark output. The sandbox has ONE
# shared virtual disk (ext4 on /dev/vda, hypervisor-contended); on a real
# N->4N-executor cluster both shuffle dirs and output storage (HDFS/S3)
# scale per-node, so a fixed single-disk bandwidth would measure the
# sandbox's storage, not the engine's scaling. tmpfs is the per-node-
# storage stand-in (disclosed in BENCH/BASELINE.md); set
# SPARK_GRAFT_SCRATCH=/tmp to measure through the shared disk instead.
SCRATCH = os.environ.get(
    "SPARK_GRAFT_SCRATCH", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
)


def _sweep_stale_scratch() -> None:
    """tmpfs is RAM: a killed/timed-out bench run (the overnight hunt
    loop does both) would otherwise pin its shuffle dirs + partial
    output in /dev/shm forever. Scratch dirs are suffixed with the
    owning PID — reclaim any whose process is gone."""
    import glob

    for d in glob.glob(f"{SCRATCH}/sg_spark_local_*") + glob.glob(f"{SCRATCH}/sg_bench_out_*"):
        pid = d.rsplit("_", 1)[-1]
        if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_corpus(sf: float, seed: int = 42) -> tuple[str, int]:
    """Deterministic cached pages corpus sized to the scale factor.
    The cache key carries the corpus-mix version (fixtures.MIX_TAG) so
    a default-mix change can never silently reuse a stale corpus."""
    from pdf_to_text_spark.fixtures import MIX_TAG

    rows = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS", max(1200, int(240_000 * sf))))
    d = f"/tmp/sg_bench_pages_r{rows}_s{seed}_{MIX_TAG}"
    marker = os.path.join(d, "_complete")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        write_corpus(d, rows, seed, goldens=False)  # bench never reads goldens
        open(marker, "w").close()
    return d, rows


def time_extraction(
    spark, corpus_dir: str, rows: int, repeats: int = 1
) -> tuple[float, float, dict, list[dict]]:
    """Steady-state throughput: one untimed warmup run (JVM codegen,
    python-worker fork, shuffle service, output committer all warm),
    then ``repeats`` timed runs. Cold-start costs are per-process
    constants that a real cluster amortizes over hours — including
    them would measure JVM startup, not the engine.

    Hypervisor steal is measured over EACH timed run's own window
    (round-5 refinement): the per-process steal fraction mixes in the
    corpus check, JVM start and the untimed warmup — phases that are
    not part of the claimed throughput — so gating a sample on it
    both over-rejects clean runs and (worse) could under-detect a
    burst that hit exactly the timed window. Selection rule: fastest
    run whose own steal ≤ 3% of busy CPU; if no run is clean, fastest
    overall (its steal rides along so the sample self-describes as
    contaminated evidence). Returns (sec, docs/sec, chosen_run,
    all_runs)."""
    out = f"{SCRATCH}/sg_bench_out_{os.getpid()}"
    # when the process is taskset-pinned (bench_scaling.py --pin), the
    # affinity set IS the measurement set: steal/busy/occupancy are
    # summed over those per-cpu stat lines only (see _cpu_stat)
    aff = sorted(os.sched_getaffinity(0))
    pinned = len(aff) < (os.cpu_count() or len(aff))
    aff_set = set(aff) if pinned else None
    runs: list[dict] = []
    for i in range(repeats + 1):
        shutil.rmtree(out, ignore_errors=True)
        ms0, mb0 = _cpu_stat()
        s0, b0 = _cpu_stat(aff_set) if pinned else (ms0, mb0)
        t0 = time.perf_counter()
        run_extraction(spark, f"{corpus_dir}/pages.parquet", out, n_buckets=64, resume=False)
        dt = time.perf_counter() - t0
        ms1, mb1 = _cpu_stat()
        s1, b1 = _cpu_stat(aff_set) if pinned else (ms1, mb1)
        if i > 0:  # run 0 is the untimed warmup
            # busy−steal = CPU-seconds of actual VM work during the run
            # (USER_HZ=100). eff_cores = work/wall measures occupancy —
            # how many cores the job actually kept busy; with
            # cpu_ms_per_doc it decomposes a wall-clock scaling ratio
            # into engine-intrinsic CPU inflation × core occupancy,
            # both robust to steal (which wall-clock ratios are not).
            cpu_sec = (b1 - b0 - (s1 - s0)) / 100.0
            run = {
                "sec": round(dt, 3),
                "steal": round((s1 - s0) / max(b1 - b0, 1e-9), 4),
                "cpu_sec": round(cpu_sec, 1),
                "eff_cores": round(cpu_sec / dt, 2),
                "cpu_ms_per_doc": round(cpu_sec * 1000.0 / rows, 3),
            }
            if pinned:
                run["steal_machine"] = round((ms1 - ms0) / max(mb1 - mb0, 1e-9), 4)
                run["occupancy"] = round(cpu_sec / dt / len(aff), 3)
            runs.append(run)
    shutil.rmtree(out, ignore_errors=True)
    clean = [r for r in runs if r["steal"] <= 0.03]
    chosen = min(clean or runs, key=lambda r: r["sec"])
    return chosen["sec"], rows / chosen["sec"], chosen, runs


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def _parse_stat_line(line: str) -> tuple[float, float]:
    vals = [float(x) for x in line.split()[1:]]
    user, nice, system, _idle, _iowait, irq, softirq, steal = (vals + [0.0] * 8)[:8]
    return steal, user + nice + system + irq + softirq + steal


def _cpu_stat(cpus: set[int] | None = None) -> tuple[float, float]:
    """(steal, busy) jiffies from /proc/stat — steal is CPU time the
    hypervisor gave to co-tenant VMs while this one had runnable work.
    Reported over the bench window so a slow artifact is attributable:
    steal/busy ~0 means the number measures the engine; a high fraction
    means it measures the neighbors (r5 observed 2.7x end-to-end
    slowdown from co-tenant steal with near-zero ambient loadavg).

    With ``cpus`` (the taskset/sched_getaffinity set of a PINNED run),
    sums the per-cpu lines of that set only. The machine-wide fraction
    over-rejects pinned runs: an idle unpinned vCPU with a sliver of
    runnable housekeeping can accrue large steal while the pinned set
    runs untouched (observed 2026-08-18: machine steal 9.6% while the
    2 pinned CPUs showed occupancy 0.99 — OUR work lost ~nothing)."""
    try:
        with open("/proc/stat") as f:
            lines = f.readlines()
    except OSError:
        return 0.0, 1.0
    if cpus is None:
        return _parse_stat_line(lines[0])
    s = b = 0.0
    for ln in lines[1:]:
        tok = ln.split(None, 1)[0]
        if tok.startswith("cpu") and tok[3:].isdigit() and int(tok[3:]) in cpus:
            ps, pb = _parse_stat_line(ln)
            s += ps
            b += pb
    return s, b


def _run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # materialize EVERY column's values: count() lets Catalyst
    # prune unused projections (including pandas UDFs and the
    # regex chains under test), so it would time a bare scan —
    # hashing all columns into one aggregate forces the full
    # plan to run while keeping the collected result tiny
    df.select(
        F.count("*").alias("n"),
        # decimal accumulator: a long sum of 64-bit hashes
        # overflows (ANSI mode raises)
        F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()
    dt = time.perf_counter() - t0
    # several operators cache internal frames (signatures/shingles/
    # embeddings); clear between runs so (a) repeat 2+ pays the full
    # plan cost, not a cache hit, and (b) repeated calls don't leak
    # storage memory across the 43-query sweep
    spark.catalog.clearCache()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--extraction-only", action="store_true")
    # 3 timed runs (was 2): selection prefers the fastest steal-clean
    # run, so each extra repeat is an independent ~8 s chance that a
    # co-tenant burst misses the headline-number window
    ap.add_argument("--extraction-repeats", type=int, default=3)
    ap.add_argument(
        "--query-repeats",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")),
        help="timed runs per query; median reported (min alongside) so "
        "round-over-round deltas are signal, not host noise",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    load_start = _load1()
    steal0, busy0 = _cpu_stat()

    _sweep_stale_scratch()
    corpus_dir, rows = bench_corpus(sf)
    spark = get_spark(
        app_name=f"bench-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.local.dir": f"{SCRATCH}/sg_spark_local_{os.getpid()}"},
    )

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}

    try:
        # headline: the extraction pipeline (docs/sec is the north-star metric)
        ext_sec, docs_per_sec, ext_run, ext_runs = time_extraction(
            spark, corpus_dir, rows, args.extraction_repeats
        )
        timings["extraction_pipeline"] = round(ext_sec, 3)
        timings_min["extraction_pipeline"] = round(ext_sec, 3)

        if not args.extraction_only:
            import statistics

            for name, fn in E.queries().items():
                samples = [
                    _run_query(spark, fn, sf_dir) for _ in range(max(1, args.query_repeats))
                ]
                # median filters one-off noisy-neighbor spikes; min shows
                # the contention-free floor
                timings[name] = round(statistics.median(samples), 3)
                timings_min[name] = round(min(samples), 3)
        total = round(sum(timings.values()), 3)
    finally:
        spark.stop()
        shutil.rmtree(f"{SCRATCH}/sg_spark_local_{os.getpid()}", ignore_errors=True)
        shutil.rmtree(f"{SCRATCH}/sg_bench_out_{os.getpid()}", ignore_errors=True)

    steal1, busy1 = _cpu_stat()
    steal_frac = round((steal1 - steal0) / max(busy1 - busy0, 1e-9), 4)
    payload = json.dumps(
        {
            "metric": "bench_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "queries_min": timings_min,
            "sf": sf,
            "cores": cores,
            "extraction_rows": rows,
            "extraction_docs_per_sec": round(docs_per_sec, 1),
            # steal over the CHOSEN timed run's own window (the number
            # the docs/s figure actually comes from) + every run's pair
            "extraction_steal_frac": ext_run["steal"],
            "extraction_chosen": ext_run,
            "extraction_runs": ext_runs,
            # self-description (round-2 advice): every artifact says
            # HOW it was measured so cross-round comparisons are
            # interpretable without forensics
            "query_repeats": args.query_repeats,
            "aggregation": "median (queries) / best (extraction)",
            "materialization": "count + xxhash64(all columns) aggregate",
            "scratch": SCRATCH,
            "scratch_medium": "tmpfs" if SCRATCH.startswith("/dev/shm") else "disk",
            "load1_start": load_start,
            "load1_end": _load1(),
            "steal_frac_busy": steal_frac,
        }
    )
    # the one-line JSON outgrew the driver's stdout tail capture in r3/r4
    # (BENCH_r0{3,4}.json "parsed": null) — persist the FULL artifact to a
    # file, and print a COMPACT line (no queries_min, no methodology keys)
    # to stdout so the driver's tail capture parses it
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "last_bench.json"), "w") as f:
        f.write(payload + "\n")
    compact_dict = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "extraction_rows": rows,
        "extraction_docs_per_sec": round(docs_per_sec, 1),
        "extraction_steal_frac": ext_run["steal"],
        "extraction_chosen": ext_run,
        "extraction_runs": ext_runs,
        "steal_frac_busy": steal_frac,
        "full": "BENCH/last_bench.json",
    }
    compact = json.dumps(compact_dict, separators=(",", ":"))
    # the driver's stdout tail capture is exactly 2000 chars (measured
    # from BENCH_r0{3,4}.json): a longer line gets its HEAD cut and the
    # artifact's "parsed" goes null. With 56 queries the full compact
    # line measures ~2.1k, so prune the per-run diagnostic blocks (all
    # preserved in BENCH/last_bench.json) until it fits with margin.
    for k in ("extraction_runs", "extraction_chosen"):
        if len(compact) > 1900:
            del compact_dict[k]
            compact = json.dumps(compact_dict, separators=(",", ":"))
    print(compact)


if __name__ == "__main__":
    main()
