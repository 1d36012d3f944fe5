"""Host parallel-scaling ceiling — the pure-Python control.

The scaling-evidence methodology (bench_scaling.py, BENCH/BASELINE.md)
claims that efficiency lost when moving from N to 4N ACTIVE cores on
this single-socket sandbox host is partly the HOST's rolloff (all-core
turbo, shared L3, memory bandwidth), not the engine's. This tool
measures that rolloff with a workload that has no Spark, no JVM, no
Arrow and no shuffle: each worker process zlib-decompresses and
regex-scans deterministic blobs — the same instruction mix
(decompress + scan) that dominates the extraction pipeline's per-doc
CPU — pinned (sched_setaffinity, inherited by fork) to exactly W CPUs
at each level.

Fixed TOTAL work at every level, so docs/s ratios are efficiency.
Usage: python tools/host_ceiling.py [--units 7680] [--levels 2,4,8,16]
Prints one JSON line with per-level rates and all N->4N pair ceilings.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import re
import time
import zlib

_PAT = re.compile(rb"<p[^>]*>|\bclass=\"[a-z-]+\"|&[a-z]+;|\n\n+")


def _make_blob(seed: int) -> bytes:
    # ~120 KB of compressible pseudo-HTML, deterministic per seed
    rnd = zlib.crc32(str(seed).encode())
    parts = []
    for i in range(600):
        rnd = (rnd * 1103515245 + 12345) & 0x7FFFFFFF
        parts.append(
            b'<p class="c%d">token%d &amp; text '
            % (rnd % 17, rnd % 9973) + b"x" * (rnd % 160) + b"</p>\n\n"
        )
    return zlib.compress(b"".join(parts), 6)


def _unit(blob: bytes) -> int:
    raw = zlib.decompress(blob)
    return len(_PAT.findall(raw)) + zlib.crc32(raw)


def _worker(args: tuple[bytes, int]) -> int:
    blob, n = args
    acc = 0
    for _ in range(n):
        acc ^= _unit(blob)
    return acc


def measure(units: int, workers: int) -> float:
    os.sched_setaffinity(0, set(range(workers)))
    blob = _make_blob(42)
    per = units // workers
    with mp.get_context("fork").Pool(workers) as pool:
        t0 = time.perf_counter()
        pool.map(_worker, [(blob, per)] * workers, chunksize=1)
        dt = time.perf_counter() - t0
    os.sched_setaffinity(0, set(range(os.cpu_count() or 32)))
    return (per * workers) / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=7680)
    ap.add_argument("--levels", default="2,4,8,16")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    rates = {w: round(measure(args.units, w), 1) for w in levels}
    pairs = {
        f"{a}->{b}": round(rates[b] / (rates[a] * b / a), 3)
        for a in levels
        for b in levels
        if b == 4 * a
    }
    print(json.dumps({"units": args.units, "rates": rates, "pair_ceilings": pairs}))


if __name__ == "__main__":
    main()
