"""Unit gates for bench.py's /proc/stat accounting — the measurement
layer the round-5 scaling claim rests on (pinned-set steal/occupancy;
see BENCH/BASELINE.md round-5 addendum)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _parse_stat_line  # noqa: E402


def test_parse_stat_line_fields():
    # user nice system idle iowait irq softirq steal
    s, b = _parse_stat_line("cpu0 100 10 50 9000 5 2 3 40")
    assert s == 40.0
    # busy = user+nice+system+irq+softirq+steal (idle+iowait excluded)
    assert b == 100 + 10 + 50 + 2 + 3 + 40


def test_parse_stat_line_missing_steal_defaults_zero():
    # pre-2.6.11 kernels emit fewer fields; steal defaults to 0
    s, b = _parse_stat_line("cpu0 100 10 50 9000")
    assert s == 0.0
    assert b == 160.0


def test_machine_wide_vs_subset_consistency():
    s_all, b_all = _cpu_stat()
    assert b_all > 0
    n = os.cpu_count() or 1
    s_sub, b_sub = _cpu_stat(set(range(n)))
    # summing every per-cpu line reproduces the aggregate line to
    # within jitter between the two reads (jiffies advance ~100/s/cpu)
    assert abs(b_sub - b_all) / b_all < 0.01
    assert abs(s_sub - s_all) <= max(0.01 * max(s_all, 1.0), n * 10.0)


def test_subset_is_monotone_in_cpus():
    _, b1 = _cpu_stat({0})
    _, b2 = _cpu_stat({0, 1})
    assert 0 < b1 <= b2


def test_empty_subset_is_zero_work():
    s, b = _cpu_stat(set())
    assert s == 0.0 and b == 0.0
