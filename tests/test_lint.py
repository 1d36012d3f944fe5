"""Engine-wide lint (SURVEY §7.3.5): no per-row Python in the hot path —
no row-at-a-time ``F.udf``/``@udf``, no ``rdd.`` usage, no ``collect()``
inside engine operators (driver-side loops)."""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "pdf_to_text_spark"


def _sources():
    for p in PKG.rglob("*.py"):
        yield p, p.read_text()


def test_no_row_at_a_time_udf():
    for p, src in _sources():
        assert "@F.udf" not in src and "F.udf(" not in src, p


def test_no_rdd_in_engine():
    for p, src in _sources():
        assert re.search(r"\brdd\b", src) is None, p


def test_no_collect_in_operators():
    """collect() is allowed only in plans/ (tiny lineage rows) — never
    in operators/functions (would be a driver-side data loop)."""
    for p, src in _sources():
        if "/plans/" in str(p) or "/core/" in str(p):
            continue
        assert ".collect()" not in src, p
