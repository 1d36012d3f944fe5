"""M9 embedder: frozen feature-hash spec + inference-UDF shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pdf_to_text_spark.operators.embed import centrality_topk_from_text, with_embedding


def _expected(text: str, dim: int = 16) -> list[float]:
    import re

    v = [0.0] * dim
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if w:
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            v[h % dim] += 1.0 if (h >> 31) & 1 == 0 else -1.0
    return v


def test_embedding_matches_frozen_spec(spark):
    rows = [(1, "The quick brown fox, the quick dog!"), (2, ""), (3, "spark SPARK Spark")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["v"] for r in with_embedding(df, "text", "v").collect()}
    for i, t in rows:
        assert got[i] == _expected(t), i
    # repeated tokens accumulate (multiplicity kept): 'spark' ×3
    assert sum(abs(x) for x in got[3]) == 3.0


def test_centrality_chain_from_text(spark):
    # group g: two near-identical docs (mutually most central) + outlier
    rows = [
        ("g", 1, "alpha beta gamma delta epsilon zeta"),
        ("g", 2, "alpha beta gamma delta epsilon eta"),
        ("g", 3, "totally unrelated words here now"),
        ("h", 4, "single doc group has no pairs"),
        ("h", 5, ""),  # zero-vector: excluded before pairing
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = centrality_topk_from_text(df, "text", "doc_id", "source", k=2)
    g = {r["doc_id"]: r for r in out.filter(F.col("source") == "g").collect()}
    assert set(g) == {1, 2}  # the near-dup pair outranks the outlier
    assert all(r["rn"] <= 2 for r in g.values())
    # group h: doc 4 alone (no counterpart after the zero-vector filter)
    # → no pairs → no centrality rows; and doc 5 never appears
    assert out.filter(F.col("source") == "h").count() == 0


def test_embedder_memo_is_dim_independent():
    """The executor-singleton token memo must not leak one dim's
    buckets into another call's vectors (Spark reuses Python workers
    across jobs) — previously dim 16 then dim 8 raised IndexError."""
    from pdf_to_text_spark.operators import embed as M

    M._memo.clear()
    a16 = M._embed_one("hello world foo bar", 16)
    a8 = M._embed_one("hello world foo bar", 8)  # memo warm from dim 16
    M._memo.clear()
    assert M._embed_one("hello world foo bar", 8) == a8
    M._memo.clear()
    assert M._embed_one("hello world foo bar", 16) == a16
