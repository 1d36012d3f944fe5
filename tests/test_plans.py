"""Physical-plan audits (scale discipline — the 100 TB questions).

These assert properties of the *plan*, not the output: column pruning
reaching the scan, predicate pushdown, shuffle count, broadcast joins.
A regression here means a 100× scale-up silently gets slower.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_text_spark.operators.extract import extract_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_is_shuffle_free(pages_df):
    """Doc-level extraction must not shuffle: scan → project → union."""
    plan = _plan(extract_documents(pages_df))
    assert "Exchange" not in plan


def test_text_layer_branch_prunes_html(pages_df):
    """The fast path must not read the html binary column from parquet."""
    suff_only = extract_documents(pages_df).filter(F.col("route") == "text_layer")
    plan = _plan(extract_documents(pages_df))
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any("html" not in s for s in schemas), schemas
    _ = suff_only


def test_filter_pushdown_reaches_scan(pages_df):
    plan = _plan(pages_df.select("url", "lang").filter(F.col("lang") == "en"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_small_dim_join_broadcasts(spark):
    """Catalyst must pick a broadcast join for a small dim (AQE or
    static) — the q02 join shape."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    j = li.join(F.broadcast(n), li.l_suppkey % 25 == n.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_topk_uses_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject, not a full
    global sort (O3 at scale)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from pdf_to_text_spark.operators.similarity import brute_force_topk

    plan = _plan(brute_force_topk(e, [1.0] * 64, k=10))
    assert "TakeOrderedAndProject" in plan
