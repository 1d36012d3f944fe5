"""Composed training-corpus pipeline: extract → quality → dedup funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_text_spark.plans.corpus_pipeline import build_training_corpus


def test_corpus_funnel(spark, corpus_dir, tmp_path):
    """Inject exact + near duplicates into the fixture pages; the
    pipeline must drop them while keeping the canonical (lowest-url)
    copy, and the funnel counts must be monotone."""
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    # exact dupes: clone 10 rows whose extraction SUCCEEDS (per the
    # goldens) under new urls — broken/empty rows never reach dedup
    golden = spark.read.parquet(f"{corpus_dir}/golden_extracted.parquet")
    good_urls = golden.filter(
        F.col("error").isNull() & (F.length("extracted_text") > 0)
    ).select("url")
    clones = (
        pages.join(good_urls, "url", "left_semi")
        .orderBy("url")
        .limit(10)
        .withColumn("url", F.concat(F.lit("https://zdup.test/"), F.col("url")))
    )
    staged = str(tmp_path / "staged")
    pages.unionByName(clones).write.parquet(staged)

    out = str(tmp_path / "out")
    funnel = build_training_corpus(spark, staged, out, min_quality=0.0)

    assert funnel["extracted"] >= funnel["quality_pass"] >= funnel["exact_unique"] >= funnel["final"]
    # every injected exact dupe was dropped (its original url kept —
    # originals sort before the zdup urls)
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.filter(F.col("url").startswith("https://zdup.test/")).count() == 0
    assert funnel["exact_unique"] <= funnel["quality_pass"] - 10
    # output is duplicate-free by construction
    assert corpus.groupBy("extracted_text").count().filter("count > 1").count() == 0


def test_pipeline_leaves_no_cached_rdds(spark, corpus_dir, tmp_path):
    """Cache discipline (VERDICT r3 item 7): the pipeline and every
    operator it calls register their caches, and the pipeline releases
    them after its terminal write — a long-lived session accumulates
    ZERO storage memory per run. minhash_lsh_pairs' internal signature
    cache was the r3 leak."""
    spark.catalog.clearCache()
    out = str(tmp_path / "out")
    build_training_corpus(spark, f"{corpus_dir}/pages.parquet", out, min_quality=0.0)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_quality_gate_filters(spark, corpus_dir, tmp_path):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    staged = str(tmp_path / "staged2")
    pages.write.parquet(staged)
    strict = build_training_corpus(spark, staged, str(tmp_path / "o1"), min_quality=0.9)
    loose = build_training_corpus(spark, staged, str(tmp_path / "o2"), min_quality=0.0)
    assert strict["quality_pass"] < loose["quality_pass"]
    assert strict["final"] <= loose["final"]


def test_near_dup_chain_semantics(spark):
    """Pin the pairwise-drop rule on a similarity chain a~b~c (a≁c):
    BOTH b and c are dropped — the drop set is computed from all pairs
    before any removal, so only chain heads survive."""
    from pdf_to_text_spark.plans.corpus_pipeline import near_dup_drop

    docs = spark.createDataFrame(
        [("a", "t"), ("b", "t"), ("c", "t"), ("d", "t")], "url string, extracted_text string"
    )
    pairs = spark.createDataFrame(
        [("a", "b", 4), ("b", "c", 4)], "id_a string, id_b string, n_bands int"
    )
    kept = sorted(r["url"] for r in near_dup_drop(docs, pairs).collect())
    assert kept == ["a", "d"]


def test_exact_dedup_single_shuffle(spark, corpus_dir, tmp_path):
    """The exact-dedup stage must be ONE exchange on the digest — the
    window rank replaces the old groupBy + semi-join (two text
    shuffles). Plan-level guard on the stage in isolation."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(f"u{i}", f"text {i % 7}") for i in range(50)], "url string, extracted_text string"
    )
    hashed = df.select("url", "extracted_text", F.md5("extracted_text").alias("h"))
    rn = F.row_number().over(W.partitionBy("h").orderBy("url"))
    uniq = hashed.withColumn("_rn", rn).filter(F.col("_rn") == 1).select("url", "extracted_text")
    plan = uniq._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert uniq.count() == 7


def test_connected_components_chain_and_v(spark):
    """plans/components: min-label propagation matches transitive
    closure. Chain 1~2~3: component 1 for all. V-graph (1,3),(2,3):
    one component {1,2,3} — this is where the two semantics DIFFER
    (see test_near_dup_semantics_differ_on_v_graph)."""
    from pdf_to_text_spark.plans.components import connected_components

    chain = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(chain).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # long chain (diameter 7) still converges, labels all reach the min
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7, 0, -1)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(long_chain).collect()}
    assert got == {i: 1 for i in range(1, 9)}


def test_near_dup_semantics_differ_on_v_graph(spark):
    """The pinned divergence: pairs (1,3),(2,3) — docs 1 and 2 each
    near doc 3 but never scored against each other. Pairwise keeps
    BOTH tips {1,2} (drop set = {id_b} = {3}); components merges the
    cluster and keeps only its minimum {1}. Both exposed via
    build_training_corpus(near_dup_semantics=...)."""
    from pdf_to_text_spark.plans.components import near_dup_drop_components
    from pdf_to_text_spark.plans.corpus_pipeline import near_dup_drop

    docs = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2"), ("u3", "t3"), ("u9", "t9")],
        "url string, extracted_text string",
    )
    pairs = spark.createDataFrame(
        [("u1", "u3", 4), ("u2", "u3", 4)], "id_a string, id_b string, n_bands int"
    )
    pairwise = sorted(r["url"] for r in near_dup_drop(docs, pairs).collect())
    transitive = sorted(r["url"] for r in near_dup_drop_components(docs, pairs).collect())
    assert pairwise == ["u1", "u2", "u9"]
    assert transitive == ["u1", "u9"]


def test_corpus_components_semantics_end_to_end(spark, corpus_dir, tmp_path):
    """build_training_corpus runs with components semantics and never
    keeps MORE than pairwise on the same input (components merges
    clusters pairwise may split)."""
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    staged = str(tmp_path / "staged_cc")
    pages.write.parquet(staged)
    pw = build_training_corpus(
        spark, staged, str(tmp_path / "o_pw"), min_quality=0.0
    )
    cc = build_training_corpus(
        spark, staged, str(tmp_path / "o_cc"), min_quality=0.0,
        near_dup_semantics="components",
    )
    assert cc["exact_unique"] == pw["exact_unique"]
    assert cc["final"] <= pw["final"]
