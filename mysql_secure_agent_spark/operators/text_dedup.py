"""Document deduplication operators for large-scale training-data pipelines.

Four strategies, all declarative DataFrame compositions (JVM-side, shuffle-
aware) — no Python in the hot path:

* exact          — hash-groupBy on a content digest; one shuffle, map-side
                   partial agg. O(n).
* ngram_jaccard  — word n-gram shingles → inverted index self-join on shingle
                   → per-pair intersection counts → Jaccard threshold.
                   The shingle join is the classic doc-dedup plan: the
                   explode/join shuffle is bounded by posting-list sizes, and
                   hot shingles (stopword-y) are droppable via a document-
                   frequency cap (``max_shingle_df``) — the skew valve.
* minhash_lsh    — K minhash values from one portable 32-bit base hash
                   (md5-prefix) under K affine permutations; band into B
                   buckets; candidate pairs = same (band, band-signature).
                   Shuffle cost O(n·B) rows, independent of pair count —
                   the 100 TB-scale path.
* simhash        — 32-bit simhash over token hashes; exact-duplicate buckets
                   at hamming distance 0 via signature equality, and near-dup
                   pairs at hamming ≤ k via band rotation
                   (``simhash_near_dup_pairs``): split the fingerprint into
                   k+1 bands — pigeonhole guarantees any pair within distance
                   k agrees exactly on some band — bucket-join on (band,
                   band bits), then verify with bit_count(xor). O(n·(k+1))
                   shuffle, complete recall, no all-pairs.

Everything uses ``md5``-derived hashes (not ``xxhash64``) so results are
bit-reproducible across engines — the DuckDB oracle in ``__spark_entry__``
runs the same math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Portable 32-bit hash: first 8 hex chars of md5, as a BIGINT in [0, 2^32).
# (md5 is identical across Spark/DuckDB; xxhash64 is engine-specific.)
def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _h32_fast(col):
    """Production-path hash: xxhash64 folded to 32 bits. The hash itself is
    much cheaper than md5 (no hex round-trip), but the LSH pipeline is
    explode/shuffle-bound, so the measured END-TO-END gain is modest (~10%
    at the sf0.1 bench, mostly from the fixed-width band keys it enables —
    see minhash_lsh_pairs). Engine-specific: only the md5 variant is
    oracle-comparable. Same value range."""
    return F.pmod(F.xxhash64(col), F.lit(1 << 32))


def _hasher(hash_fn: str):
    if hash_fn == "md5":
        return _h32
    if hash_fn == "xxhash64":
        return _h32_fast
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


MERSENNE = (1 << 61) - 1


def tokens_col(text_col="text"):
    """Whitespace tokenization (lowered)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles_col(text_col="text", n: int = 3):
    """Distinct word n-gram shingles as an array<string>.

    ``array_join(slice(toks, i, n))`` instead of n separate 1-based
    ``element_at`` lookups: higher-order lambdas run INTERPRETED (no
    whole-stage codegen), and the per-element Cast/element_at expression
    trees cost ~2.7× the single slice+join (measured 5.0 s vs 13.6 s per
    core for 260k shingles). Same shingle values either way — the oracle
    SQL is unchanged."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    # guard: Spark sequence(1, k) DESCENDS for k<1 — short texts get no shingles
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(F.array_distinct(grams))


def _with_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ONLY if the plan has fewer partitions than the cluster
    has slots. The shingle/token explode is the CPU hot spot of every text
    operator, and its parallelism is inherited from the file splits — a
    single small input file would otherwise serialize the whole corpus
    explode onto one core (measured 13.6 s vs 1.3 s at the sf0.1 bench). At
    100 TB the scan has thousands of splits, the guard is false, and no
    extra shuffle ever happens; the repartition only fires for inputs so
    small that shuffling them is free."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------- exact dedup
def dedup_exact(df: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Keep the min-id representative per exact content digest.

    groupBy(md5) is one shuffle with partial aggregation; at 100 TB the
    digest (16 bytes) shuffles, not the document text.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------- shingle postings
def _shingle_postings(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """The (id, shingle) inverted-index table every shingle-based operator
    starts from — factored out so two-phase pipelines can compute the
    corpus explode ONCE and share it across phases."""
    return _with_min_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(shingles_col(text_col, n)).alias("sh")
    )


def _drop_hot_shingles(sh: DataFrame, max_shingle_df: int) -> DataFrame:
    """The skew valve: drop shingles whose document frequency exceeds the
    cap (a broadcast anti-join — the hot set is small by construction)."""
    hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_")).filter(
        F.col("df_") > max_shingle_df
    )
    return sh.join(F.broadcast(hot.select("sh")), "sh", "left_anti")


# ------------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs (a<b) with n-gram Jaccard ≥ threshold.

    Plan: explode shingles → df-cap on hot shingles → self-join on shingle →
    count common shingles per pair → |A∪B| = |A|+|B|-common.

    ``max_shingle_df`` is the scale safety valve and is ON by default: one
    stopword-heavy shingle shared by d documents produces a d² posting-list
    self-join — at 10^9 docs a single hot trigram is a quadratic blowup.
    Dropped hot shingles shrink the shingle universe, so BOTH the pair
    intersection and the per-doc sizes are computed post-drop (same universe ⇒
    Jaccard stays a true ratio; mixing universes would systematically
    underestimate it for documents containing hot shingles). Pass ``None`` to
    disable (exact Jaccard over the full universe).
    """
    sh = _shingle_postings(df, text_col, id_col, n)
    if max_shingle_df is not None:
        sh = _drop_hot_shingles(sh, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("l")
        .join(sh.alias("r"), "sh")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def containment_pairs(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    n: int = 3,
    threshold: float = 0.9,
    min_shingles: int = 3,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """DIRECTIONAL near-dup pairs: containment(a→b) = |A∩B| / |A| ≥
    threshold — doc a's shingles nearly all appear in doc b. The asymmetric
    relation Jaccard misses: a quoted email inside a long reply chain, a
    boilerplate header inside every page, a README embedded in a crawl
    dump — |A∩B|/|A∪B| is tiny when |B| ≫ |A| but the small doc is still a
    duplicate worth dropping (Broder's containment measure, the standard
    companion to resemblance).

    Plan: the SAME df-capped posting-list join as ``ngram_jaccard_pairs``
    (explode → hot-shingle drop → self-join on shingle → per-pair common
    count), divided by |A| only; emits ordered (id_a ⊆ id_b) pairs — both
    directions can appear when two docs mutually contain each other.
    ``min_shingles`` floors |A| (a 1-shingle doc is "contained" everywhere
    — noise, not duplication). Same scale valve: the hot-shingle cap
    bounds the posting join at 10^9 docs; numerator and denominator are
    both post-drop, so the ratio stays a true containment over the reduced
    shingle universe.

    The reference has no corpus operators (binlog agent); this serves the
    training-data pipeline over the transcript lake's document side.
    """
    sh = _shingle_postings(df, text_col, id_col, n)
    if max_shingle_df is not None:
        sh = _drop_hot_shingles(sh, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("l")
        .join(sh.alias("r"), "sh")
        .filter(F.col("l.id") != F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"),
            "id_a",
        )
        .filter(F.col("sz_a") >= min_shingles)
        .withColumn("containment", F.col("common") / F.col("sz_a"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


# ---------------------------------------------------------------- minhash lsh
def minhash_signature(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    num_hashes: int = 16,
    n: int = 3,
    hash_fn: str = "md5",
    postings: DataFrame | None = None,
) -> DataFrame:
    """K minhash values per doc from affine permutations of one base hash:
    h_k(s) = (a_k·h32(s) + b_k) mod M  (M = 2^61-1, a_k/b_k deterministic).
    One explode + one groupBy(id) with K min() partial aggs — a single
    shuffle of (id, K longs) regardless of document size.

    ``hash_fn='md5'`` (default) is bit-reproducible across engines (the
    DuckDB oracle runs the same math); ``'xxhash64'`` is the cheaper
    production path (same plan, different hash values)."""
    if postings is None:
        postings = _shingle_postings(df, text_col, id_col, n)
    sh = postings.withColumn("h", _hasher(hash_fn)(F.col("sh")))
    aggs = [
        F.min((F.col("h") * F.lit(2 * k + 1) + F.lit(k * k + 1)) % F.lit(MERSENNE)).alias(
            f"mh{k}"
        )
        for k in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hash_fn: str = "md5",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banding: docs sharing any band signature.

    rows_per_band = num_hashes // bands; a pair colliding on ≥1 band is a
    candidate (probability 1-(1-j^r)^b for Jaccard j). Shuffle is O(n·bands);
    candidate verification (exact Jaccard) is left to ngram_jaccard_pairs on
    the (tiny) candidate set — the standard two-phase LSH plan.

    Band keys: the portable md5 path joins on the oracle-reproducible
    '<band>:<mh..>' string; the xxhash64 production path compacts each band
    signature to ONE xxhash64 long — an 8-byte fixed-width shuffle/join key
    instead of a ~60-byte string (a 2^-64 band-collision false-candidate
    risk, removed by the verify phase).
    """
    r = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, n, hash_fn, postings)
    if hash_fn == "xxhash64":
        band_cols = [
            F.xxhash64(F.lit(b), *[F.col(f"mh{b * r + i}") for i in range(r)]).alias(
                "band_key"
            )
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.concat_ws(
                ":", F.lit(b), *[F.col(f"mh{b * r + i}").cast("string") for i in range(r)]
            ).alias("band_key")
            for b in range(bands)
        ]
    exploded = sig.select("id", F.explode(F.array(*band_cols)).alias("band_key"))
    pairs = (
        exploded.alias("l")
        .join(exploded.alias("r"), "band_key")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def verify_pairs_jaccard(
    df: DataFrame,
    candidates: DataFrame,
    text_col="text",
    id_col="doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for the given candidate pairs
    (columns id_a, id_b) — the verification half of two-phase LSH dedup.

    Plan: the candidate set is tiny relative to the corpus (O(n·bands)
    collisions, not O(n²)), so it broadcasts; shingles join through it, so the
    per-pair intersection count touches only candidate documents' postings.
    Pairs sharing zero shingles drop out (inner join) — they cannot pass any
    threshold > 0.
    """
    sh = postings if postings is not None else _shingle_postings(df, text_col, id_col, n)
    if max_shingle_df is not None:
        # document frequency over the FULL corpus (the cap semantics), but
        # everything downstream touches only candidate documents' postings
        sh = _drop_hot_shingles(sh, max_shingle_df)
    cand = F.broadcast(candidates.select("id_a", "id_b"))
    cand_ids = F.broadcast(
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # prune the shingle table to candidate docs BEFORE any shuffle: the
    # candidate set is O(collisions), so the verify cost no longer scans the
    # whole corpus's postings through the pair join
    sh = sh.join(cand_ids, "id")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), "sh"),
            ["id_b", "sh"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_verified(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Two-phase near-dup dedup: LSH banding proposes candidate pairs
    (O(n·bands) shuffle), exact Jaccard on just those pairs removes the false
    positives. This is the function a user should call at scale — raw
    ``minhash_lsh_pairs`` output contains banding collisions.

    Materialization strategy (both via ``localCheckpoint``, which stores
    partitions on executors WITHOUT registering in the CacheManager — so no
    cache entry can leak into later queries' plans and nothing needs a
    caller-side unpersist):

    * the corpus (id, shingle) postings table is computed ONCE (lazy
      checkpoint) and shared by the minhash aggregation and the verify join —
      previously both phases re-exploded the full corpus;
    * the candidate set (tiny by construction) is checkpointed eagerly: it
      feeds three plan branches in verify (pair join + two id semi-joins),
      which would otherwise each recompute the whole banding pipeline.

    On a multi-executor cluster, executor loss invalidates local checkpoints
    — a resilient deployment of this two-phase plan would write the postings
    to a reliable ``checkpoint()`` dir (or a table) instead; the plan shape
    is unchanged.
    """
    sh = _shingle_postings(df, text_col, id_col, n).localCheckpoint(eager=False)
    cands = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, n, hash_fn, postings=sh
    ).localCheckpoint(eager=True)
    return verify_pairs_jaccard(
        df, cands, text_col, id_col, n, threshold, max_shingle_df, postings=sh
    )


# -------------------------------------------------------------------- simhash
def simhash(df: DataFrame, text_col="text", id_col="doc_id", bits: int = 32) -> DataFrame:
    """Per-doc simhash: for each bit, sign of Σ over tokens of ±1 (token hash
    bit). Explode + groupBy(id) with `bits` conditional sums — partial-agg
    friendly. Collapsing identical signatures = hamming-0 dedup buckets."""
    tok = _with_min_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("t")
    ).withColumn("h", _h32(F.col("t")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tok.groupBy("id").agg(*bit_sums)
    sig = sums.select(
        "id",
        sum(
            [
                F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
                for b in range(bits)
            ],
            start=F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sig


def simhash_buckets(df: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Duplicate groups = identical simhash (≥2 members)."""
    return (
        simhash(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col="text",
    id_col="doc_id",
    bits: int = 32,
    k: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """All pairs within hamming distance ≤ ``k`` of each other's simhash,
    via band rotation (the public Manku/Jain/Das Sarma WWW'07 construction):
    split the ``bits``-bit fingerprint into ``n_bands`` (default k+1)
    contiguous bands; by pigeonhole, a pair differing in ≤ k bits agrees
    EXACTLY on at least one band when there are k+1 bands, so candidates =
    same (band, band-bits) bucket and recall is complete, not probabilistic.
    Candidates are verified with ``bit_count(xor)`` — pure codegen.

    Scale shape: one explode to n·B band rows, one bucket equi-join (shuffle
    keyed on band bits — the same O(n·B) plan as MinHash-LSH banding), a
    distinct to collapse pairs colliding in several bands, then the cheap
    verify filter. No all-pairs product anywhere; bucket sizes are bounded
    by fingerprint collisions per band, and widening ``bits`` (or raising
    ``n_bands`` beyond k+1) shrinks buckets at the cost of more band rows.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    n_bands = n_bands or (k + 1)
    if bits % n_bands != 0:
        raise ValueError(f"bits={bits} not divisible by n_bands={n_bands}")
    width = bits // n_bands
    mask = (1 << width) - 1
    sig = simhash(df, text_col, id_col, bits)
    bands = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"),
    ).filter(F.col("hamming") <= k)
