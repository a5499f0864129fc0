"""Training-corpus hygiene operators: benchmark decontamination,
deterministic shuffle/sharding for training order, and repetition
statistics (Gopher-style quality signals).

These are the corpus-level steps a training-data pipeline runs AFTER
dedup (operators/text_dedup.py) and quality scoring
(functions/text_analysis.py):

* decontaminate  — flag training documents that share word-n-gram shingles
                   with a held-out evaluation/benchmark set (the GPT-3
                   appendix-C / PaLM decontamination recipe, re-expressed
                   as one broadcast join + one shuffle). The eval set is
                   small by construction (benchmark suites are KBs-MBs, the
                   corpus is TBs), so its distinct shingle set broadcasts
                   and the only shuffle is the per-document overlap count —
                   the train-side posting explode never moves document text,
                   only (id, shingle) rows.
* shuffle_shard  — deterministic, engine-portable global shuffle + shard
                   assignment for training order: a seeded md5 sort key and
                   a shard id derived from its first two hex chars. No
                   global row_number (a single-partition window at scale);
                   order is expressed by (shard, sort_key) and materialized
                   with repartition + sortWithinPartitions.
* repetition_stats — per-document repetition signals: duplicate-token
                   fraction and most-frequent-bigram fraction (the
                   Gopher/MassiveText repetition filters, token-level).
                   The bigram mode is computed with explode + two keyed
                   partial aggregations (never a per-row O(len²) lambda).

Everything is md5-based and pure Catalyst so the DuckDB oracle in
``__spark_entry__`` runs the same math bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import _shingle_postings, _with_min_parallelism, shingles_col, tokens_col

_HEX = "0123456789abcdef"


# ---------------------------------------------------------- decontamination
def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
    threshold: float | None = None,
) -> DataFrame:
    """Per-training-document overlap with an evaluation set's n-gram
    shingles; the contamination gate for held-out benchmarks.

    Returns (id, total_shingles, overlap_shingles, overlap_frac,
    contaminated) for EVERY training document — documents shorter than
    ``n`` tokens have no shingles and are clean by definition.

    ``contaminated`` is ``overlap_shingles >= min_hits`` (the GPT-3 rule:
    any collision taints, with n large) unless ``threshold`` is given, in
    which case it is ``overlap_frac >= threshold`` (the fuzzier
    fraction-of-document rule for small n).

    Scale shape: the eval shingle set is distinct'd (a shuffle over the
    SMALL side only) and broadcast; train postings are a projection +
    explode of (id, shingle) — document text never shuffles; the one big
    shuffle is the per-id count aggregation with map-side partial
    aggregation. Unlike dedup, hot shingles are NOT dropped here: a
    benchmark string appearing in many training documents is exactly the
    contamination being hunted. Raise ``n`` (8-13 in the public recipes)
    to kill stopword-ish false positives instead.
    """
    post = _shingle_postings(train, text_col, id_col, n)
    ev = (
        _with_min_parallelism(eval_df)
        .select(F.explode(shingles_col(text_col, n)).alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    agg = (
        post.join(F.broadcast(ev), "sh", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("total_shingles"),
            F.count("_hit").alias("overlap_shingles"),
        )
    )
    # re-attach shingle-less (short) docs; the scan is pruned to the id col
    ids = train.select(F.col(id_col).alias("id"))
    out = (
        ids.join(agg, "id", "left")
        .withColumn("total_shingles", F.coalesce("total_shingles", F.lit(0)))
        .withColumn("overlap_shingles", F.coalesce("overlap_shingles", F.lit(0)))
        .withColumn(
            "overlap_frac",
            F.when(F.col("total_shingles") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("overlap_shingles") / F.col("total_shingles"), 6)
            ),
        )
    )
    if threshold is None:
        flag = F.col("overlap_shingles") >= min_hits
    else:
        flag = F.col("overlap_frac") >= threshold
    return out.withColumn("contaminated", flag)


# ------------------------------------------------------- shuffle + sharding
def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 17,
    materialize: bool = False,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a seeded
    ``sort_key`` (md5 of "seed:id") and a ``shard`` in [0, n_shards).

    Training order is (shard, sort_key) — reproducible across runs, engines
    and cluster sizes, with no global row_number (which would be a
    single-partition window at 100 TB). With ``materialize=True`` the
    result is physically clustered: one repartition on shard + an in-
    partition sort, i.e. exactly one shuffle to produce ready-to-write
    training shards.

    The shard id comes from the first two hex chars of the sort key
    ((h0*16 + h1) mod n_shards — uniform over 256 values), computed with
    ``instr`` against the hex alphabet so the oracle SQL is the same
    expression.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = df.withColumn("sort_key", key)
    hexpos = lambda i: F.expr(f"instr('{_HEX}', substring(sort_key, {i}, 1)) - 1")
    out = out.withColumn(
        "shard", F.pmod(hexpos(1) * 16 + hexpos(2), F.lit(n_shards)).cast("int")
    )
    if materialize:
        # one shuffle keyed on shard, then an in-partition (shard, key) sort:
        # every shard's rows are contiguous and ordered — ready for a
        # partitionBy("shard") write. Note hash partitioning maps several
        # shard values to one task when n_shards is small; the contract is
        # "each shard wholly inside one partition, in order", not 1:1.
        out = out.repartition(n_shards, "shard").sortWithinPartitions(
            "shard", "sort_key"
        )
    return out


# ---------------------------------------------------------- repetition stats
def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (the token-level Gopher filters):

    * ``dup_token_frac``  — 1 − distinct/total tokens (how much of the
      document is repeated vocabulary);
    * ``top_bigram_frac`` — occurrences of the single most frequent word
      bigram over all bigram slots (boilerplate/looping-text detector).

    Plan: token stats are row-local array algebra (no shuffle); the bigram
    mode is explode → groupBy(id, bigram) → groupBy(id) max — two shuffles
    keyed by document id with map-side partial aggregation, never a per-row
    O(len²) lambda. Documents with < 2 tokens have no bigrams and read 0.
    """
    toks = tokens_col(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    stats = base.select(
        "id",
        F.size("toks").alias("n_tokens"),
        F.when(F.size("toks") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                1.0 - F.size(F.array_distinct("toks")) / F.size("toks"), 6
            )
        )
        .alias("dup_token_frac"),
    )
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    grams = F.transform(idx, lambda i: F.array_join(F.slice("toks", i, 2), " "))
    bg = base.filter(F.size("toks") >= 2).select(
        "id", F.explode(grams).alias("bg")
    )
    mode = (
        bg.groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )
    return (
        stats.join(mode, "id", "left")
        .select(
            "id",
            "n_tokens",
            "dup_token_frac",
            F.when(
                F.col("n_bg").isNull() | (F.col("n_bg") == 0), F.lit(0.0)
            )
            .otherwise(F.round(F.col("top_c") / F.col("n_bg"), 6))
            .alias("top_bigram_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    fixed-token windows — the pretraining-prep step that turns long
    documents into model-context-sized examples while the ``stride``
    overlap preserves cross-boundary context (the Hugging Face
    ``return_overflowing_tokens`` convention, whitespace-token proxy).

    Window starts are ``0, stride, 2·stride, …`` while they fall inside
    the document; each window takes up to ``chunk_tokens`` tokens (the
    tail window is shorter). Emits ``(id, chunk_idx, chunk_start,
    n_tokens, chunk_text)``.

    Plan: row-local array algebra — tokenize once, ``sequence`` the start
    offsets, explode, ``slice`` each window out of the SAME token array.
    No shuffle at all: chunking is embarrassingly parallel, and the
    explode's fan-out is bounded by n_tokens/stride per row.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # blank/NULL text splits to [""], not [] — the same trap
    # token_count_col guards; no tokens means no chunks
    toks = F.when(
        F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "",
        F.expr("CAST(array() AS array<string>)"),
    ).otherwise(tokens_col(text_col))
    n = F.size("_toks")
    out = (
        df.withColumn("_toks", toks)
        .withColumn(
            "_starts",
            F.when(
                n > 0,
                F.sequence(
                    F.lit(0),
                    ((n - 1) / stride).cast("int") * stride,
                    F.lit(stride),
                ),
            ).otherwise(F.expr("CAST(array() AS array<int>)")),
        )
        .select(
            F.col(id_col),
            F.posexplode("_starts").alias("chunk_idx", "_start"),
            F.col("_toks"),
        )
    )
    win = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens))
    return out.select(
        id_col,
        "chunk_idx",
        F.col("_start").alias("chunk_start"),
        F.size(win).alias("n_tokens"),
        F.array_join(win, " ").alias("chunk_text"),
    )
