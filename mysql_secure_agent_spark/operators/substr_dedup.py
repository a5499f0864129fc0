"""Exact-substring deduplication — the ExactSubstr pass of "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022, public): any
token run of length ≥ n that occurs more than once in the corpus is a
duplicated span; every occurrence EXCEPT the canonical first one is marked
(and optionally scrubbed from the training text). Boilerplate, licenses,
templated headers and wholesale document copies all fall out of this one
primitive; MinHash-level near-dup (``text_dedup``) cannot see a duplicated
paragraph inside two otherwise-different documents.

Spark-first shape (the paper builds one giant suffix array — a single-node
construction; this is the distributed equivalent at fixed window length):

1. per document, the n-token grams at EVERY position — row-local array
   algebra (``sequence`` → ``transform(slice)``), one explode to
   ``(gram_key, doc_id, pos)``. O(total tokens) rows, the same asymptotic
   cost as the suffix array's leaf count.
2. ONE groupBy(gram_key) partial-agg computes each gram's global occurrence
   count and canonical (earliest ``(doc_id, pos)``) occurrence — map-side
   combine keeps hot grams (boilerplate appearing millions of times) from
   concentrating rows: the shuffle carries one row per gram per map
   partition, and no pairwise blowup exists anywhere (occurrences join back
   to the gram row, never to each other).
3. join occurrences back on gram_key; non-canonical occurrences of
   duplicated grams become spans ``[pos, pos+n)``; per document a single
   fold merges overlapping spans.

``gram_key`` is the full 128-bit md5 hex of the gram text (portable to the
SQL oracle; collision odds negligible at any corpus size — a 32-bit fold
would mark false duplicates at 10^10 grams). ``scrub_duplicated_spans``
rebuilds the training text with the marked token ranges removed — again
pure array algebra, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import tokens_col


def _merged_spans(pos_list, n: int):
    """Sorted occurrence positions → merged ``struct<start,end>`` spans,
    treating spans closer than n tokens as one run (``[p, p+n)`` windows
    overlap or touch)."""
    last = F.element_at  # alias for readability below

    def step(acc, p):
        # guarded: element_at(-1) on an EMPTY array errors under ANSI mode,
        # and CaseWhen conditions are evaluated before branch selection
        prev_end = F.when(F.size(acc) > 0, last(acc, -1)["end"])
        grown = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last(acc, -1)["start"].alias("start"),
                    F.greatest(prev_end, p + n).alias("end"),
                )
            ),
        )
        fresh = F.array_append(
            acc, F.struct(p.alias("start"), (p + n).alias("end"))
        )
        return F.when((F.size(acc) == 0) | (p > prev_end), fresh).otherwise(grown)

    acc0 = F.expr("CAST(array() AS array<struct<start:int,end:int>>)")
    return F.aggregate(F.sort_array(pos_list), acc0, step)


def duplicated_spans(
    df: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token spans (0-based ``[span_start, span_end)``) of every duplicated
    ≥n-token run, EXCLUDING the corpus-wide canonical first occurrence
    (smallest ``(id, pos)``) — one output row per merged span:
    ``(id_col, span_start, span_end)``.

    Cost at scale: O(total tokens) exploded gram rows, one partial-agg
    shuffle on gram_key + one join back, one groupBy(doc) fold. No
    all-pairs stage exists.
    """
    toks = tokens_col(text_col)
    # NB: sequence(1, 0) yields a DESCENDING [1, 0], not an empty array —
    # short documents need the explicit guard
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    grams = F.transform(
        starts,
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.md5(F.array_join(F.slice(toks, i, n), " ")).alias("k"),
        ),
    )
    occ = df.select(
        F.col(id_col).alias(id_col), F.explode(grams).alias("g")
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.k").alias("k"))
    # A hot gram (boilerplate occurring millions of times) makes this an
    # equi-join on a skewed key; each occurrence matches exactly ONE stats
    # row (no blowup) and AQE skew-join splits the oversized partitions.
    stats = occ.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("canon"),
    )
    dup = (
        occ.join(stats.filter(F.col("cnt") > 1), "k")
        .filter(
            (F.col(id_col) != F.col(f"canon.{id_col}"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .select(id_col, "pos")
    )
    merged = dup.groupBy(id_col).agg(
        _merged_spans(F.collect_list("pos"), n).alias("_spans")
    )
    s = F.col("_s")
    return merged.select(id_col, F.explode("_spans").alias("_s")).select(
        id_col,
        s["start"].alias("span_start"),
        s["end"].alias("span_end"),
    )


def scrub_duplicated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove the duplicated token ranges from the training text: documents
    LEFT-joined to their merged spans (docs with none pass through
    verbatim), kept tokens rejoined with single spaces. Output:
    ``(id_col, text, n_dropped_tokens)``. Row-local array algebra — the
    only exchange is the groupBy packing spans per doc."""
    sp = spans.groupBy(F.col(id_col)).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("start"), F.col("span_end").alias("end")
            )
        ).alias("_spans")
    )
    # ORIGINAL-case tokens: detection tokenizes lowercased (tokens_col), but
    # scrubbed training text must keep its casing — positions align because
    # lowercasing never changes whitespace token boundaries
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    joined = df.join(sp, id_col, "left").withColumn(
        "_spans",
        F.coalesce(
            F.col("_spans"),
            F.expr("CAST(array() AS array<struct<start:int,end:int>>)"),
        ),
    )
    # sequence(0, -1) would yield a DESCENDING [0, -1] — guard empty docs
    idx = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("_spans"), lambda s: (i >= s["start"]) & (i < s["end"])
        ),
    )
    dropped = (F.size(toks) - F.size(kept)).cast("int")
    scrubbed = F.array_join(
        F.transform(kept, lambda i: F.element_at(toks, i + 1)), " "
    )
    # NULL text passes through VERBATIM (size(NULL) under ANSI would
    # otherwise silently rewrite it to '' with a NULL drop count)
    is_null = F.col(text_col).isNull()
    return joined.select(
        F.col(id_col),
        F.when(is_null, F.lit(None).cast("string"))
        .otherwise(scrubbed)
        .alias("text"),
        F.when(is_null, F.lit(0)).otherwise(dropped).alias("n_dropped_tokens"),
    )
