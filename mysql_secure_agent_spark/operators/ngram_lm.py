"""N-gram language-model perplexity scoring — the CCNet-style "perplexity
filter": score every document against an n-gram LM trained on a reference
corpus and keep/bucket by perplexity (public method: CCNet, Wenzek et al.
2020, which uses a KenLM 5-gram; the Gopher/MassiveText and LLaMA data
pipelines run the same gate). The classifier pass (``quality_filter``)
scores style features; perplexity scores FLUENCY under a reference
distribution — pipelines run both.

Spark-first shape, zero Python end to end:

* ``train_ngram_counts`` — ONE partial-agg groupBy over the exploded grams
  of the reference corpus (map-side combine absorbs Zipf-hot grams), giving
  the (gram, count) model table. At 10^10 tokens the model is itself a big
  DataFrame — which is the point: it stays distributed, joins instead of
  broadcasts, and can be persisted as a LakeTable like any other artifact.
* ``perplexity_score`` — each scored document explodes to (context, gram)
  pairs, LEFT-joins the n-gram and context count tables (two equi-join
  shuffles — bucketable on the gram key at scale), computes the add-k
  smoothed conditional ``P(w|ctx) = (c(ctx·w)+k) / (c(ctx)+k·V)``, and one
  groupBy(doc) averages log₂P: ``ppl = 2^(−mean log₂ P)``. Unseen grams
  and contexts degrade smoothly through the smoothing (the LEFT joins
  null→0), so out-of-domain text scores high perplexity instead of
  crashing — exactly the filter's purpose.

Every count is exact and integer; only the final log/mean/pow touch
floats, so the whole computation is reproducible in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import tokens_col


def _lm_tokens(text_col: str):
    """LM tokenization: whitespace tokens with empty strings dropped — an
    empty/whitespace-only document tokenizes as [''] under raw split, and
    counting the '' token would inflate the unigram model and vocab_size
    with a modeling artifact (same cleanup as quality_filter._clean_tokens;
    the oracle mirrors the filter)."""
    return F.filter(tokens_col(text_col), lambda t: t != F.lit(""))


def _grams(toks, n: int):
    """Positions 1..len-n+1 → the n-token gram starting there (space-joined
    lowered tokens; empty for short docs — sequence(1,0) would descend)."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def train_ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The model: exact occurrence counts of every n-gram in the reference
    corpus — ``(gram, cnt)``. One explode + one partial-agg shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _lm_tokens(text_col)
    return (
        df.select(F.explode(_grams(toks, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def perplexity_score(
    docs: DataFrame,
    ngram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    *,
    n: int = 2,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document perplexity under the add-k-smoothed n-gram LM:
    ``(doc_id, n_scored, avg_logp, ppl)`` where ``avg_logp`` is the mean
    log₂ of ``P(w|ctx) = (c(ctx·w)+k)/(c(ctx)+k·V)`` over the document's
    scoreable positions and ``ppl = 2^(−avg_logp)``. Documents shorter
    than ``n`` tokens carry NULL scores (nothing to score — flag upstream,
    don't invent fluency).

    ``ngram_counts``/``context_counts``: the ``train_ngram_counts`` outputs
    at order ``n`` and ``n−1`` over the REFERENCE corpus (self-scoring — a
    fluency prior from the corpus itself — is passing the same corpus).
    ``vocab_size`` = the reference's distinct-unigram count (compute once;
    at scale from ``analyze_table``'s ndv or a one-off count_distinct).
    """
    if n < 2:
        raise ValueError("conditional scoring needs n >= 2")
    toks = _lm_tokens(text_col)
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.zip_with(
                _grams(toks, n - 1),
                # contexts run one position further than full grams; drop
                # the dangling last context so the zip is position-aligned
                F.concat(
                    _grams(toks, n),
                    F.array(F.lit(None).cast("string")),
                ),
                lambda c, g: F.struct(c.alias("ctx"), g.alias("gram")),
            )
        ).alias("p"),
    ).filter(F.col("p.gram").isNotNull()).select(
        "doc_id", F.col("p.ctx").alias("ctx"), F.col("p.gram").alias("gram")
    )
    ng = ngram_counts.select(
        F.col("gram"), F.col("cnt").alias("_c_gram")
    )
    cg = context_counts.select(
        F.col("gram").alias("ctx"), F.col("cnt").alias("_c_ctx")
    )
    scored = (
        pairs.join(ng, "gram", "left")
        .join(cg, "ctx", "left")
        .select(
            "doc_id",
            F.log2(
                (F.coalesce(F.col("_c_gram"), F.lit(0)) + F.lit(float(k)))
                / (
                    F.coalesce(F.col("_c_ctx"), F.lit(0))
                    + F.lit(float(k)) * F.lit(float(vocab_size))
                )
            ).alias("_logp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_scored"),
        F.avg("_logp").alias("_avg"),
    )
    out = agg.select(
        "doc_id",
        "n_scored",
        F.round("_avg", 6).alias("avg_logp"),
        F.round(F.pow(F.lit(2.0), -F.col("_avg")), 4).alias("ppl"),
    )
    # documents with no scoreable position (len < n): NULL scores
    short = docs.select(F.col(id_col).alias("doc_id")).join(
        agg.select("doc_id"), "doc_id", "left_anti"
    )
    return out.unionByName(
        short.select(
            "doc_id",
            F.lit(0).cast("int").alias("n_scored"),
            F.lit(None).cast("double").alias("avg_logp"),
            F.lit(None).cast("double").alias("ppl"),
        )
    )
