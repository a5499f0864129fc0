"""Model-scored quality filtering — the fastText-style hashed linear
classifier every large pretraining pipeline runs (CCNet's LM filter, the
GPT-3 "quality classifier" pass): tokens → hashing-trick feature buckets →
mean-pooled linear score → sigmoid → keep/drop.

Spark-first shape: ZERO Python anywhere. Tokenization, bucket hashing,
weight lookup, and the pooled sum are all Catalyst expressions (split /
higher-order ``transform``/``aggregate``), so scoring 10^10 documents is a
single scan with no shuffle at all — quality filtering is embarrassingly
parallel and must stay that way.

Numeric portability: weights are INTEGER milli-units and the pooled sum is
an exact BIGINT fold; only the final mean + sigmoid touch floating point
(one division, one exp). That makes the score reproducible bit-for-bit
across engines (the oracle recomputes it in DuckDB) — a float-summed dot
product would depend on summation order.

Two weight sources:

* ``weights=None`` (default): deterministic md5-derived pseudo-weights —
  weight(bucket) = (h32('w:' + bucket) % 2001) - 1000 milli-units in
  [-1, 1]. No model file, fully oracle-checkable; stands in for a trained
  model's weights in tests/benchmarks.
* ``weights=[...]``: a real trained weight vector (len == n_buckets,
  milli-units as ints), embedded as one literal array and indexed by
  ``element_at`` — the hashing-trick deployment path (the model rides the
  PLAN, not a join; at n_buckets ≤ ~64k this stays a broadcast-free scan).

Reference scope note: the reference agent has no content scoring at all —
this is training-data surface beyond it (SURVEY "LLM-data-pipeline
operators" family, alongside dedup/lang-id/quality heuristics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import _h32


def _clean_tokens(text_col: str):
    """Lowered whitespace tokens with the ``split('') == ['']`` trap
    removed — empty/blank text yields an empty token array."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def token_bucket(tok, n_buckets: int):
    """Hashing-trick bucket for one token: h32('q:' + token) mod n_buckets
    (md5-backed — identical in the SQL oracle)."""
    return F.pmod(_h32(F.concat(F.lit("q:"), tok)), F.lit(n_buckets))


def _derived_weight_milli(bucket):
    """Deterministic pseudo-weight for a bucket, in integer milli-units
    [-1000, 1000]: (h32('w:' + bucket) % 2001) - 1000."""
    return (
        F.pmod(
            _h32(F.concat(F.lit("w:"), bucket.cast("string"))), F.lit(2001)
        )
        - F.lit(1000)
    ).cast("long")


def linear_quality_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    weights: list[int] | None = None,
    bias_milli: int = 0,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a hashed linear classifier and flag keeps.

    Output: ``(id_col, n_tokens, margin, score, keep)`` where
    ``margin = (bias + Σ weight[bucket(token)]) / 1000 / max(n_tokens, 1)``
    (mean pooling, fastText-style), ``score = sigmoid(margin)`` rounded to
    6 places, and ``keep = score >= threshold``. The weighted sum is an
    exact integer fold; empty documents score ``sigmoid(bias)``.

    ``weights``: optional trained weight vector in integer milli-units,
    ``len(weights) == n_buckets``; None uses the md5-derived pseudo-model.
    """
    if weights is not None:
        if len(weights) != n_buckets:
            raise ValueError(
                f"weights has {len(weights)} entries, n_buckets={n_buckets}"
            )
        warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])

        def w_of(tok):
            return F.element_at(warr, token_bucket(tok, n_buckets).cast("int") + 1)

    else:

        def w_of(tok):
            return _derived_weight_milli(token_bucket(tok, n_buckets))

    toks = _clean_tokens(text_col)
    sum_milli = F.aggregate(
        toks, F.lit(int(bias_milli)).cast("long"), lambda acc, t: acc + w_of(t)
    )
    n_tokens = F.size(toks)
    margin = (sum_milli / F.lit(1000.0)) / F.greatest(n_tokens, F.lit(1)).cast(
        "double"
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(margin, 6).alias("margin"),
        score.alias("score"),
        (score >= F.lit(threshold)).alias("keep"),
    )
