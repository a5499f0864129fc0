"""Hashed linear quality classifier: exact integer-fold scoring, empty-doc
and custom-weight paths, and the zero-shuffle plan shape."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.quality_filter import (
    linear_quality_score,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _expected(text: str, n_buckets=256, bias=0, threshold=0.5):
    toks = [t for t in text.strip().lower().split() if t]
    s = bias
    for t in toks:
        b = _h32("q:" + t) % n_buckets
        s += (_h32(f"w:{b}") % 2001) - 1000
    margin = (s / 1000.0) / max(len(toks), 1)
    score = round(1.0 / (1.0 + math.exp(-margin)), 6)
    return len(toks), round(margin, 6), score, score >= threshold


def test_score_matches_hand_recompute(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "lorem ipsum dolor sit amet"),
        (3, "one"),
        (4, "  spaced   out   tokens  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.margin, r.score, r.keep)
        for r in linear_quality_score(df).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _expected(text), text


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in linear_quality_score(df, bias_milli=500).collect()}
    for i in (1, 2):
        assert out[i].n_tokens == 0
        assert out[i].margin == 0.5  # bias/1000 over max(n,1)=1
        assert out[i].score == round(1 / (1 + math.exp(-0.5)), 6)
    # NULL text: null tokens → null size; scores stay null, never invented
    assert out[3].score is None


def test_custom_weights_vector(spark):
    """A trained weight vector rides the plan: all-1000 milli weights give
    margin exactly 1.0 for any non-empty doc (mean pooling)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "zz")], "doc_id long, text string"
    )
    out = linear_quality_score(
        df, n_buckets=16, weights=[1000] * 16, threshold=0.7
    ).collect()
    for r in out:
        assert r.margin == 1.0
        assert r.score == round(1 / (1 + math.exp(-1.0)), 6)
        assert bool(r.keep) is True


def test_weights_arity_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        linear_quality_score(df, n_buckets=8, weights=[1, 2, 3])


def test_plan_has_no_exchange(spark):
    """Quality scoring is a pure scan — any Exchange in the plan would be a
    scale bug (10^10 docs must not shuffle to be scored)."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("some sample text").alias("text")
    )
    plan = linear_quality_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
