"""N-gram LM perplexity filter: exact counts, add-k smoothing math,
unseen-gram degradation, short-doc NULLs."""

import math

from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.ngram_lm import (
    perplexity_score,
    train_ngram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model(spark, ref):
    bi = train_ngram_counts(ref, n=2)
    uni = train_ngram_counts(ref, n=1)
    v = uni.count()
    return bi, uni, v


def test_counts_exact(spark):
    ref = _docs(spark, [(1, "a b a c"), (2, "a b")])
    got = {r.gram: r.cnt for r in train_ngram_counts(ref, n=2).collect()}
    assert got == {"a b": 2, "b a": 1, "a c": 1}
    uni = {r.gram: r.cnt for r in train_ngram_counts(ref, n=1).collect()}
    assert uni == {"a": 3, "b": 2, "c": 1}


def test_smoothed_probability_hand_check(spark):
    ref = _docs(spark, [(1, "a b a c")])
    bi, uni, v = _model(spark, ref)
    assert v == 3
    out = {
        r.doc_id: r
        for r in perplexity_score(
            _docs(spark, [(10, "a b")]), bi, uni, v, n=2, k=0.5
        ).collect()
    }
    # P(b|a) = (c("a b")+0.5) / (c("a")+0.5*3) = 1.5 / 3.5
    exp = math.log2(1.5 / 3.5)
    assert out[10].n_scored == 1
    assert out[10].avg_logp == round(exp, 6)
    assert out[10].ppl == round(2 ** -exp, 4)


def test_unseen_text_scores_worse_not_crash(spark):
    ref = _docs(spark, [(1, "the cat sat on the mat " * 3)])
    bi, uni, v = _model(spark, ref)
    out = {
        r.doc_id: r.ppl
        for r in perplexity_score(
            _docs(
                spark,
                [(1, "the cat sat on the mat"), (2, "zz qq ww ee rr tt")],
            ),
            bi,
            uni,
            v,
        ).collect()
    }
    assert out[1] is not None and out[2] is not None
    assert out[2] > out[1]  # out-of-domain text = higher perplexity


def test_short_docs_null_scores(spark):
    ref = _docs(spark, [(1, "a b c")])
    bi, uni, v = _model(spark, ref)
    out = {
        r.doc_id: r
        for r in perplexity_score(
            _docs(spark, [(1, "a"), (2, ""), (3, "a b")]), bi, uni, v
        ).collect()
    }
    assert out[1].ppl is None and out[1].n_scored == 0
    assert out[2].ppl is None
    assert out[3].ppl is not None


def test_empty_docs_do_not_inflate_model(spark):
    """An empty/whitespace-only document tokenizes as [''] under raw
    split; _lm_tokens must drop it so the '' token never enters the
    unigram model or vocab_size (review finding r4-ADVICE)."""
    ref = _docs(spark, [(1, "a b"), (2, ""), (3, "   "), (4, None)])
    uni = {r.gram: r.cnt for r in train_ngram_counts(ref, n=1).collect()}
    assert uni == {"a": 1, "b": 1}  # no '' gram, vocab_size 2
    bi, uni_df, v = _model(spark, ref)
    assert v == 2
    out = {
        r.doc_id: r
        for r in perplexity_score(
            _docs(spark, [(10, "a b"), (11, "")]), bi, uni_df, v, n=2, k=0.5
        ).collect()
    }
    assert out[10].n_scored == 1 and out[10].ppl is not None
    # the empty doc has nothing to score: NULL, never invented fluency
    assert out[11].n_scored == 0 and out[11].ppl is None
