"""Exact-substring dedup (ExactSubstr, Lee et al. 2022): duplicated-run
detection keeps the canonical first occurrence, merges overlapping windows,
and scrubbing removes exactly the marked tokens."""

from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.substr_dedup import (
    duplicated_spans,
    scrub_duplicated_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_run_marks_later_occurrence_only(spark):
    # the 4-token run "a b c d" appears in doc 1 (canonical: lowest doc_id)
    # and doc 2 — only doc 2's occurrence is a span
    df = _df(
        spark,
        [
            (1, "a b c d x y z w"),
            (2, "p q a b c d r s"),
            (3, "totally different words here now ok fine yes"),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=4).collect()
    }
    assert got == {(2, 2, 6)}


def test_overlapping_windows_merge_into_one_span(spark):
    # a 6-token duplicated run yields three overlapping 4-gram hits
    # (pos 0,1,2 in the copy) that must merge to one [start, start+6) span
    run = "alpha beta gamma delta epsilon zeta"
    df = _df(spark, [(1, run + " tail one two"), (2, "head " + run + " more")])
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=4).collect()
    }
    assert got == {(2, 1, 7)}


def test_within_document_repetition_detected(spark):
    # the same doc repeating a run: second occurrence marked, first kept
    df = _df(spark, [(1, "x y z w junk filler x y z w")])
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=4).collect()
    }
    assert got == {(1, 6, 10)}


def test_short_and_empty_docs_yield_nothing(spark):
    df = _df(spark, [(1, "a b"), (2, ""), (3, None), (4, "a b")])
    # docs shorter than n produce no grams at all (sequence(1,0) is NOT
    # empty in Spark — the guard is what this asserts)
    assert duplicated_spans(df, n=4).count() == 0


def test_scrub_removes_exactly_marked_tokens(spark):
    df = _df(
        spark,
        [
            (1, "a b c d x y z w"),
            (2, "p q a b c d r s"),
            (3, "clean doc stays verbatim"),
        ],
    )
    spans = duplicated_spans(df, n=4)
    out = {
        r.doc_id: (r.text, r.n_dropped_tokens)
        for r in scrub_duplicated_spans(df, spans).collect()
    }
    assert out[1] == ("a b c d x y z w", 0)
    assert out[2] == ("p q r s", 4)
    assert out[3] == ("clean doc stays verbatim", 0)


def test_scrub_empty_doc_passthrough(spark):
    df = _df(spark, [(1, ""), (2, "a b c d"), (3, "a b c d")])
    spans = duplicated_spans(df, n=4)
    out = {r.doc_id: r.text for r in scrub_duplicated_spans(df, spans).collect()}
    assert out[1] == ""
    assert out[2] == "a b c d"  # canonical kept
    assert out[3] == ""  # entire doc was a duplicate


def test_no_pairwise_stage_in_plan(spark):
    """The plan must contain no cartesian/broadcast-nested-loop stage —
    occurrences join gram STATS, never each other."""
    df = _df(spark, [(1, "a b c d e"), (2, "a b c d e")])
    plan = (
        duplicated_spans(df, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scrub_preserves_original_case(spark):
    """Detection is case-insensitive (tokens_col lowers), but the scrubbed
    text keeps the surviving tokens' ORIGINAL casing."""
    df = _df(
        spark,
        [
            (1, "A B C D x y z w"),
            (2, "P Q a b C d R s"),  # duplicated run, mixed case
        ],
    )
    spans = duplicated_spans(df, n=4)
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()} == {
        (2, 2, 6)
    }
    out = {r.doc_id: r.text for r in scrub_duplicated_spans(df, spans).collect()}
    assert out[1] == "A B C D x y z w"
    assert out[2] == "P Q R s"


def test_custom_id_col_composes(spark):
    """duplicated_spans output carries the caller's id_col (regression: it
    was hardcoded to doc_id, breaking composition with scrub)."""
    df = spark.createDataFrame(
        [(1, "a b c d x y z w"), (2, "p q a b c d r s")],
        "conv_id long, text string",
    )
    spans = duplicated_spans(df, n=4, id_col="conv_id")
    assert spans.columns == ["conv_id", "span_start", "span_end"]
    out = {
        r.conv_id: r.text
        for r in scrub_duplicated_spans(df, spans, id_col="conv_id").collect()
    }
    assert out[2] == "p q r s"


def test_scrub_null_text_verbatim(spark):
    """NULL text passes through as NULL with 0 dropped (regression: ANSI
    size(NULL) silently rewrote it to '' with a NULL count)."""
    df = _df(spark, [(1, None), (2, "a b c d"), (3, "a b c d")])
    spans = duplicated_spans(df, n=4)
    out = {
        r.doc_id: (r.text, r.n_dropped_tokens)
        for r in scrub_duplicated_spans(df, spans).collect()
    }
    assert out[1] == (None, 0)
