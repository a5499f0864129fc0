"""asof_join: point-in-time enrichment via one shuffle + window."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b", "b", "c"],
                "t": [1, 5, 10, 3, 4, 7],
                "x": [10, 50, 100, 30, 40, 70],
            }
        )
    )


def _right(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b", "b", "d"],
                "rt": [1, 6, 2, 4, 1],
                "v": ["a1", "a6", "b2", "b4", "d1"],
            }
        )
    )


def test_backward_inclusive(spark):
    out = (
        asof_join(_left(spark), _right(spark), on=["k"], left_on="t", right_on="rt")
        .orderBy("k", "t")
        .collect()
    )
    got = [(r["k"], r["t"], r["v"]) for r in out]
    # t=1 matches rt=1 (inclusive); t=5 -> rt=1; t=10 -> rt=6; b:t=3 -> rt=2;
    # b:t=4 -> rt=4 (inclusive); c has no right rows -> null
    assert got == [
        ("a", 1, "a1"),
        ("a", 5, "a1"),
        ("a", 10, "a6"),
        ("b", 3, "b2"),
        ("b", 4, "b4"),
        ("c", 7, None),
    ]


def test_strict(spark):
    out = (
        asof_join(
            _left(spark), _right(spark), on=["k"], left_on="t", right_on="rt",
            strict=True,
        )
        .orderBy("k", "t")
        .collect()
    )
    got = [(r["k"], r["t"], r["v"]) for r in out]
    # t=1 no longer matches rt=1; b:t=4 falls back to rt=2
    assert got == [
        ("a", 1, None),
        ("a", 5, "a1"),
        ("a", 10, "a6"),
        ("b", 3, "b2"),
        ("b", 4, "b2"),
        ("c", 7, None),
    ]


def test_left_rows_and_columns_preserved(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_on="t", right_on="rt"
    )
    assert out.columns == ["k", "t", "x", "v"]
    assert out.count() == 6
    # left payload column untouched
    assert {r["x"] for r in out.collect()} == {10, 50, 100, 30, 40, 70}


def test_value_col_clash_raises(spark):
    bad = _right(spark).withColumnRenamed("v", "x")
    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), bad, on=["k"], left_on="t", right_on="rt")


def test_plan_single_shuffle(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_on="t", right_on="rt"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange (the window's partitionBy) and NO join node: the operator
    # must not degrade to a range/cartesian join
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("CartesianProduct", "SortMergeJoin", "BroadcastNestedLoop"):
        assert bad not in plan


def test_null_payload_column_not_backfilled(spark):
    """All payload columns must come from the SINGLE matched right row — a
    NULL in one column of the matched row must stay NULL, not back-fill from
    an older right row (the pre-struct implementation's bug)."""
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [5, 12]})
    )
    right = spark.createDataFrame(
        [("a", 1, "v1", "w1"), ("a", 10, None, "w10")],
        schema="k string, rt long, v string, w string",
    )
    out = {
        r["t"]: (r["v"], r["w"])
        for r in asof_join(
            left, right, on=["k"], left_on="t", right_on="rt"
        ).collect()
    }
    assert out[5] == ("v1", "w1")
    # matched row rt=10 has v=NULL: v must be None, NOT "v1" from rt=1
    assert out[12] == (None, "w10")


def test_no_match_yields_all_null_payload(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [0]}))
    right = spark.createDataFrame(
        [("a", 10, "v", 1.5)], schema="k string, rt long, v string, z double"
    )
    row = asof_join(left, right, on=["k"], left_on="t", right_on="rt").collect()[0]
    assert row["v"] is None and row["z"] is None
