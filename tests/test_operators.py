"""Unit tests for the core operators (dedup window, skew salting, normalize)."""

import pandas as pd
from pyspark.sql import functions as F

from mysql_secure_agent_spark.functions.normalize import normalize_text_udf
from mysql_secure_agent_spark.operators.dedup_changelog import last_image_wins
from mysql_secure_agent_spark.operators.skew import salted_repartition


def _changes(spark):
    rows = [
        ("I", "a", 1, "hello", 1),
        ("U", "a", 1, "hello v2", 3),
        ("U", "a", 1, "hello v3", 7),
        ("I", "a", 2, "x", 2),
        ("D", "a", 2, None, 5),
        ("I", "b", 1, "y", 4),
    ]
    return spark.createDataFrame(
        rows, "op string, conv_id string, turn_idx int, text string, source_lsn long"
    )


def test_last_image_wins_strategies_agree(spark):
    df = _changes(spark)
    for strategy in ("window", "max_by"):
        out = last_image_wins(df, ["conv_id", "turn_idx"], strategy=strategy)
        got = {
            (r["conv_id"], r["turn_idx"]): (r["op"], r["text"], r["source_lsn"])
            for r in out.collect()
        }
        assert got == {
            ("a", 1): ("U", "hello v3", 7),
            ("a", 2): ("D", None, 5),
            ("b", 1): ("I", "y", 4),
        }


def test_max_by_plan_has_partial_aggregation(spark):
    """The scale-path dedup must show a two-phase HashAggregate (map-side
    partial combine) — the property that defuses hot-key shuffle volume."""
    df = _changes(spark)
    plan = (
        last_image_wins(df, ["conv_id", "turn_idx"], strategy="max_by")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan


def test_salted_repartition_spreads_hot_key(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["hot"] * 1000 + ["c1", "c2"] * 10,
            "source_lsn": range(1020),
        }
    )
    df = spark.createDataFrame(pdf)
    out = salted_repartition(df, ["conv_id"], n_partitions=8, salt_buckets=8)
    sizes = out.rdd.glom().map(len).collect()
    assert len([s for s in sizes if s > 0]) >= 4  # hot key spread over partitions
    assert out.count() == 1020
    assert "_salt" not in out.columns


def test_normalize_text_udf(spark):
    df = spark.createDataFrame(
        [("  héllo\x00   wörld  ",), ("a\tb",), (None,)], "text string"
    )
    got = [r[0] for r in df.select(normalize_text_udf("text")).collect()]
    assert got == ["héllo wörld", "a b", None]
