"""SCD-2 history operator: interval construction vs a sequential fold."""

from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.operators.scd2 import scd2_as_of, scd2_history

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("source_lsn", T.LongType(), False),
    ]
)

FEED = [
    # key 1: I -> U -> D -> I (re-insert after delete)
    ("I", 1, "a", 10),
    ("U", 1, "b", 20),
    ("D", 1, None, 30),
    ("I", 1, "c", 40),
    # key 2: open interval after one update
    ("I", 2, "x", 15),
    ("U", 2, "y", 25),
    # key 3: delete-first (row predates the feed) then nothing
    ("D", 3, None, 12),
    # key 4: single insert, still current
    ("I", 4, "q", 50),
]


def _history(spark):
    df = spark.createDataFrame(FEED, SCHEMA)
    return scd2_history(df, key_cols=["k"])


def test_intervals_and_currency(spark):
    rows = {
        (r.k, r.valid_from_lsn): (r.v, r.valid_to_lsn, r.is_current)
        for r in _history(spark).collect()
    }
    assert rows == {
        (1, 10): ("a", 20, False),
        (1, 20): ("b", 30, False),  # closed by the DELETE's lsn
        (1, 40): ("c", None, True),  # re-insert is current
        (2, 15): ("x", 25, False),
        (2, 25): ("y", None, True),
        (4, 50): ("q", None, True),
        # key 3 emits nothing: its only event is a delete
    }


def test_current_rows_match_last_image_semantics(spark):
    """is_current rows == the final-state reconcile (last image, no deleted
    keys) — the same contract LakeTable.read satisfies."""
    from mysql_secure_agent_spark.operators.dedup_changelog import last_image_wins

    df = spark.createDataFrame(FEED, SCHEMA)
    cur = {
        (r.k, r.v) for r in _history(spark).filter("is_current").collect()
    }
    last = last_image_wins(df, ["k"]).filter(F.col("op") != "D")
    assert cur == {(r.k, r.v) for r in last.collect()}


def test_as_of_point_in_time(spark):
    h = _history(spark)
    # at lsn 25: key1 = "b" (20..30), key2 = "y" (25..), key3 gone, key4 not yet
    state = {(r.k, r.v) for r in scd2_as_of(h, 25).collect()}
    assert state == {(1, "b"), (2, "y")}
    # at lsn 35: key1 deleted (30 closed "b", re-insert at 40 not yet valid)
    state = {(r.k, r.v) for r in scd2_as_of(h, 35).collect()}
    assert state == {(2, "y")}


def test_single_exchange_plan(spark):
    """History construction must cost exactly one shuffle."""
    plan = _history(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
