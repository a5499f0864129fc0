"""Count-min sketch (operators/sketches.py cms_*): one-sided integer
estimates, shard-merge equality, weights, grouping, and missing-counter
zero semantics."""

from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.sketches import (
    cms_estimate,
    cms_merge,
    cms_rows,
)


def _events(spark):
    # user u appears u+1 times, u in 0..49 → known exact counts
    return spark.range(50).selectExpr(
        "explode(sequence(0, CAST(id AS INT))) AS rep", "id AS user_id"
    ).select("user_id")


def test_estimates_are_one_sided_and_tight_here(spark):
    df = _events(spark)
    cms = cms_rows(df, [], "user_id")
    exact = df.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    got = cms_estimate(cms, [], exact, "user_id").collect()
    assert got
    for r in got:
        assert r.cms_n >= r.exact_n
        # 50 values in 4×1024 counters: collisions are rare — near-exact
        assert r.cms_n - r.exact_n <= 5


def test_shard_merge_equals_one_shot(spark):
    df = _events(spark).withColumn("shard", (F.col("user_id") % 3).cast("int"))
    one = cms_rows(df, [], "user_id")
    sharded = cms_merge(cms_rows(df, ["shard"], "user_id").drop("shard"), [])
    assert one.exceptAll(sharded).count() == 0
    assert sharded.exceptAll(one).count() == 0


def test_weighted_counts(spark):
    df = _events(spark).withColumn("wgt", F.lit(3))
    cms = cms_rows(df, [], "user_id", weight_col="wgt")
    probe = spark.createDataFrame([(0,)], "user_id long")
    got = cms_estimate(cms, [], probe, "user_id").first()
    assert got.cms_n >= 3  # user 0 appears once, weight 3


def test_grouped_sketch_and_unknown_value_zero(spark):
    df = _events(spark).withColumn(
        "seg", F.when(F.col("user_id") < 25, "a").otherwise("b")
    )
    cms = cms_rows(df, ["seg"], "user_id")
    probes = spark.createDataFrame(
        [("a", 10), ("b", 10), ("a", 999_999)], "seg string, user_id long"
    )
    got = {(r.seg, r.user_id): r.cms_n
           for r in cms_estimate(cms, ["seg"], probes, "user_id").collect()}
    assert got[("a", 10)] >= 11          # user 10 lives in segment a
    assert got[("a", 999_999)] <= 2      # never seen: ~0 (collision slack)
    # user 10 contributes nothing to segment b's counters beyond collisions
    assert got[("b", 10)] <= 2
