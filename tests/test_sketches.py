"""HyperLogLog register sketches (operators/sketches.py).

Covered: accuracy vs exact distinct at p=12 (expected rel-err ~1.04/√m
≈ 1.6%, asserted at 5%), EXACT shard-merge equivalence (union of
per-shard sketches == one-shot sketch — the mergeability contract),
null handling, both hash tiers, the linear-counting small range, and
determinism across repeated runs.
"""

import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.sketches import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _users(spark, n, groups=("a", "b")):
    return (
        spark.range(n * len(groups))
        .select(
            F.element_at(
                F.array(*[F.lit(g) for g in groups]),
                (F.col("id") % len(groups) + 1).cast("int"),
            ).alias("seg"),
            (F.col("id") / len(groups)).cast("long").alias("user_id"),
        )
    )


def test_accuracy_within_hll_bounds(spark):
    df = _users(spark, 5000)
    got = {r.seg: r.approx for r in approx_distinct(df, ["seg"], "user_id").collect()}
    for seg in ("a", "b"):
        assert abs(got[seg] - 5000) / 5000 < 0.05, got


def test_small_range_linear_counting_is_near_exact(spark):
    df = _users(spark, 40)
    got = {r.seg: r.approx for r in approx_distinct(df, ["seg"], "user_id").collect()}
    # 40 values in 4096 registers: linear counting is essentially exact
    for seg in ("a", "b"):
        assert abs(got[seg] - 40) < 2


def test_shard_merge_equals_one_shot(spark):
    df = _users(spark, 3000).withColumn("shard", (F.col("user_id") % 4).cast("int"))
    one = hll_registers(df, ["seg"], "user_id")
    sharded = hll_merge(
        hll_registers(df, ["seg", "shard"], "user_id").drop("shard"), ["seg"]
    )
    # identical register tables → identical estimates, exactly
    assert one.exceptAll(sharded).count() == 0
    assert sharded.exceptAll(one).count() == 0
    e1 = {r.seg: r.approx for r in hll_estimate(one, ["seg"]).collect()}
    e2 = {r.seg: r.approx for r in hll_estimate(sharded, ["seg"]).collect()}
    assert e1 == e2


def test_duplicates_do_not_move_the_estimate(spark):
    base = _users(spark, 1000)
    dup = base.unionAll(base).unionAll(base)
    a = approx_distinct(base, ["seg"], "user_id").collect()
    b = approx_distinct(dup, ["seg"], "user_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_nulls_not_counted(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "seg string, user_id long"
    )
    got = approx_distinct(df, ["seg"], "user_id").first()
    assert abs(got.approx - 2) < 0.5


def test_xxhash_tier_accuracy_and_rejects_unknown(spark):
    df = _users(spark, 5000)
    got = {
        r.seg: r.approx
        for r in approx_distinct(df, ["seg"], "user_id", hash_fn="xxhash64").collect()
    }
    for seg in ("a", "b"):
        assert abs(got[seg] - 5000) / 5000 < 0.05
    with pytest.raises(ValueError):
        approx_distinct(df, ["seg"], "user_id", hash_fn="sha9000")
    with pytest.raises(ValueError):
        hll_registers(df, ["seg"], "user_id", p=2)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_plan_is_one_exchange_with_partial_agg(spark):
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    plan = _plan(hll_registers(df, ["g"], "v"))
    # map-side combine BEFORE the shuffle: the wire carries <= m rows per
    # group per map partition, the property the 100 TB story rests on
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1
    # pure Catalyst: no Python evaluation anywhere in the sketch
    assert "Python" not in plan and "Arrow" not in plan


def test_cms_plan_is_one_exchange_with_partial_agg(spark):
    from pyspark.sql import functions as F

    from mysql_secure_agent_spark.operators.sketches import cms_rows

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    plan = _plan(cms_rows(df, ["g"], "v"))
    assert "partial_sum" in plan
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "Arrow" not in plan


# --------------------------------------------------- histogram quantiles
def test_histogram_quantiles_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from mysql_secure_agent_spark.operators.sketches import (
        histogram_merge,
        histogram_quantiles,
        histogram_rows,
    )

    # uniform 0..9999 per segment → true pXX known exactly
    df = spark.range(20_000).select(
        F.element_at(
            F.array(F.lit("a"), F.lit("b")), (F.col("id") % 2 + 1).cast("int")
        ).alias("seg"),
        (F.col("id") / 2).cast("double").alias("v"),
    )
    rows = histogram_rows(df, ["seg"], "v", lo=0.0, hi=10_000.0, bins=200)
    got = {
        (r.seg, r.q): r.est
        for r in histogram_quantiles(
            rows, ["seg"], [0.5, 0.95, 0.99], 0.0, 10_000.0, 200
        ).collect()
    }
    for seg in ("a", "b"):
        assert abs(got[(seg, 0.5)] - 5000) <= 50   # one bin width
        assert abs(got[(seg, 0.95)] - 9500) <= 50
        assert abs(got[(seg, 0.99)] - 9900) <= 50
    # shard merge is lossless: identical bins → identical estimates
    sharded = histogram_merge(
        histogram_rows(
            df.withColumn("shard", (F.col("v") % 4).cast("int")),
            ["seg", "shard"], "v", 0.0, 10_000.0, 200,
        ).drop("shard"),
        ["seg"],
    )
    assert rows.exceptAll(sharded).count() == 0
    assert sharded.exceptAll(rows).count() == 0


def test_histogram_clamps_out_of_range(spark):
    from pyspark.sql import functions as F

    from mysql_secure_agent_spark.operators.sketches import histogram_rows

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.5,), (1e9,)], "v double"
    )
    rows = {r.bin: r.cnt for r in histogram_rows(df, [], "v", 0.0, 100.0, 10).collect()}
    assert rows == {0: 2, 9: 2}  # -5 clamps to bin 0, 1e9 to bin 9
