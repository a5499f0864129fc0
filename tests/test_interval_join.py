"""Stream-stream interval join: batch twin is the oracle for the stream."""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.streaming.interval_join import interval_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    clicks = spark.createDataFrame(
        [
            (1, 100, _ts(0)),
            (1, 101, _ts(60)),
            (2, 102, _ts(0)),
            (3, 103, _ts(0)),
        ],
        "user_id long, click_id long, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [
            (1, 900, _ts(10)),     # matches click 100 (in window)
            (1, 901, _ts(30)),     # matches click 100 (boundary, inclusive)
            (1, 902, _ts(59)),     # before click 101 only via click 100? 59-0=59 > 30 -> no; 59 < 60 -> not matched by 101
            (1, 903, _ts(75)),     # matches click 101
            (2, 904, _ts(-5)),     # before the click -> no match
            (4, 905, _ts(5)),      # key with no clicks
        ],
        "user_id long, purchase_id long, ts timestamp",
    )
    return clicks, purchases


def test_batch_semantics_inclusive_window_and_keys(spark):
    clicks, purchases = _frames(spark)
    j = interval_join(clicks, purchases, ["user_id"], upper="30 minutes")
    got = sorted(
        (r["user_id"], r["l_click_id"], r["r_purchase_id"])
        for r in j.collect()
    )
    assert got == [(1, 100, 900), (1, 100, 901), (1, 101, 903)]


def test_streaming_matches_batch(spark, tmp_path):
    """File-source streams drained in micro-batches produce exactly the
    batch join (watermark wide enough that nothing is dropped)."""
    clicks, purchases = _frames(spark)
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    # two files per side -> multiple micro-batches exercise state buffering
    clicks.repartition(2).write.parquet(cdir)
    purchases.repartition(2).write.parquet(pdir)
    cs = (
        spark.readStream.schema("user_id long, click_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    ps = (
        spark.readStream.schema(
            "user_id long, purchase_id long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
    )
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        interval_join(
            cs, ps, ["user_id"], upper="30 minutes", watermark_delay="10 days"
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["l_click_id"], r["r_purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
    )
    batch = sorted(
        (r["user_id"], r["l_click_id"], r["r_purchase_id"])
        for r in interval_join(
            clicks, purchases, ["user_id"], upper="30 minutes"
        ).collect()
    )
    assert got == batch and len(got) == 3


def test_streaming_without_watermark_refused(spark, tmp_path):
    clicks, _ = _frames(spark)
    cdir = str(tmp_path / "c")
    clicks.write.parquet(cdir)
    cs = spark.readStream.schema(
        "user_id long, click_id long, ts timestamp"
    ).parquet(cdir)
    with pytest.raises(ValueError, match="watermark_delay"):
        interval_join(cs, cs, ["user_id"])


def test_composite_key_and_no_open_upper_bound(spark):
    clicks, purchases = _frames(spark)
    clicks = clicks.withColumn("region", F.lit("eu"))
    purchases = purchases.withColumn(
        "region", F.when(F.col("purchase_id") == 900, "us").otherwise("eu")
    )
    j = interval_join(
        clicks, purchases, ["user_id", "region"], upper="30 minutes"
    )
    got = sorted(
        (r["user_id"], r["l_click_id"], r["r_purchase_id"])
        for r in j.collect()
    )
    # purchase 900 moved to another region -> only the other two survive
    assert got == [(1, 100, 901), (1, 101, 903)]
    with pytest.raises(ValueError, match="equality key"):
        interval_join(clicks, purchases, [])
