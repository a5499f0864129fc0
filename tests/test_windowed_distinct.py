"""Windowed distinct via HLL registers: bounded streaming state,
batch == streamed-registers estimate on closed windows, late drop."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.sketches import hll_estimate
from mysql_secure_agent_spark.streaming.windowed_agg import (
    windowed_distinct,
    windowed_distinct_registers,
    windowed_distinct_registers_stream,
)

BASE = pd.Timestamp("2026-01-01 00:00:00")


def _mk(rows):
    return pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts"]
    ).astype({"ts": "datetime64[us]"})


def _write_segments(path, frames):
    os.makedirs(path, exist_ok=True)
    schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("ts", pa.timestamp("us"))]
    )
    now = time.time()
    for i, pdf in enumerate(frames):
        tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(schema)
        p = os.path.join(path, f"part-{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now + i * 10, now + i * 10))


def _batch1():
    # hour 0: users 0..59 click (with repeats); hour 1: users 0..9 view
    rows = [(u, "click", BASE + pd.Timedelta(minutes=u % 55)) for u in range(60)]
    rows += [(u, "click", BASE + pd.Timedelta(minutes=30)) for u in range(30)]
    rows += [(u, "view", BASE + pd.Timedelta(hours=1, minutes=u)) for u in range(10)]
    return _mk(rows)


def _batch2():
    # watermark advance: closes hours 0 and 1
    return _mk([(1, "click", BASE + pd.Timedelta(hours=6))])


def _batch3():
    # far beyond the delay: guaranteed drop in the stream
    return _mk([(999, "click", BASE - pd.Timedelta(days=120))])


def test_batch_estimate_near_exact_small_range(spark):
    df = spark.createDataFrame(_batch1())
    got = {
        (r["window_start"], r["event_type"]): r["approx_distinct"]
        for r in windowed_distinct(df).collect()
    }
    assert abs(got[(BASE.to_pydatetime(), "click")] - 60) < 3
    assert abs(got[(BASE.to_pydatetime() + pd.Timedelta(hours=1), "view")] - 10) < 1


def test_stream_registers_match_batch_on_closed_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_segments(src, [_batch1(), _batch2(), _batch3()])
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_distinct_registers_stream(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.read.parquet(str(tmp_path / "out"))
    streamed = {
        (r["window_start"], r["event_type"]): r["approx_distinct"]
        for r in hll_estimate(
            sink, ["window_start", "window_end", "event_type"]
        ).withColumnRenamed("approx", "approx_distinct").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["approx_distinct"]
        for r in windowed_distinct(spark.createDataFrame(_batch1())).collect()
    }
    # closed windows (hours 0 and 1) estimate EXACTLY as the batch does —
    # register rows are the lossless unit, not the float estimate
    for k, v in batch.items():
        assert streamed[k] == v, (k, streamed.get(k), v)
    # the beyond-delay row never produced a window; hour 6 never closed
    assert all(k[0].year == 2026 and k[0].hour in (0, 1) for k in streamed)


def test_streaming_state_is_bounded_by_m(spark):
    # the register form's whole point: per open window the agg state is at
    # most m rows per key group — verify the BATCH cardinality contract
    # that implies it (registers ≤ m even for 50k distinct users)
    df = spark.range(50_000).select(
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(BASE.to_pydatetime()).cast("timestamp").alias("ts"),
    )
    regs = windowed_distinct_registers(df, p=8)
    assert regs.count() <= 256
    est = hll_estimate(
        regs, ["window_start", "window_end", "event_type"], p=8
    ).first()
    assert abs(est.approx - 50_000) / 50_000 < 0.2  # p=8 → ~6.5% σ


def test_stream_cms_matches_batch_on_closed_windows(spark, tmp_path):
    """Heavy-hitter twin: streamed CMS counters on closed windows equal
    the batch sketch exactly, state bounded by d·w per window group."""
    from mysql_secure_agent_spark.operators.sketches import cms_estimate
    from mysql_secure_agent_spark.streaming.windowed_agg import (
        windowed_cms_registers,
        windowed_cms_registers_stream,
    )

    src = str(tmp_path / "src")
    _write_segments(src, [_batch1(), _batch2(), _batch3()])
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_cms_registers_stream(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.read.parquet(str(tmp_path / "out"))
    batch = windowed_cms_registers(spark.createDataFrame(_batch1()))
    closed = batch  # hours 0 and 1 are exactly batch1's windows
    assert sink.exceptAll(closed).count() == 0
    assert closed.exceptAll(sink).count() == 0
    # state bound: counters per (window, key) never exceed d*w
    per = sink.groupBy("window_start", "event_type").count().collect()
    assert all(r["count"] <= 4 * 1024 for r in per)
    # point query through the shared estimator: user 3 clicked twice in hour 0
    probes = spark.createDataFrame(
        [(BASE.to_pydatetime(), "click", 3)],
        "window_start timestamp, event_type string, user_id long",
    )
    est = cms_estimate(
        sink.drop("window_end"), ["window_start", "event_type"], probes, "user_id"
    ).first()
    assert est.cms_n >= 2
