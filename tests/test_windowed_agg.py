"""Tumbling-window rollup: batch == streaming (closed windows), late drop."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysql_secure_agent_spark.streaming.windowed_agg import (
    tumbling_rollup,
    tumbling_rollup_stream,
)


def _write_segments(path, frames):
    os.makedirs(path, exist_ok=True)
    schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("ts", pa.timestamp("us"))]
    )
    import time

    now = time.time()
    for i, pdf in enumerate(frames):
        tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(schema)
        p = os.path.join(path, f"part-{i:03d}.parquet")
        pq.write_table(tbl, p)
        # FileStreamSource orders by modification time; make it unambiguous
        os.utime(p, (now + i * 10, now + i * 10))


def _mk(rows):
    return pd.DataFrame(
        rows, columns=["user_id", "event_type", "value", "ts"]
    ).astype({"ts": "datetime64[us]"})


BASE = pd.Timestamp("2026-01-01 00:00:00")


def _batch1():
    return _mk([
        (1, "click", 1.0, BASE + pd.Timedelta(minutes=5)),
        (1, "click", 2.0, BASE + pd.Timedelta(minutes=50)),
        (2, "view", 3.0, BASE + pd.Timedelta(hours=1, minutes=10)),
    ])


def _batch2():
    # advances the watermark to 04:00 (max event time - 2h) AT BATCH END
    return _mk([(1, "click", 4.0, BASE + pd.Timedelta(hours=6))])


def _batch3():
    # LATE beyond any doubt: months before every prior watermark reading.
    # (Spark's guarantee is one-sided — rows within the delay are always
    # aggregated, rows beyond it MAY survive one extra batch because the
    # input filter uses a lagged watermark; assert the guaranteed drop.)
    return _mk([(2, "click", 100.0, BASE - pd.Timedelta(days=120))])


def test_batch_rollup(spark):
    df = spark.createDataFrame(pd.concat([_batch1(), _batch2(), _batch3()]))
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_rollup(df).collect()
    }
    # batch sees everything, including the "late" row (its own window)
    assert out[(BASE.to_pydatetime(), "click")] == (2, 3.0)
    assert out[(BASE.to_pydatetime() + pd.Timedelta(hours=1), "view")] == (1, 3.0)
    assert out[(BASE.to_pydatetime() + pd.Timedelta(hours=6), "click")] == (1, 4.0)
    late_key = [k for k in out if out[k] == (1, 100.0)]
    assert late_key, out


def test_stream_emits_closed_windows_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_segments(src, [_batch1(), _batch2(), _batch3()])
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, value double, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        tumbling_rollup_stream(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # hour-0 click window closed by batch 2's watermark advance; the
    # beyond-delay row from batch 3 was dropped (batch rollup above shows
    # it WOULD contribute its own window if not filtered)
    assert got[(BASE.to_pydatetime(), "click")] == (2, 3.0)
    assert got[(BASE.to_pydatetime() + pd.Timedelta(hours=1), "view")] == (1, 3.0)
    assert all(v != (1, 100.0) for v in got.values()), got
    # hour-6 window never closes (no later event) -> not emitted in append
    assert all(k[0].hour != 6 for k in got), got
