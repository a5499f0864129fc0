"""Sessionization: batch window vs stateful streaming equivalence."""

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.sessionize import (
    sessionize,
    sessionize_stream,
)


def _events(spark):
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    # user 1: three bursts separated by > gap
    for off in [0, 10, 20, 3600, 3620, 9000]:
        rows.append((1, base + pd.Timedelta(seconds=off)))
    # user 2: one long session (gaps all <= gap)
    for off in [0, 200, 400, 600]:
        rows.append((2, base + pd.Timedelta(seconds=off)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    )


def test_batch_sessionize(spark):
    out = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in sessionize(_events(spark), gap_seconds=300).collect()
    }
    assert out == {(1, 0): 3, (1, 1): 2, (1, 2): 1, (2, 0): 4}


def test_batch_sessionize_single_exchange(spark):
    plan = (
        sessionize(_events(spark), gap_seconds=300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Streaming (applyInPandasWithState) emits exactly the batch result
    minus each key's final (still-open) session."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    events = _events(spark).toPandas()
    # two lsn-ordered segments -> two micro-batches with maxFilesPerTrigger=1
    events = events.sort_values("ts").reset_index(drop=True)
    shutil.rmtree(src, ignore_errors=True)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src)
    half = len(events) // 2
    for i, part in enumerate([events.iloc[:half], events.iloc[half:]]):
        tbl = pa.Table.from_pandas(part, preserve_index=False).cast(
            pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
        )
        pq.write_table(tbl, os.path.join(src, f"part-{i:03d}.parquet"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=300)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.read.parquet(out_dir)
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    batch = (
        sessionize(_events(spark), gap_seconds=300)
        .orderBy("user_id", "session_idx")
        .toPandas()
    )
    # drop each key's last session (still open in streaming state)
    expected = (
        batch.groupby("user_id", group_keys=False)
        .apply(lambda g: g.iloc[:-1], include_groups=True)
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    got = got.reset_index(drop=True)
    for col in ["user_id", "n_events"]:
        assert got[col].tolist() == expected[col].tolist()
    assert got["session_start"].tolist() == expected["session_start"].tolist()
    assert got["session_end"].tolist() == expected["session_end"].tolist()


def test_stream_event_time_timeout_closes_tail_sessions(spark, tmp_path):
    """With a watermark, tail sessions close themselves: the state registers
    an event-time timeout at session_end + gap; when a later batch advances
    the watermark past it, the session emits WITHOUT any event for that key
    in the batch. Expect the full batch sessionization for keys whose
    timeout the watermark passed."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2026-01-01 00:00:00")
    b1 = pd.DataFrame(
        {"user_id": [1, 1, 2], "ts": [base, base + pd.Timedelta(seconds=100),
                                      base + pd.Timedelta(seconds=50)]}
    )
    # batch 2: only user 3, far in the future -> watermark sails past every
    # user-1/2 timeout; their sessions must emit via timeout, not via data
    b2 = pd.DataFrame({"user_id": [3], "ts": [base + pd.Timedelta(hours=5)]})
    # batch 3: empty-ish nudge (another user-3 event) so the timeout fires
    # in a batch executed AFTER the watermark advanced
    b3 = pd.DataFrame({"user_id": [3], "ts": [base + pd.Timedelta(hours=6)]})
    import time as _time

    now = _time.time()
    for i, pdf in enumerate([b1, b2, b3]):
        tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
        )
        p = os.path.join(src, f"part-{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=300, watermark_delay="10 minutes")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"],): (r["n_events"],
                          r["session_start"], r["session_end"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # users 1 and 2 emitted by TIMEOUT (no data for them after batch 1)
    assert got[(1,)][0] == 2
    assert got[(2,)][0] == 1
    assert got[(1,)][1] == base.to_pydatetime()


class _FakeState:
    """Minimal GroupState stand-in for driving _fold_sessions directly."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _fold(state, ts_list, gap=300, use_timeout=True):
    from mysql_secure_agent_spark.operators.sessionize import _fold_sessions

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts_list, unit="s"),
            "_epoch": [float(t) for t in ts_list],
        }
    )
    out = list(_fold_sessions((1,), iter([pdf]), state, gap, use_timeout))
    return pd.concat(out) if out else pd.DataFrame()


def test_fold_out_of_order_lowers_session_start():
    """An on-time but out-of-order arrival BEFORE the open session's start
    (watermark mode admits these) must lower session_start, not be absorbed
    with the stale start."""
    st = _FakeState((1000.0, 1050.0, 2))
    closed = _fold(st, [900.0])  # within gap of start=1000
    assert closed.empty
    start, end, n = st.get
    assert (start, end, n) == (900.0, 1050.0, 3)


def test_fold_gap_separated_early_event_splits():
    """An arrival gap-separated BEFORE the open session is its own session
    (emitted closed), never silently merged into the open one."""
    st = _FakeState((1000.0, 1050.0, 2))
    closed = _fold(st, [100.0, 150.0])
    assert len(closed) == 1
    row = closed.iloc[0]
    # output is tz-aware UTC (true instants; Arrow converts aware
    # timestamps by instant regardless of the session timezone)
    assert row["session_start"] == pd.Timestamp(100.0, unit="s", tz="UTC")
    assert row["session_end"] == pd.Timestamp(150.0, unit="s", tz="UTC")
    assert row["n_events"] == 2
    # the open session is untouched
    assert st.get == (1000.0, 1050.0, 2)


def test_fold_bridge_event_merges_backward_and_forward():
    """An early event within gap of BOTH an earlier batch event and the open
    session start chains them into one session."""
    st = _FakeState((1000.0, 1050.0, 2))
    closed = _fold(st, [700.0, 880.0])  # 700->880 (180s) -> 1000 (120s)
    assert closed.empty
    assert st.get == (700.0, 1050.0, 4)
