"""Interleaved snapshot backfill (DBLog watermark algorithm): the stream
keeps applying while the source is chunk-paged; watermark-window chunk rows
are dropped; final state equals the sequential oracle over S0 + feed."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.lake import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.snapshot_interleave import (
    feed_head_lsn,
    import_snapshot_interleaved,
)
from mysql_secure_agent_spark.sources.changelog import (
    FeedSpec,
    generate_changelog,
    write_feed,
)
from mysql_secure_agent_spark.streaming import CdcPipeline

FEED_COLS = [
    "op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "source_lsn", "binlog_file", "binlog_pos",
]


def _s0(n_convs=30, turns=3):
    """Pre-existing source rows (never in the feed): lsn 0 inserts."""
    rows = []
    for i in range(n_convs):
        for t in range(turns):
            rows.append(
                {
                    "op": "I",
                    "conv_id": f"pre-{i:03d}",
                    "turn_idx": t,
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": f"seed text {i}/{t}",
                    "tool": None,
                    "ts": pd.Timestamp("2025-12-31"),
                    "source_lsn": 0,
                    "binlog_file": "seed.000000",
                    "binlog_pos": 0,
                }
            )
    return pd.DataFrame(rows, columns=FEED_COLS)


class _Harness:
    """Simulated live source + progressive feed delivery.

    The source's current state is the sequential replay of S0 + every feed
    file delivered so far. ``source_read`` delivers one more file BEFORE
    returning state — so every chunk select races ahead of the last drain
    (hw > lw), exercising the watermark window on each chunk.
    """

    def __init__(self, spark, tmp_path, spec, s0, n_files=8, deliver_per_read=1):
        self.spark = spark
        self.s0 = s0
        self.staging = str(tmp_path / "staging")
        self.feed = str(tmp_path / "feed")
        write_feed(spec, self.staging, n_files=n_files, overwrite=True)
        os.makedirs(os.path.join(self.feed, "data"))
        shutil.copytree(
            os.path.join(self.staging, "ddl"),
            os.path.join(self.feed, "ddl"),
        )
        self.pending = sorted(
            f
            for f in os.listdir(os.path.join(self.staging, "data"))
            if f.endswith(".parquet")
        )
        self.cl, self.ddl = generate_changelog(spec)
        self.deliver_per_read = deliver_per_read

    def deliver(self, n=1):
        for _ in range(n):
            if not self.pending:
                return
            f = self.pending.pop(0)
            shutil.copy(
                os.path.join(self.staging, "data", f),
                os.path.join(self.feed, "data", f),
            )

    def _delivered_cl(self):
        data = os.path.join(self.feed, "data")
        files = [os.path.join(data, f) for f in os.listdir(data) if f.endswith(".parquet")]
        if not files:
            return self.cl.iloc[0:0]
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def source_read(self, spark):
        self.deliver(self.deliver_per_read)
        state = oracle.replay(
            pd.concat([self.s0, self._delivered_cl()], ignore_index=True),
            self.ddl,
        )
        return spark.createDataFrame(state, schema=TRANSCRIPT_SCHEMA)

    def expected_final(self):
        return oracle.replay(
            pd.concat([self.s0, self.cl], ignore_index=True), self.ddl
        )


def _mk(spark, tmp_path, **spec_kw):
    spec = FeedSpec(
        n_events=2500, n_convs=50, seed=11, delete_frac=0.15, **spec_kw
    )
    h = _Harness(spark, tmp_path, spec, _s0())
    tbl = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    pipe = CdcPipeline(tbl, h.feed, normalize=False)
    ck = str(tmp_path / "ckpt")
    drain = lambda s: pipe.run_stream(s, ck, max_files_per_trigger=4)
    return h, tbl, drain


def _assert_matches_oracle(spark, tbl, h):
    got = (
        tbl.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = h.expected_final().reset_index(drop=True)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interleaved_backfill_converges(spark, tmp_path):
    h, tbl, drain = _mk(spark, tmp_path)
    h.deliver(2)  # stream is already flowing before the backfill starts
    res = import_snapshot_interleaved(
        spark, h.source_read, tbl, h.feed, drain,
        str(tmp_path / "state.json"), page_size=60,
    )
    assert res["finished"] and res["chunks"] >= 3
    # every chunk select raced ahead of its low watermark, so the window
    # anti-join must have actually fired
    assert res["dropped"] > 0
    h.deliver(len(h.pending))  # rest of the log arrives after the backfill
    drain(spark)
    _assert_matches_oracle(spark, tbl, h)


def test_crash_resume_and_rerun_noop(spark, tmp_path):
    h, tbl, drain = _mk(spark, tmp_path)
    h.deliver(2)
    state = str(tmp_path / "state.json")
    r1 = import_snapshot_interleaved(
        spark, h.source_read, tbl, h.feed, drain, state,
        page_size=60, max_chunks=2,
    )
    assert not r1["finished"] and r1["chunks"] == 2
    # "restart": a fresh call resumes from the persisted cursor
    r2 = import_snapshot_interleaved(
        spark, h.source_read, tbl, h.feed, drain, state, page_size=60
    )
    assert r2["finished"]
    h.deliver(len(h.pending))
    drain(spark)
    _assert_matches_oracle(spark, tbl, h)
    # completed import is a pure drain no-op
    r3 = import_snapshot_interleaved(
        spark, h.source_read, tbl, h.feed, drain, state, page_size=60
    )
    assert r3 == {"chunks": 0, "rows": 0, "dropped": 0, "finished": True}
    _assert_matches_oracle(spark, tbl, h)


def test_window_delete_drops_chunk_row(spark, tmp_path):
    """A key selected into a chunk and deleted DURING the select must not
    survive: its chunk row is ambiguous and the window drops it."""
    s0 = pd.DataFrame(
        [{
            "op": "I", "conv_id": "k", "turn_idx": 0, "role": "user",
            "text": "doomed", "tool": None, "ts": pd.Timestamp("2025-12-31"),
            "source_lsn": 0, "binlog_file": "seed.000000", "binlog_pos": 0,
        }],
        columns=FEED_COLS,
    )
    feed = str(tmp_path / "feed")
    os.makedirs(os.path.join(feed, "data"))
    delete_ev = s0.assign(op="D", source_lsn=1, text=None)

    tbl = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4
    )
    pipe = CdcPipeline(tbl, feed, normalize=False)
    ck = str(tmp_path / "ckpt")
    drain = lambda s: pipe.run_stream(s, ck)

    calls = {"n": 0}

    def source_read(sp):
        calls["n"] += 1
        if calls["n"] == 1:
            # the select sees PRE-delete state; the delete lands in the log
            # mid-select (low watermark was 0, high watermark will be 1)
            arrow_schema = pa.schema(
                [
                    ("op", pa.string()),
                    ("conv_id", pa.string()),
                    ("turn_idx", pa.int32()),
                    ("role", pa.string()),
                    ("text", pa.string()),
                    ("tool", pa.string()),
                    ("ts", pa.timestamp("us")),
                    ("source_lsn", pa.int64()),
                    ("binlog_file", pa.string()),
                    ("binlog_pos", pa.int64()),
                ]
            )
            pq.write_table(
                pa.Table.from_pandas(
                    delete_ev, schema=arrow_schema, preserve_index=False
                ),
                os.path.join(feed, "data", "f1.parquet"),
            )
            return sp.createDataFrame(
                oracle.replay(s0), schema=TRANSCRIPT_SCHEMA
            )
        return sp.createDataFrame(
            oracle.replay(pd.concat([s0, delete_ev])), schema=TRANSCRIPT_SCHEMA
        )

    res = import_snapshot_interleaved(
        spark, source_read, tbl, feed, drain,
        str(tmp_path / "state.json"), page_size=10,
    )
    assert res["dropped"] == 1 and res["finished"]
    assert tbl.read(spark).filter("conv_id = 'k'").count() == 0


def test_feed_head_from_footers(spark, tmp_path):
    spec = FeedSpec(n_events=500, n_convs=20, seed=3)
    staging = str(tmp_path / "s")
    write_feed(spec, staging, n_files=4, overwrite=True)
    data = os.path.join(staging, "data")
    assert feed_head_lsn(data) == 500
    assert feed_head_lsn(str(tmp_path / "missing")) == 0
