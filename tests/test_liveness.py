"""T2 live-tail liveness: continuous processingTime trigger + NOP heartbeat.

The reference blocks 1 s on the binlog socket and emits TIMEOUT → NOP
keep-alives so an idle source still proves the agent is alive
(``client/EventReader.java:8-14``, ``Updater.java:162-164``). The Spark analog:
``run_stream_continuous`` appends NOP lineage rows while the feed is idle,
applies new log segments as they appear, and resumes from checkpoint.
"""

import os
import shutil

import pandas as pd

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sources.changelog import (
    FeedSpec,
    generate_changelog,
    write_feed,
)
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline


def test_continuous_trigger_heartbeat_and_pickup(spark, tmp_path):
    spec = FeedSpec(n_events=3000, n_convs=100, seed=53)
    staged = str(tmp_path / "staged")
    write_feed(spec, staged, n_files=6)
    feed = str(tmp_path / "feed")
    os.makedirs(os.path.join(feed, "data"))
    shutil.copytree(os.path.join(staged, "ddl"), os.path.join(feed, "ddl"))
    files = sorted(os.listdir(os.path.join(staged, "data")))
    # phase 1: only half the log segments exist
    for f in files[:3]:
        shutil.copy(os.path.join(staged, "data", f), os.path.join(feed, "data", f))

    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    ckpt = str(tmp_path / "ckpt")
    pipe = CdcPipeline(table, feed)
    r1 = pipe.run_stream_continuous(
        spark,
        ckpt,
        trigger_seconds=0.3,
        heartbeat_seconds=0.8,
        idle_stop_seconds=3.0,
    )
    assert r1["batches"] >= 1
    # idle feed kept emitting NOP keep-alive lineage rows
    assert r1["heartbeats"] >= 1
    nops = table.metrics(spark).filter("batch_id = 'NOP'").count()
    assert nops >= r1["heartbeats"]

    # phase 2: the remaining segments appear; a resumed continuous run picks
    # them up from the same checkpoint and converges to the full-replay state
    for f in files[3:]:
        shutil.copy(os.path.join(staged, "data", f), os.path.join(feed, "data", f))
    r2 = pipe.run_stream_continuous(
        spark,
        ckpt,
        trigger_seconds=0.3,
        heartbeat_seconds=5.0,
        idle_stop_seconds=3.0,
    )
    assert r2["batches"] >= 1
    result = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    cl, ddl = generate_changelog(spec)
    expected = oracle.replay(cl, ddl)[result.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(result, expected, check_dtype=False)
