"""Tests: AgentState serde, resumable snapshot import, JSON payload access,
config-integrated pipeline (selection + anonymization)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
import pyspark.sql.types as T

from mysql_secure_agent_spark.config import Config
from mysql_secure_agent_spark.functions.json_payload import (
    infer_json_schema,
    json_get,
    json_get_typed,
    parse_json,
)
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.snapshot_import import import_snapshot
from mysql_secure_agent_spark.sources.changelog import FeedSpec, generate_changelog, write_feed
from mysql_secure_agent_spark.state import AgentState, BinlogPosition, TableState
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline


# ------------------------------------------------------------------- state
def test_agent_state_roundtrip(tmp_path):
    s = AgentState(
        binlog_position=BinlogPosition("mysql-bin.000007", 1234),
        tables={
            "main.transcripts": TableState(
                last_synced_primary_key={"conv_id": "c1", "turn_idx": 5},
                finished_import=False,
            )
        },
    )
    p = str(tmp_path / "state.json")
    s.save(p)
    s2 = AgentState.load(p)
    assert s2.binlog_position.file == "mysql-bin.000007"
    assert s2.binlog_position.position == 1234
    assert s2.tables["main.transcripts"].last_synced_primary_key == {
        "conv_id": "c1",
        "turn_idx": 5,
    }
    assert not s2.tables["main.transcripts"].finished_import
    # lsn encoding (T4): monotone across rotation
    assert BinlogPosition("mysql-bin.000002", 4).as_lsn() > BinlogPosition(
        "mysql-bin.000001", 999_999
    ).as_lsn()


# -------------------------------------------------------- resumable import
def _snapshot_df(spark, n=730):
    rows = [
        (f"c{i % 91:05d}", i // 91, "user", f"text {i}", None, None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_import_snapshot_pages_and_resumes(spark, tmp_path):
    src = _snapshot_df(spark)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, overwrite=True
    )
    state_path = str(tmp_path / "state.json")
    # first call: limited pages (simulated interruption)
    r1 = import_snapshot(
        spark, src, table, state_path, page_size=200, max_pages=2
    )
    assert r1 == {"pages": 2, "rows": 400, "finished": False}
    st = AgentState.load(state_path)
    assert st.tables["main.transcripts"].last_synced_primary_key is not None
    # resume to completion
    r2 = import_snapshot(spark, src, table, state_path, page_size=200)
    assert r2["finished"]
    got = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == 730
    # idempotent once finished
    r3 = import_snapshot(spark, src, table, state_path, page_size=200)
    assert r3 == {"pages": 0, "rows": 0, "finished": True}


def test_import_large_page_no_driver_materialization(spark, tmp_path):
    """A page larger than the whole source (page_size 1M+) imports in one
    distributed merge. The import path fetches only (count, max-key cursor)
    to the driver — the page rows themselves stay on the executors (no
    collect(); at the reference's own PAGE_SIZE of 10M rows a driver
    round-trip would OOM)."""
    n = 150_000
    src = spark.range(n).select(
        F.concat(F.lit("c"), F.lpad((F.col("id") % 5000).cast("string"), 8, "0")).alias("conv_id"),
        (F.col("id") / 5000).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, overwrite=True
    )
    state_path = str(tmp_path / "state.json")
    r = import_snapshot(spark, src, table, state_path, page_size=1_000_000)
    assert r == {"pages": 1, "rows": n, "finished": True}
    assert table.read(spark).count() == n
    cur = AgentState.load(state_path).tables["main.transcripts"]
    assert cur.finished_import and cur.last_synced_primary_key["conv_id"] == "c00004999"


# ------------------------------------------------------------ json payload
def test_json_payload_access(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "tags": ["a","b"], "m": {"x": 1.5}}',), ('{"k": 9}',), (None,)],
        "props string",
    )
    got = df.select(
        json_get("props", "$.k").alias("k"),
        json_get_typed("props", "$.m.x", "double").alias("x"),
        parse_json("props", "k int, tags array<string>").alias("p"),
    ).collect()
    assert got[0]["k"] == "7" and got[0]["x"] == 1.5
    assert got[0]["p"]["tags"] == ["a", "b"]
    assert got[1]["x"] is None and got[2]["k"] is None
    ddl = infer_json_schema(df, "props")
    assert "k" in ddl and "tags" in ddl


# --------------------------------------------- config-integrated pipeline
def test_pipeline_config_selection_and_hash(spark, tmp_path):
    """Deselected column never lands; hashed column matches the reference's
    golden salt semantics (salt prepended, sha1, base64)."""
    spec = FeedSpec(n_events=1500, n_convs=60, seed=47, delete_frac=0.0)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=2)
    cfg = Config.from_json(
        '{"crypto_salt": "sodium chloride", "schemas": {"main": {"tables": '
        '{"transcripts": {"columns": {"role": {"hash": true}, '
        '"tool": {"selected": false}}}}}}}'
    )
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, overwrite=True
    )
    pipe = CdcPipeline(table, feed, config=cfg)
    pipe.run_backfill(spark)
    got = table.read(spark).toPandas()
    assert got["tool"].isna().all()  # deselected → never synced
    # role was hashed: base64(sha1('sodium chloride' + role))
    import base64, hashlib

    cl, _ = generate_changelog(spec)
    sample = got.iloc[0]
    orig = cl[(cl.conv_id == sample["conv_id"]) & (cl.turn_idx == sample["turn_idx"])]
    orig_role = orig.sort_values("source_lsn").iloc[-1]["role"]
    expect = base64.b64encode(
        hashlib.sha1(("sodium chloride" + orig_role).encode()).digest()
    ).decode()
    assert sample["role"] == expect
