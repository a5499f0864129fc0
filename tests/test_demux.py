"""Multi-table demux: one feed routed to per-table LakeTables with config
selection and per-table exactly-once."""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_secure_agent_spark.config import Config
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sources.changelog import FeedSpec, generate_changelog
from mysql_secure_agent_spark.streaming.demux import MultiTablePipeline
from mysql_secure_agent_spark import oracle


def _write_multi_feed(tmp_path, specs: dict[str, FeedSpec], n_files=3):
    """Interleave several per-table changelogs into one multi-table feed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    frames = []
    for ref, spec in specs.items():
        cl, _ = generate_changelog(spec)
        cl["table_ref"] = ref
        frames.append(cl)
    feed = pd.concat(frames).sort_values("source_lsn").reset_index(drop=True)
    feed["ts"] = feed["ts"].astype("datetime64[us]")  # Spark can't read ns
    data_dir = tmp_path / "feed" / "data"
    os.makedirs(data_dir)
    for i, idx in enumerate(np.array_split(np.arange(len(feed)), n_files)):
        feed.iloc[idx].to_parquet(data_dir / f"f{i:04d}.parquet", index=False)
    return str(tmp_path / "feed"), {
        ref: generate_changelog(spec)[0] for ref, spec in specs.items()
    }


def test_demux_routes_and_filters(spark, tmp_path):
    specs = {
        "main.chats": FeedSpec(n_events=2000, n_convs=60, seed=51),
        "main.agents": FeedSpec(n_events=1500, n_convs=40, seed=53),
        "main.excluded": FeedSpec(n_events=500, n_convs=10, seed=57),
    }
    feed, logs = _write_multi_feed(tmp_path, specs)
    tables = {
        ref: LakeTable.create(
            str(tmp_path / ref), TRANSCRIPT_SCHEMA, PRIMARY_KEY, overwrite=True
        )
        for ref in specs
    }
    cfg = Config.from_json(
        '{"schemas": {"main": {"select_other_tables": true, '
        '"tables": {"excluded": {"selected": false}}}}}'
    )
    pipe = MultiTablePipeline(tables, feed, config=cfg)
    assert set(pipe.tables) == {"main.chats", "main.agents"}
    pipe.run_stream(spark, str(tmp_path / "ckpt"))
    for ref in ("main.chats", "main.agents"):
        got = (
            tables[ref].read(spark).orderBy("conv_id", "turn_idx")
            .toPandas().reset_index(drop=True)
        )
        exp = oracle.replay(logs[ref])
        pd.testing.assert_frame_equal(
            got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
        )
    assert tables["main.excluded"].read(spark).count() == 0


def test_demux_per_table_exactly_once(spark, tmp_path):
    specs = {"main.a": FeedSpec(n_events=800, n_convs=30, seed=61)}
    feed, logs = _write_multi_feed(tmp_path, specs, n_files=1)
    t = LakeTable.create(
        str(tmp_path / "a"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, overwrite=True
    )
    pipe = MultiTablePipeline({"main.a": t}, feed)
    df = spark.read.parquet(feed + "/data")
    r1 = pipe.apply_batch(spark, df, "b0")
    assert not r1["main.a"]["skipped"]
    v = t.current_version()
    r2 = pipe.apply_batch(spark, df, "b0")  # retried micro-batch
    assert r2["main.a"]["skipped"] and t.current_version() == v
