"""Primary failover / replica promotion (streaming/failover.py): resume the
tail from a NEW feed whose file framing differs and which re-serves an
overlap, positioning by the table's own applied-lsn watermark (the MySQL
GTID auto-positioning analog). The reference can only re-request from the
same server's (file, position) (state/AgentState.java:14-17)."""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sources.changelog import FeedSpec, generate_changelog
from mysql_secure_agent_spark.streaming.failover import (
    applied_lsn_watermark,
    resume_from_promotion,
)
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline


def _write_slice(cl, ddl, base, lo_frac, hi_frac, n_files, fname_prefix):
    """A feed directory serving rows with lsn in the [lo, hi) fraction of
    the log, split into n_files with boundaries unique to this server."""
    cut_lo = int(len(cl) * lo_frac)
    cut_hi = int(len(cl) * hi_frac)
    part = cl.sort_values("source_lsn").iloc[cut_lo:cut_hi].copy()
    part["ts"] = part["ts"].astype("datetime64[us]")
    if "tool" in part.columns:
        # an all-null slice must still write a STRING parquet column
        part["tool"] = part["tool"].astype("string")
    data = os.path.join(base, "data")
    os.makedirs(data)
    for i, idx in enumerate(np.array_split(np.arange(len(part)), n_files)):
        part.iloc[idx].to_parquet(
            os.path.join(data, f"{fname_prefix}{i:05d}.parquet"), index=False
        )
    if ddl is not None and len(ddl):
        os.makedirs(os.path.join(base, "ddl"))
        ddl.to_parquet(os.path.join(base, "ddl", "ddl.parquet"), index=False)
    return base


def test_promotion_resume_converges_and_prunes_overlap(spark, tmp_path):
    spec = FeedSpec(
        n_events=6000, n_convs=150, seed=97, ddl_add_tool_at_frac=0.5
    )
    cl, ddl = generate_changelog(spec)
    import pyspark.sql.types as T

    init = T.StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    tbl = LakeTable.create(
        str(tmp_path / "t"), init, PRIMARY_KEY, n_buckets=8, overwrite=True
    )
    # primary serves the first 70% of the log, then dies
    primary = _write_slice(cl, ddl, str(tmp_path / "primary"), 0.0, 0.7, 4, "binlog-p-")
    CdcPipeline(tbl, primary).run_stream(spark, str(tmp_path / "ckpt_p"))
    wm = applied_lsn_watermark(tbl)
    cut70 = int(cl.sort_values("source_lsn").iloc[int(len(cl) * 0.7) - 1]["source_lsn"])
    assert wm == cut70  # the ledger knows exactly what was applied

    # promoted replica: re-serves 40%..100% under different file framing
    promoted = _write_slice(cl, ddl, str(tmp_path / "promoted"), 0.4, 1.0, 3, "binlog-r-")
    pipe = resume_from_promotion(tbl, promoted, str(tmp_path / "ckpt_r"))
    assert pipe.min_lsn_exclusive == wm
    pipe.run_stream(spark, str(tmp_path / "ckpt_r"))

    got = (
        tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = oracle.replay(cl, ddl)
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )
    # the overlap stayed off the wire: across BOTH streams the merges
    # ingested each event exactly once — primary's 70% plus only the
    # beyond-watermark tail from the promoted feed, never the re-served
    # 40-70% window a second time
    m = tbl.metrics(spark).toPandas()
    n_beyond = int((cl["source_lsn"] > wm).sum())
    assert int(m["rows_in"].sum()) == int((cl["source_lsn"] <= wm).sum()) + n_beyond


def test_promotion_refuses_stale_checkpoint(spark, tmp_path):
    spec = FeedSpec(n_events=1000, n_convs=40, seed=98)
    cl, ddl = generate_changelog(spec)
    import pyspark.sql.types as T

    tbl = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4,
        overwrite=True,
    )
    primary = _write_slice(cl, None, str(tmp_path / "primary"), 0.0, 1.0, 2, "p-")
    CdcPipeline(tbl, primary).run_stream(spark, str(tmp_path / "ckpt"))
    promoted = _write_slice(cl, None, str(tmp_path / "promoted"), 0.5, 1.0, 1, "r-")
    with pytest.raises(ValueError, match="not fresh"):
        resume_from_promotion(tbl, promoted, str(tmp_path / "ckpt"))


def test_promoted_stream_crash_resume(spark, tmp_path):
    """The promoted stream itself crashes mid-drain: resume_from_promotion
    with the SAME checkpoint (ownership marker matches) restarts it, the
    stable batch-id prefix dedupes the replayed epoch, and the final state
    converges to the full-replay oracle."""
    spec = FeedSpec(n_events=3000, n_convs=80, seed=96)
    cl, _ = generate_changelog(spec)
    import pyspark.sql.types as T

    tbl = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8,
        overwrite=True,
    )
    primary = _write_slice(cl, None, str(tmp_path / "primary"), 0.0, 0.6, 2, "p-")
    CdcPipeline(tbl, primary).run_stream(spark, str(tmp_path / "ckpt_p"))
    promoted = _write_slice(cl, None, str(tmp_path / "promoted"), 0.3, 1.0, 4, "r-")
    ck = str(tmp_path / "ckpt_r")
    pipe = resume_from_promotion(tbl, promoted, ck)
    with pytest.raises(Exception, match="injected crash"):
        pipe.run_stream(spark, ck, fail_after_batches=1)
    pipe2 = resume_from_promotion(tbl, promoted, ck)  # marker → allowed
    assert pipe2.batch_id_prefix == pipe.batch_id_prefix
    pipe2.run_stream(spark, ck)
    got = (
        tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = oracle.replay(cl)
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )


def test_watermark_zero_on_empty_table(spark, tmp_path):
    import pyspark.sql.types as T

    tbl = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4,
        overwrite=True,
    )
    assert applied_lsn_watermark(tbl) == 0
