"""Dead-letter quarantine: malformed row images must not kill the stream,
must not silently mis-decode, and must land — exactly once — in the DLQ
with the original bytes and a reason code.

The reference throws on unframeable bytes (RowParser.java:165-166
IOException) and halts the whole agent; this engine validates structurally
before decoding (functions/decode.py) and routes poison to
sinks/dead_letter.py while the valid rows keep merging.
"""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.functions.decode import (
    HEADER,
    decode_payload_block,
    encode_row,
)
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sinks.dead_letter import DeadLetterSink
from mysql_secure_agent_spark.sources.changelog import (
    FeedSpec,
    generate_changelog,
    write_feed,
)
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline


# ------------------------------------------------------------- unit: decode
def test_quarantine_reasons_and_valid_rows_unaffected():
    good = encode_row("c1", 3, "user", "hello world", None, 1_700_000_000_000_000)
    delete = encode_row(None, None, None, None, None, None)  # all-null image
    short = good[:10]
    reserved = bytes([good[0] | 0x80]) + good[1:]
    trailing = good + b"\x00\x01"
    # null bit for role set, but role length kept non-zero
    conflict = bytes([good[0] | 0x04]) + good[1:]
    payloads = pd.Series(
        [good, short, delete, reserved, trailing, conflict, None, good],
        dtype=object,
    )
    out = decode_payload_block(payloads, quarantine=True)
    assert list(out["_error"]) == [
        None,
        "short_header",
        None,
        "reserved_bits",
        "frame_size_mismatch",
        "null_length_conflict",
        "null_payload",
        None,
    ]
    # valid rows decode exactly as the non-quarantine path decodes them
    clean = decode_payload_block(pd.Series([good, delete, good], dtype=object))
    valid = out[out["_error"].isnull()].drop(columns=["_error", "_raw"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(valid, clean, check_dtype=False)
    # invalid rows are all-null fields + original bytes preserved
    bad = out[out["_error"].notnull()]
    assert bad[["conv_id", "role", "text", "tool"]].isnull().all().all()
    assert list(bad["_raw"])[:3] == [short, reserved, trailing]


def test_quarantine_all_rows_malformed_and_empty_batch():
    out = decode_payload_block(pd.Series([b"", b"xy", None], dtype=object), quarantine=True)
    assert list(out["_error"]) == ["short_header", "short_header", "null_payload"]
    empty = decode_payload_block(pd.Series([], dtype=object), quarantine=True)
    assert list(empty.columns)[-2:] == ["_error", "_raw"] and len(empty) == 0


# -------------------------------------------------------- integration: DLQ
def _corrupt(payload: bytes, lsn: int) -> tuple[bytes, str | None]:
    if lsn % 17 == 0:
        return payload[:10], "short_header"
    if lsn % 19 == 0:
        return bytes([payload[0] | 0x40]) + payload[1:], "reserved_bits"
    if lsn % 23 == 0:
        return payload + b"\xde\xad", "frame_size_mismatch"
    return payload, None


def _poisoned_feed(tmp_path, spec):
    """Raw feed with a deterministic subset of payloads corrupted in place.
    Returns (feed_dir, expected pandas frame over the surviving rows,
    {lsn: reason})."""
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=4, raw=True)
    poisoned = {}
    data_dir = os.path.join(feed, "data")
    for f in sorted(os.listdir(data_dir)):
        p = os.path.join(data_dir, f)
        pdf = pd.read_parquet(p)
        new_payloads = []
        for payload, lsn in zip(pdf["payload"], pdf["source_lsn"]):
            out, reason = _corrupt(payload, int(lsn))
            new_payloads.append(out)
            if reason:
                poisoned[int(lsn)] = reason
        pdf["payload"] = new_payloads
        pdf.to_parquet(p, index=False)
    cl, ddl = generate_changelog(spec)
    expected = oracle.replay(cl[~cl["source_lsn"].isin(poisoned)], ddl)
    return feed, expected, poisoned


def test_stream_quarantines_and_merges_good_rows(spark, tmp_path):
    spec = FeedSpec(n_events=4000, n_convs=150, seed=201)
    feed, expected, poisoned = _poisoned_feed(tmp_path, spec)
    assert len(poisoned) > 50  # the fixture actually poisons something
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=16
    )
    dlq = str(tmp_path / "dlq")
    pipe = CdcPipeline(table, feed, raw=True, dlq_dir=dlq)
    pipe.run_stream(spark, str(tmp_path / "ckpt"))

    result = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        result,
        expected[result.columns.tolist()].reset_index(drop=True),
        check_dtype=False,
    )

    got = DeadLetterSink(dlq).read(spark).toPandas()
    assert dict(zip(got["source_lsn"], got["reason"])) == poisoned
    # original bytes preserved for forensics
    assert got["payload"].map(lambda b: b is not None and len(b) > 0).all()
    # lineage: every DLQ row carries the batch id that met it
    assert got["batch_id"].notnull().all()


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    """Crash mid-stream, resume from checkpoint: the replayed batch rewrites
    its own DLQ directory instead of duplicating rows, and a full second
    drain from a FRESH checkpoint (every merge skipped by the ledger) leaves
    the DLQ unchanged too."""
    spec = FeedSpec(n_events=4000, n_convs=150, seed=203)
    feed, expected, poisoned = _poisoned_feed(tmp_path, spec)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=16
    )
    dlq = str(tmp_path / "dlq")
    pipe = CdcPipeline(table, feed, raw=True, dlq_dir=dlq)
    with pytest.raises(Exception, match="injected crash"):
        pipe.run_stream(spark, str(tmp_path / "ckpt"), fail_after_batches=2)
    CdcPipeline(table, feed, raw=True, dlq_dir=dlq).run_stream(
        spark, str(tmp_path / "ckpt")
    )
    got = DeadLetterSink(dlq).read(spark).toPandas()
    assert dict(zip(got["source_lsn"], got["reason"])) == poisoned
    assert len(got) == len(poisoned)  # no duplicates from the replay

    # second drain, fresh checkpoint: merges all skip, DLQ rewritten in place
    CdcPipeline(table, feed, raw=True, dlq_dir=dlq).run_stream(
        spark, str(tmp_path / "ckpt2")
    )
    again = DeadLetterSink(dlq).read(spark).toPandas()
    assert len(again) == len(poisoned)
    result = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        result,
        expected[result.columns.tolist()].reset_index(drop=True),
        check_dtype=False,
    )


def test_clean_feed_writes_no_dlq(spark, tmp_path):
    """A clean batch must learn it is clean from the merge job itself and
    never pay (or leave behind) a DLQ write."""
    spec = FeedSpec(n_events=1500, n_convs=80, seed=207)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=2, raw=True)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=16
    )
    dlq = str(tmp_path / "dlq")
    CdcPipeline(table, feed, raw=True, dlq_dir=dlq).run_stream(
        spark, str(tmp_path / "ckpt")
    )
    assert not os.path.isdir(dlq) or not os.listdir(dlq)
    assert DeadLetterSink(dlq).read(spark).count() == 0
    cl, ddl = generate_changelog(spec)
    expected = oracle.replay(cl, ddl)
    got = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        expected[got.columns.tolist()].reset_index(drop=True),
        check_dtype=False,
    )


def test_dlq_requires_raw_feed():
    with pytest.raises(ValueError, match="raw=True"):
        CdcPipeline(object(), "/nonexistent", dlq_dir="/tmp/x")
