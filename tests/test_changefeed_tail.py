"""ChangefeedTailer: continuous lake→lake replication off the commit log."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.lake import LakeTable
from mysql_secure_agent_spark.streaming.changefeed_tail import ChangefeedTailer

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    src = LakeTable.create(str(tmp_path / "src"), SCHEMA, ["k"], n_buckets=4)
    dst = LakeTable.create(str(tmp_path / "dst"), SCHEMA, ["k"], n_buckets=4)
    tail = ChangefeedTailer(src, str(tmp_path / "cursor.json"), name="t")
    return src, dst, tail


def _batch(spark, rows):
    return spark.createDataFrame(rows, "op string, k long, v string, source_lsn long")


def _state(spark, tbl):
    return sorted((r["k"], r["v"]) for r in tbl.read(spark).collect())


def test_tail_replicates_interleaved_windows(spark, tmp_path):
    src, dst, tail = _mk(spark, tmp_path)
    h = tail.replicate_to(dst)

    src.merge(spark, _batch(spark, [("I", 1, "a", 1), ("I", 2, "b", 2)]), "b1")
    assert tail.poll(spark, h) == 1
    assert _state(spark, dst) == [(1, "a"), (2, "b")]

    # two source commits inside one poll window: update + delete net out
    src.merge(spark, _batch(spark, [("U", 1, "a2", 3), ("I", 3, "c", 4)]), "b2")
    src.merge(spark, _batch(spark, [("D", 2, None, 5)]), "b3")
    assert tail.poll(spark, h) == 2
    assert _state(spark, dst) == _state(spark, src) == [(1, "a2"), (3, "c")]

    # idle poll advances nothing
    assert tail.poll(spark, h) == 0
    assert tail.cursor() == src.commit_at(resolve=False).version


def test_replayed_window_is_exactly_once(spark, tmp_path):
    src, dst, tail = _mk(spark, tmp_path)
    h = tail.replicate_to(dst)
    src.merge(spark, _batch(spark, [("I", 1, "a", 1)]), "b1")
    tail.poll(spark, h)
    v_after = dst.commit_at(resolve=False).version

    # crash AFTER the handler, BEFORE the cursor write: re-delivery of the
    # same window must be skipped by the downstream batch hwm
    tail._save_cursor(0)
    assert tail.poll(spark, h) == 1
    assert dst.commit_at(resolve=False).version == v_after
    assert _state(spark, dst) == [(1, "a")]


def test_wider_replay_window_converges(spark, tmp_path):
    """Crash before the cursor write + NEW source commits before the retry:
    the replay window widens (different batch id, so it re-applies), and
    re-applied older images must lose to last-image-wins."""
    src, dst, tail = _mk(spark, tmp_path)
    h = tail.replicate_to(dst)
    src.merge(spark, _batch(spark, [("I", 1, "a", 1)]), "b1")
    tail.poll(spark, h)
    tail._save_cursor(0)  # lost cursor write
    src.merge(spark, _batch(spark, [("U", 1, "a2", 2), ("I", 2, "b", 3)]), "b2")
    assert tail.poll(spark, h) == 2  # window (0, 2] — includes re-delivery
    assert _state(spark, dst) == _state(spark, src) == [(1, "a2"), (2, "b")]


def test_run_to_idle_and_max_polls(spark, tmp_path):
    src, dst, tail = _mk(spark, tmp_path)
    h = tail.replicate_to(dst)
    src.merge(spark, _batch(spark, [("I", 1, "a", 1)]), "b1")
    src.merge(spark, _batch(spark, [("I", 2, "b", 2)]), "b2")
    assert tail.run_to_idle(spark, h) == 2
    assert _state(spark, dst) == [(1, "a"), (2, "b")]
    assert tail.run_to_idle(spark, h, max_polls=3) == 0


def test_handler_failure_leaves_cursor_for_retry(spark, tmp_path):
    src, dst, tail = _mk(spark, tmp_path)
    src.merge(spark, _batch(spark, [("I", 1, "a", 1)]), "b1")

    def boom(df, batch_id, window):
        raise RuntimeError("downstream hiccup")

    with pytest.raises(RuntimeError):
        tail.poll(spark, boom)
    assert tail.cursor() == 0  # nothing acknowledged
    assert tail.poll(spark, tail.replicate_to(dst)) == 1
    assert _state(spark, dst) == [(1, "a")]


def test_replicate_to_debezium_loop(spark, tmp_path):
    """source lake → tailer → Debezium record dirs → from_debezium →
    replica lake == source (the public-envelope twin of the binlog loop)."""
    import os

    from mysql_secure_agent_spark.sinks.debezium import read_debezium

    src, _, tail = _mk(spark, tmp_path)
    out = str(tmp_path / "topic")
    h = tail.replicate_to_debezium(out, ["k"], ["v"], db="d", table="t")

    src.merge(spark, _batch(spark, [("I", 1, "a", 10), ("I", 2, "b", 11)]), "b1")
    tail.poll(spark, h)
    src.merge(spark, _batch(spark, [("U", 1, "a2", 20), ("D", 2, None, 21)]), "b2")
    tail.poll(spark, h)
    dirs = sorted(os.listdir(out))
    assert len(dirs) == 2 and all(d.startswith("w") for d in dirs)

    back = read_debezium(
        spark, os.path.join(out, "*"), ["k"], [("k", "bigint"), ("v", "string")]
    )
    rep = LakeTable.create(str(tmp_path / "rep"), SCHEMA, ["k"], n_buckets=2)
    rep.merge(spark, back, "dbz")
    got = {r["k"]: r["v"] for r in rep.read(spark).collect()}
    want = {r["k"]: r["v"] for r in src.read(spark).collect()}
    assert got == want == {1: "a2"}
