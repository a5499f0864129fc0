"""Streaming binlog-directory tail (streaming/binlog_tail.py): incremental
file discovery, exactly-once across checkpoint resume, fresh-checkpoint
regrouping idempotence, and cross-file lsn ordering — with the export
sink as the file producer (full loop: changelog → binlog files → tail →
lake)."""

import os
import shutil

import pyspark.sql.types as T
from pyspark.sql import functions as F

from mysql_secure_agent_spark.functions.mysql_codecs import (
    DOUBLE,
    LONG,
    LONGLONG,
    VARCHAR,
    ColumnSpec,
)
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.sinks.binlog_export import write_binlog_changelog
from mysql_secure_agent_spark.streaming.binlog_tail import BinlogDirectoryTail

SPECS = [
    ColumnSpec("id", LONGLONG),
    ColumnSpec("slot", LONG),
    ColumnSpec("name", VARCHAR, {"max_len": 20}),
    ColumnSpec("score", DOUBLE),
]
SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("slot", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def _cl(spark, lsns):
    rows = [
        ("D" if l % 11 == 7 else "U", l % 8, l % 3, f"n{l}", l * 1.5, l)
        for l in lsns
    ]
    return spark.createDataFrame(
        rows,
        "op string, id long, slot int, name string, score double, source_lsn long",
    )


def _expected(spark, lsns):
    cl = _cl(spark, lsns)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("source_lsn").desc())
    return (
        cl.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("id", "slot", "name", "score")
    )


def _assert_state(spark, tbl, lsns):
    got = tbl.read(spark).select("id", "slot", "name", "score")
    exp = _expected(spark, lsns)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_tail_incremental_resume_and_regroup(spark, tmp_path):
    logs = str(tmp_path / "logs")
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    tail = BinlogDirectoryTail(tbl, logs, "s", "t")
    ck = str(tmp_path / "ck")

    # drop files 1-2 (first half of the log), drain
    write_binlog_changelog(
        _cl(spark, range(0, 20)), logs, "s", "t", SPECS, n_files=2, base_file_no=1
    )
    m1 = tail.run(spark, ck)
    assert sum(len(m["files"]) for m in m1) == 2
    _assert_state(spark, tbl, range(0, 20))

    # drop files 3-4 (the rest), drain again: only the NEW files ingest
    write_binlog_changelog(
        _cl(spark, range(20, 40)), logs, "s", "t", SPECS, n_files=2, base_file_no=3
    )
    m2 = tail.run(spark, ck)
    assert {f for m in m2 for f in m["files"]} == {
        "mysql-bin.000003", "mysql-bin.000004",
    }
    _assert_state(spark, tbl, range(0, 40))

    # same checkpoint, nothing new → no epoch, no version
    v = tbl.current_version()
    assert tail.run(spark, ck) == []
    assert tbl.current_version() == v

    # FRESH checkpoint over the grown directory: the file source regroups
    # everything into one batch; content-addressed ids + value-idempotent
    # merges make the reapply a no-op on state
    tail2 = BinlogDirectoryTail(tbl, logs, "s", "t")
    m3 = tail2.run(spark, str(tmp_path / "ck2"))
    assert {f for m in m3 for f in m["files"]} == {
        f"mysql-bin.{i:06d}" for i in range(1, 5)
    }
    _assert_state(spark, tbl, range(0, 40))


def test_tail_crash_replay_is_skipped(spark, tmp_path):
    logs = str(tmp_path / "logs")
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    write_binlog_changelog(
        _cl(spark, range(0, 10)), logs, "s", "t", SPECS, n_files=1
    )
    tail = BinlogDirectoryTail(tbl, logs, "s", "t")
    tail.run(spark, str(tmp_path / "ck"))
    v = tbl.current_version()
    # simulate "crash after merge, before source commit": wipe the source
    # checkpoint's commits so the epoch replays — the ledger must skip it
    shutil.rmtree(str(tmp_path / "ck"))
    m = tail.run(spark, str(tmp_path / "ck"))
    assert m and all(x.get("skipped") for x in m)
    assert tbl.current_version() == v
    _assert_state(spark, tbl, range(0, 10))


def test_cross_file_order_from_positions(spark, tmp_path):
    # key 5's images: upsert in file 1, delete in file 2 — the file-derived
    # lsn (file_no, end_log_pos) must order them without any payload lsn
    logs = str(tmp_path / "logs")
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    f1 = spark.createDataFrame(
        [("U", 5, 1, "alive", 1.0, 0)],
        "op string, id long, slot int, name string, score double, source_lsn long",
    )
    f2 = spark.createDataFrame(
        [("D", 5, 1, "dead", 2.0, 1)],
        "op string, id long, slot int, name string, score double, source_lsn long",
    )
    write_binlog_changelog(f1, logs, "s", "t", SPECS, n_files=1, base_file_no=1)
    write_binlog_changelog(f2, logs, "s", "t", SPECS, n_files=1, base_file_no=2)
    BinlogDirectoryTail(tbl, logs, "s", "t").run(spark, str(tmp_path / "ck"))
    assert tbl.read(spark).filter(F.col("id") == 5).count() == 0


def test_changefeed_replicates_to_binlog_files(spark, tmp_path):
    """Full replication loop: source lake → changefeed tailer → binlog
    files → directory tail → replica lake; plus idempotent re-render of
    a lost-cursor window (byte-identical file)."""
    from mysql_secure_agent_spark.streaming.changefeed_tail import (
        ChangefeedTailer,
    )

    src = LakeTable.create(str(tmp_path / "src"), SCHEMA, ["id"], n_buckets=4)
    out = str(tmp_path / "binlogs")
    cursor = str(tmp_path / "cursor.json")
    tailer = ChangefeedTailer(src, cursor)
    handler = tailer.replicate_to_binlog(out, "s", "t", SPECS)

    src.merge(spark, _cl(spark, range(0, 15)), "b1")
    tailer.run_to_idle(spark, handler)
    src.merge(spark, _cl(spark, range(15, 30)), "b2")
    tailer.run_to_idle(spark, handler)
    files = sorted(os.listdir(out))
    assert len(files) == 2 and all(f.startswith("mysql-bin.") for f in files)

    # lost cursor → the window re-renders to the SAME file, byte-identical
    first = os.path.join(out, files[0])
    before = open(first, "rb").read()
    os.remove(cursor)
    tailer.run_to_idle(spark, handler)
    assert open(first, "rb").read() == before

    # consume the exported stream with the directory tail → replica == source
    import os as _os

    replica = LakeTable.create(str(tmp_path / "rep"), SCHEMA, ["id"], n_buckets=4)
    BinlogDirectoryTail(replica, out, "s", "t").run(spark, str(tmp_path / "ck"))
    a = src.read(spark).select("id", "slot", "name", "score")
    b = replica.read(spark).select("id", "slot", "name", "score")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
