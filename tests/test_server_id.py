"""Circular-replication loop prevention: origin server ids through the
binlog export/ingest loop (MySQL replicate-same-server-id=0 /
IGNORE_SERVER_IDS semantics — the reference has no relay story at all)."""

import pyspark.sql.functions as F

from mysql_secure_agent_spark.functions.mysql_codecs import (
    LONGLONG,
    VARCHAR,
    ColumnSpec,
)
from mysql_secure_agent_spark.sinks.binlog_export import write_binlog_changelog
from mysql_secure_agent_spark.sources.binlog_file import read_binlog_files

SPECS = [
    ColumnSpec("k", LONGLONG),
    ColumnSpec("v", VARCHAR, {"max_len": 256}),
    ColumnSpec("lsn", LONGLONG),
]
SCHEMA = "op string, k long, v string, lsn long, source_lsn long"
SCHEMA_O = SCHEMA + ", _origin int"


def _cl(spark, rows):
    df = spark.createDataFrame(rows, "op string, k long, v string, lsn long")
    # the export splits files on source_lsn; the payload carries its own copy
    return df.withColumn("source_lsn", F.col("lsn"))


def test_self_echo_suppressed(spark, tmp_path):
    """A server tailing a feed that contains its own changes drops them."""
    cl = _cl(spark, [("U", 1, "a", 10), ("U", 2, "b", 20)])
    out = str(tmp_path / "a")
    write_binlog_changelog(cl, out, "s", "t", SPECS, n_files=1, server_id=7)
    # the writer's own id in the ignore set → nothing comes back
    back = read_binlog_files(
        spark, out, "s", "t", ["k", "v", "lsn"], SCHEMA,
        ignore_server_ids={7},
    )
    assert back.count() == 0
    # a different id → everything, with provenance
    back2 = read_binlog_files(
        spark, out, "s", "t", ["k", "v", "lsn"], SCHEMA_O,
        ignore_server_ids={9}, emit_origin=True,
    ).collect()
    assert len(back2) == 2
    assert {r["_origin"] for r in back2} == {7}


def test_relay_preserves_origin_and_loop_closes(spark, tmp_path):
    """A→B→A: B relays A's changes stamped with A's id alongside B-native
    changes stamped with B's id; A tails B's files ignoring its own id and
    receives ONLY the B-native rows — the loop cannot echo."""
    # A's binlog: two changes, origin id 1
    a_cl = _cl(spark, [("U", 1, "a1", 10), ("U", 2, "a2", 20)])
    a_dir = str(tmp_path / "a")
    write_binlog_changelog(a_cl, a_dir, "s", "t", SPECS, n_files=1, server_id=1)

    # B ingests A's binlog, preserving origin
    b_in = read_binlog_files(
        spark, a_dir, "s", "t", ["k", "v", "lsn"], SCHEMA_O,
        emit_origin=True,
    )
    # B's own native changes, origin 2
    b_native = _cl(spark, [("U", 3, "b3", 30), ("D", 1, None, 40)]).withColumn(
        "_origin", F.lit(2)
    )
    b_all = b_in.unionByName(b_native)
    b_dir = str(tmp_path / "b")
    write_binlog_changelog(
        b_all, b_dir, "s", "t", SPECS, n_files=1,
        server_id=2, origin_col="_origin",
    )

    # A tails B, ignoring its own origin id
    back = read_binlog_files(
        spark, b_dir, "s", "t", ["k", "v", "lsn"], SCHEMA_O,
        ignore_server_ids={1}, emit_origin=True,
    ).collect()
    got = {(r["op"], r["k"], r["v"], r["_origin"]) for r in back}
    assert got == {("I", 3, "b3", 2), ("D", 1, None, 2)}  # upserts read back as I

    # sanity: without the filter A would re-apply its own images (the loop)
    unfiltered = read_binlog_files(
        spark, b_dir, "s", "t", ["k", "v", "lsn"], SCHEMA,
    )
    assert unfiltered.count() == 4
