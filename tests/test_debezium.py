"""Debezium-envelope sink/source: record shapes, tombstones, foreign-feed
parsing, and the changelog round trip."""

import json

import pyspark.sql.functions as F

from mysql_secure_agent_spark.sinks.debezium import (
    from_debezium_records,
    read_debezium,
    to_debezium_records,
    write_debezium,
)

ROW_COLS = [("k", "bigint"), ("v", "string")]


def _cl(spark):
    return spark.createDataFrame(
        [
            ("I", 1, "a", 10),
            ("U", 1, "b", 11),
            ("D", 2, None, 12),
            ("I", 3, "c", 2_000_005),  # second binlog file
        ],
        "op string, k long, v string, source_lsn long",
    )


def test_record_shapes_and_tombstone(spark):
    lines = [
        json.loads(r["value"])
        for r in to_debezium_records(
            _cl(spark), ["k"], ["v"], db="d", table="t"
        ).collect()
    ]
    assert len(lines) == 5  # 4 events + 1 tombstone
    ins, upd, dele, tomb, rot = lines[0], lines[1], lines[2], lines[3], lines[4]
    assert ins["value"]["op"] == "c" and ins["value"]["before"] is None
    assert ins["value"]["after"] == {"k": 1, "v": "a"}
    assert upd["value"]["op"] == "u" and upd["value"]["after"]["v"] == "b"
    assert dele["value"]["op"] == "d" and dele["value"]["after"] is None
    assert dele["value"]["before"] == {"k": 2, "v": None}  # key-only before
    assert tomb == {"key": {"k": 2}, "value": None}
    assert dele["value"]["source"]["file"] == "mysql-bin.000000"
    assert dele["value"]["source"]["pos"] == 12
    assert rot["value"]["source"]["file"] == "mysql-bin.000002"
    assert rot["value"]["source"]["pos"] == 5


def test_roundtrip_changelog(spark):
    cl = _cl(spark)
    lines = to_debezium_records(cl, ["k"], ["v"])
    back = from_debezium_records(lines, ["k"], ROW_COLS)
    got = {
        (r["op"], r["k"], r["v"], r["source_lsn"])
        for r in back.collect()
    }
    exp = {tuple(r) for r in cl.collect()}
    assert got == exp  # tombstones dropped, ops mapped back, lsn exact


def test_foreign_feed_file_pos_lsn_and_snapshot_op(spark):
    """A record produced by real Debezium: no source.lsn (file+pos only),
    op='r' snapshot reads, before-image on deletes."""
    recs = [
        json.dumps(
            {
                "key": {"k": 7},
                "value": {
                    "before": None,
                    "after": {"k": 7, "v": "snap"},
                    "source": {"name": "m", "db": "d", "table": "t",
                               "file": "mysql-bin.000003", "pos": 500},
                    "op": "r",
                    "ts_ms": 1,
                },
            }
        ),
        json.dumps(
            {
                "key": {"k": 7},
                "value": {
                    "before": {"k": 7, "v": "snap"},
                    "after": None,
                    "source": {"name": "m", "db": "d", "table": "t",
                               "file": "mysql-bin.000003", "pos": 600},
                    "op": "d",
                    "ts_ms": 2,
                },
            }
        ),
        json.dumps({"key": {"k": 7}, "value": None}),  # tombstone
    ]
    lines = spark.createDataFrame([(r,) for r in recs], "value string")
    out = from_debezium_records(lines, ["k"], ROW_COLS).collect()
    assert len(out) == 2
    snap, dele = sorted(out, key=lambda r: r["source_lsn"])
    assert snap["op"] == "I" and snap["v"] == "snap"
    assert snap["source_lsn"] == 3_000_500  # file*rotate + pos
    assert dele["op"] == "D" and dele["k"] == 7
    assert dele["v"] == "snap"  # delete payload from the before image


def test_write_read_merge_final_state(spark, tmp_path):
    from mysql_secure_agent_spark.lake.table import LakeTable
    import pyspark.sql.types as T

    cl = _cl(spark)
    out = str(tmp_path / "topic")
    write_debezium(cl, out, ["k"], ["v"])
    back = read_debezium(spark, out, ["k"], ROW_COLS)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["k"], n_buckets=4)
    tbl.merge(spark, back, "dbz")
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "b", 3: "c"}


def test_schema_change_topic_to_ddl_frame(spark):
    from mysql_secure_agent_spark.sinks.debezium import (
        from_debezium_schema_changes,
    )

    msgs = [
        # bare record with explicit lsn
        json.dumps(
            {
                "databaseName": "d",
                "ddl": "ALTER TABLE t ADD COLUMN note INT AFTER v",
                "source": {"lsn": 42},
            }
        ),
        # connect-envelope wrapped, position from file+pos
        json.dumps(
            {
                "schema": {"type": "struct"},
                "payload": {
                    "databaseName": "d",
                    "ddl": "ALTER TABLE `d`.`t` DROP COLUMN note",
                    "source": {"file": "mysql-bin.000002", "pos": 7},
                },
            }
        ),
        # other table: filtered out
        json.dumps({"databaseName": "d", "ddl": "ALTER TABLE other ADD c INT",
                    "source": {"lsn": 50}}),
        # non-DDL record (snapshot marker): dropped
        json.dumps({"databaseName": "d", "source": {"lsn": 51}}),
    ]
    frame = from_debezium_schema_changes(msgs, "d", "t")
    assert [list(r) for r in frame.itertuples(index=False)] == [
        [42, "ADD_COLUMN", "note", "int", None],
        [2_000_007, "DROP_COLUMN", "note", None, None],
    ]


def test_schema_change_frame_from_dataframe(spark):
    from mysql_secure_agent_spark.sinks.debezium import (
        from_debezium_schema_changes,
    )

    df = spark.createDataFrame(
        [(json.dumps({"databaseName": "d", "ddl": "ALTER TABLE t ADD x BIGINT",
                      "source": {"lsn": 9}}),)],
        "value string",
    )
    frame = from_debezium_schema_changes(df, "d", "t")
    assert frame.iloc[0]["action"] == "ADD_COLUMN"
    assert frame.iloc[0]["column_type"] == "bigint"


def test_missing_source_position_fails_loudly(spark):
    from mysql_secure_agent_spark.sinks.debezium import from_debezium_records

    rec = json.dumps(
        {"key": {"k": 1},
         "value": {"before": None, "after": {"k": 1, "v": "x"},
                   "op": "c", "ts_ms": 1}}
    )
    lines = spark.createDataFrame([(rec,)], "value string")
    out = from_debezium_records(lines, ["k"], ROW_COLS)
    import pytest

    with pytest.raises(Exception, match="no source position"):
        out.collect()


def test_full_image_update_to_null_not_resurrected(spark):
    """A foreign FULL-row-image feed (before carries the complete old row)
    updating a column to NULL must land NULL — not coalesce back to the
    before-image's old value (regression)."""
    lines = spark.createDataFrame(
        [
            (
                '{"key":{"k":1},"value":{"before":null,'
                '"after":{"k":1,"txt":"old"},'
                '"source":{"name":"s","db":"d","table":"t",'
                '"file":"mysql-bin.000001","pos":10,"lsn":1000010,"ts_ms":1},'
                '"op":"c","ts_ms":1}}',
            ),
            (
                '{"key":{"k":1},"value":{"before":{"k":1,"txt":"old"},'
                '"after":{"k":1,"txt":null},'
                '"source":{"name":"s","db":"d","table":"t",'
                '"file":"mysql-bin.000001","pos":20,"lsn":1000020,"ts_ms":2},'
                '"op":"u","ts_ms":2}}',
            ),
        ],
        "value string",
    )
    cl = from_debezium_records(
        lines, ["k"], [("k", "bigint"), ("txt", "string")]
    ).orderBy("source_lsn")
    rows = cl.collect()
    assert [(r.op, r.k, r.txt) for r in rows] == [
        ("I", 1, "old"),
        ("U", 1, None),
    ]
