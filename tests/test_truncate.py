"""TRUNCATE TABLE handling (wire DDL → lake metadata-only empty commit).

MySQL logs TRUNCATE as a bare QUERY DDL statement with NO row events (it is
drop+recreate internally, bypassing row logging). The reference cannot see
it at all: its information_schema re-diff observes no schema change
(Updater.java:62-86) and its client loop discards QUERY events
(BinlogClient.java:191-195) — it keeps every pre-truncate row forever.
Debezium models the same gap with an explicit truncate change event; here
it becomes a metadata-only empty-live-set commit.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.sources.ddl_parse import parse_query_ddl

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _cl(spark, rows):
    return spark.createDataFrame(
        [(op, i, v, lsn) for op, i, v, lsn in rows],
        "op string, id long, v string, source_lsn long",
    )


# ----------------------------------------------------------------- parsing
def test_parse_truncate_forms():
    one = [{"action": "TRUNCATE", "column_name": None,
            "column_type": None, "new_name": None}]
    assert parse_query_ddl("s", "TRUNCATE TABLE t", "s", "t") == one
    assert parse_query_ddl("s", "truncate t;", "s", "t") == one
    assert parse_query_ddl("x", "TRUNCATE TABLE `s`.`t`", "s", "t") == one
    # other table / other schema filtered out
    assert parse_query_ddl("s", "TRUNCATE TABLE other", "s", "t") == []
    assert parse_query_ddl("other", "TRUNCATE t", "s", "t") == []
    # not mistaken for ALTER, not tripped by txn markers
    assert parse_query_ddl("s", "BEGIN", "s", "t") == []


def test_truncate_flows_through_wire_replay():
    import struct

    from test_binlog_packets import _row, _rows_body, _synthetic_table_map

    from mysql_secure_agent_spark.sources.binlog_packets import (
        EXT_WRITE_ROWS,
        QUERY_EVENT,
        TABLE_MAP_EVENT,
        packets_to_changelog_and_ddl,
    )

    import datetime as dt
    from decimal import Decimal

    def q(sql):
        return struct.pack("<IIBHH", 0, 0, 1, 0, 0) + b"s\x00" + sql.encode()

    def ins(i, name):
        return (EXT_WRITE_ROWS, _rows_body(
            [_row(i, name, Decimal("1.00"), dt.date(2026, 1, 1))]))

    pk = [
        (TABLE_MAP_EVENT, _synthetic_table_map()),
        ins(1, "pre"),
        (QUERY_EVENT, q("TRUNCATE TABLE t")),
        ins(2, "post"),
    ]
    rows, ddl = packets_to_changelog_and_ddl(
        pk, "s", "t", ["id", "name", "amt", "d"]
    )
    assert rows["name"].tolist() == ["pre", "post"]  # rows frame unchanged
    assert ddl.to_dict("records") == [{
        "source_lsn": 3, "action": "TRUNCATE", "column_name": None,
        "column_type": None, "new_name": None,
    }]


# -------------------------------------------------------------------- lake
def test_truncate_empties_live_set_keeps_history(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    tbl.merge(spark, _cl(spark, [("I", 1, "a", 1), ("I", 2, "b", 2)]), "b1")
    v_pre = tbl.current_version()
    v_trunc = tbl.truncate(ddl_lsn=3)
    assert tbl.read(spark).count() == 0
    # time travel below the truncate still serves the old rows
    assert tbl.read(spark, version=v_pre).count() == 2
    # post-truncate merges land on the empty table
    tbl.merge(spark, _cl(spark, [("I", 3, "c", 4)]), "b2")
    got = tbl.read(spark).collect()
    assert [(r["id"], r["v"]) for r in got] == [(3, "c")]
    # the truncate collapsed replayable history: floor rose to max seen lsn
    assert tbl.commit_at(v_trunc, resolve=False).changefeed_floor >= 2
    # ddl hwm advanced
    assert tbl.commit_at(resolve=False).ddl_hwm >= 3


def test_truncate_batch_id_exactly_once(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    tbl.merge(spark, _cl(spark, [("I", 1, "a", 1)]), "b1")
    tbl.truncate(batch_id="trunc-7")
    tbl.merge(spark, _cl(spark, [("I", 9, "z", 9)]), "b2")
    # replayed truncate with the same batch id must NOT wipe the new row
    v_before = tbl.current_version()
    v2 = tbl.truncate(batch_id="trunc-7")
    assert v2 == v_before  # skip: no new commit
    assert tbl.read(spark).count() == 1


def test_pipeline_apply_ddl_truncate(spark, tmp_path):
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    tbl.merge(spark, _cl(spark, [("I", 1, "a", 1)]), "b1")
    p = CdcPipeline(tbl, str(tmp_path / "feed"))
    p._apply_ddl(spark, {"action": "TRUNCATE", "source_lsn": 5,
                         "column_name": None, "column_type": None,
                         "new_name": None})
    assert tbl.read(spark).count() == 0
    assert tbl.commit_at(resolve=False).ddl_hwm >= 5


def test_pipeline_truncate_with_history_table_refused(spark, tmp_path):
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    hist = LakeTable.create(
        str(tmp_path / "h"),
        T.StructType(list(SCHEMA.fields) + [
            T.StructField("valid_from", T.LongType(), True),
        ]),
        ["id", "valid_from"],
        n_buckets=4,
    )
    p = CdcPipeline(tbl, str(tmp_path / "feed"), history_table=hist)
    with pytest.raises(ValueError, match="SCD-2 history"):
        p._apply_ddl(spark, {"action": "TRUNCATE", "source_lsn": 5,
                             "column_name": None, "column_type": None,
                             "new_name": None})
