"""mysqldump archive source/sink: header, CREATE TABLE grammar, literal
lexer, distributed restore, and the snapshot→stream handoff contract."""

import datetime as dt
import decimal
import os

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.sources.dump_sql import (
    _lex_tuples,
    parse_create_table,
    parse_dump_header,
    restore_dump,
    sql_literal,
    write_dump_sql,
)


def test_parse_dump_header_master_data():
    text = (
        "-- MySQL dump 10.13  Distrib 8.0.36\n"
        "--\n"
        "-- CHANGE MASTER TO MASTER_LOG_FILE='mysql-bin.000003', "
        "MASTER_LOG_POS=1307;\n"
    )
    h = parse_dump_header(text)
    assert h["log_file"] == "mysql-bin.000003"
    assert h["log_pos"] == 1307


def test_parse_dump_header_8023_spelling_and_gtid():
    text = (
        "CHANGE REPLICATION SOURCE TO SOURCE_LOG_FILE='mysql-bin.000009', "
        "SOURCE_LOG_POS=42;\n"
        "SET @@GLOBAL.GTID_PURGED='3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5';\n"
    )
    h = parse_dump_header(text)
    assert h["log_file"] == "mysql-bin.000009"
    assert h["log_pos"] == 42
    assert h["gtid_purged"].endswith(":1-5")


def test_parse_create_table_mysqldump_shape():
    sql = """CREATE TABLE `transcripts` (
  `conv_id` varchar(64) NOT NULL,
  `turn_idx` int NOT NULL,
  `role` varchar(16) DEFAULT NULL,
  `text` longtext,
  `score` decimal(12,3) DEFAULT '0.000',
  `n` bigint unsigned DEFAULT NULL,
  `flag` tinyint(1) DEFAULT NULL,
  `ts` datetime(6) DEFAULT NULL,
  PRIMARY KEY (`conv_id`,`turn_idx`),
  KEY `idx_role` (`role`),
  CONSTRAINT `chk` CHECK ((`turn_idx` >= 0))
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci;"""
    info = parse_create_table(sql)
    assert info["table"] == "transcripts"
    assert info["key_cols"] == ["conv_id", "turn_idx"]
    got = {n: s for n, _, s in info["columns"]}
    assert got == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "score": "decimal(12,3)",
        "n": "decimal(20,0)",  # bigint unsigned widens
        "flag": "boolean",  # tinyint(1)
        "ts": "timestamp",
    }
    f = {x.name: x for x in info["spark_schema"].fields}
    assert not f["conv_id"].nullable and f["role"].nullable


def test_parse_create_table_unique_key_fallback():
    sql = "CREATE TABLE t (a bigint NOT NULL, b text, UNIQUE KEY u (a))"
    assert parse_create_table(sql)["key_cols"] == ["a"]


def test_lex_tuples_escapes_and_types():
    stmt = (
        "INSERT INTO `t` VALUES "
        "(1,'it''s',NULL,-2.5,0xDEAD,_binary 'AB','a\\nb\\\\c',b'101'),"
        "(2,'x',3,1e-3,X'BEEF','','tab\\there',b'0');"
    )
    rows = _lex_tuples(stmt)
    assert len(rows) == 2
    r = rows[0]
    assert r[0] == 1 and r[1] == "it's" and r[2] is None and r[3] == -2.5
    assert r[4] == bytes.fromhex("DEAD") and r[5] == b"AB"
    assert r[6] == "a\nb\\c" and r[7] == 0b101
    assert rows[1][4] == bytes.fromhex("BEEF") and rows[1][7] == 0


def test_sql_literal_escaping_roundtrips_through_lexer():
    tricky = "line1\nline2\t'quoted' \\back\\ \x1a end"
    stmt = f"INSERT INTO `t` VALUES ({sql_literal(tricky)});"
    assert "\n" not in stmt.rstrip("\n").rstrip(";")  # one-line invariant
    assert _lex_tuples(stmt)[0][0] == tricky


@pytest.fixture()
def tricky_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("amt", T.DecimalType(12, 3), True),
            T.StructField("ok", T.BooleanType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    rows = [
        (1, "plain", 1.5, decimal.Decimal("10.250"), True, b"\x00\xffbin",
         dt.datetime(2024, 3, 1, 12, 30, 45, 123456)),
        (2, "quote's \"and\" back\\slash", -0.1, None, False, None,
         dt.datetime(2024, 3, 2, 0, 0, 0)),
        (3, "new\nline\ttab", 1e-17, decimal.Decimal("-0.001"), None, b"",
         None),
        (4, None, float(2**53 + 1), decimal.Decimal("999999999.999"), True,
         b"A" * 100, dt.datetime(1999, 12, 31, 23, 59, 59, 999999)),
        (5, "unicode café € 北京", 3.141592653589793, decimal.Decimal("0.000"),
         False, bytes(range(32)), dt.datetime(2024, 1, 1)),
    ]
    return spark.createDataFrame(rows, schema)


def test_dump_roundtrip(spark, tmp_path, tricky_df):
    out = str(tmp_path / "dump")
    manifest = write_dump_sql(
        tricky_df, out, "t", ["id"], n_shards=3,
        log_file="mysql-bin.000002", log_pos=777,
    )
    assert sum(m["n_rows"] for m in manifest) == 5
    files = sorted(os.listdir(out))
    assert files[0] == "dump.00000.sql"
    tbl, info = restore_dump(spark, out, str(tmp_path / "tbl"), n_buckets=4)
    assert info["log_file"] == "mysql-bin.000002" and info["log_pos"] == 777
    assert info["start_lsn"] == 2_000_777
    got = tbl.read(spark).orderBy("id").toPandas()
    exp = tricky_df.orderBy("id").toPandas()
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )


def test_dump_roundtrip_single_file(spark, tmp_path, tricky_df):
    """cat shards in name order == a valid single-file dump."""
    out = str(tmp_path / "dump")
    write_dump_sql(tricky_df, out, "t", ["id"], n_shards=4)
    single = str(tmp_path / "all.sql")
    with open(single, "w", encoding="utf-8") as w:
        for f in sorted(os.listdir(out)):
            w.write(open(os.path.join(out, f), encoding="utf-8").read())
    tbl, info = restore_dump(spark, single, str(tmp_path / "tbl"), n_buckets=4)
    assert info["start_lsn"] == 0  # no coordinates recorded
    assert tbl.read(spark).count() == 5


def test_restore_then_stream_handoff(spark, tmp_path):
    """The T7 contract: a table restored at the dump's position converges
    with a stream of later events by last-image-wins — updates supersede
    restored images, deletes remove restored keys, new keys insert."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    snap = spark.createDataFrame(
        [(i, f"old{i}") for i in range(10)], schema
    )
    out = str(tmp_path / "dump")
    write_dump_sql(snap, out, "t", ["k"], n_shards=2,
                   log_file="mysql-bin.000000", log_pos=100)
    tbl, info = restore_dump(spark, out, str(tmp_path / "tbl"), n_buckets=4)
    assert info["start_lsn"] == 100

    later = spark.createDataFrame(
        [("U", 3, "new3", 101), ("D", 5, None, 102), ("I", 42, "new42", 103)],
        "op string, k long, v string, source_lsn long",
    )
    tbl.merge(spark, later, "stream-1")
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    exp = {i: f"old{i}" for i in range(10) if i != 5}
    exp[3] = "new3"
    exp[42] = "new42"
    assert got == exp


def test_multi_table_dump_restore(spark, tmp_path):
    """A real mysqldump interleaves per-table blocks (CREATE then INSERTs);
    scan_dump_tables must find every table past the first INSERT, and
    restore_dump_all pins ALL tables at the archive's single coordinate."""
    from mysql_secure_agent_spark.sources.dump_sql import (
        restore_dump_all,
        scan_dump_tables,
    )

    dump = tmp_path / "all.sql"
    dump.write_text(
        "-- MySQL dump 10.13\n"
        "-- CHANGE MASTER TO MASTER_LOG_FILE='mysql-bin.000001', "
        "MASTER_LOG_POS=500;\n"
        "\n"
        "CREATE TABLE `users` (\n"
        "  `uid` bigint NOT NULL,\n"
        "  `name` varchar(32) DEFAULT NULL,\n"
        "  PRIMARY KEY (`uid`)\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `users` VALUES (1,'ann'),(2,'bo''b');\n"
        "\n"
        "CREATE TABLE `orders` (\n"
        "  `oid` bigint NOT NULL,\n"
        "  `uid` bigint NOT NULL,\n"
        "  `amt` decimal(10,2) DEFAULT NULL,\n"
        "  PRIMARY KEY (`oid`)\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `orders` VALUES (10,1,5.25),(11,2,NULL);\n",
        encoding="utf-8",
    )
    meta = scan_dump_tables([str(dump)])
    assert list(meta["tables"]) == ["users", "orders"]
    assert meta["header"]["log_pos"] == 500

    out = restore_dump_all(spark, str(dump), str(tmp_path / "lake"), n_buckets=2)
    assert out["start_lsn"] == 1_000_500
    users = {r["uid"]: r["name"] for r in out["tables"]["users"].read(spark).collect()}
    assert users == {1: "ann", 2: "bo'b"}
    orders = {
        r["oid"]: (r["uid"], None if r["amt"] is None else float(r["amt"]))
        for r in out["tables"]["orders"].read(spark).collect()
    }
    assert orders == {10: (1, 5.25), 11: (2, None)}


def test_multi_table_export_roundtrip(spark, tmp_path):
    from mysql_secure_agent_spark.sources.dump_sql import (
        restore_dump_all,
        write_dump_sql_all,
    )

    users = spark.createDataFrame(
        [(1, "ann"), (2, "bo'b")], "uid long, name string"
    )
    orders = spark.createDataFrame(
        [(10, 1, 5.25), (11, 2, None)], "oid long, uid long, amt double"
    )
    out = str(tmp_path / "dump")
    write_dump_sql_all(
        {"users": (users, ["uid"]), "orders": (orders, ["oid"])},
        out,
        log_file="mysql-bin.000004",
        log_pos=99,
    )
    res = restore_dump_all(spark, out, str(tmp_path / "lake"), n_buckets=2)
    assert res["start_lsn"] == 4_000_099
    assert set(res["tables"]) == {"users", "orders"}
    assert {r["uid"]: r["name"] for r in res["tables"]["users"].read(spark).collect()} \
        == {1: "ann", 2: "bo'b"}
    assert res["tables"]["orders"].read(spark).count() == 2


# ------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st

_values = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=60),
    st.binary(max_size=40),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(_values, min_size=1, max_size=5), min_size=1, max_size=4))
def test_literal_lexer_roundtrip_property(rows):
    """Any value rendered by sql_literal must lex back equal (floats via
    shortest-round-trip repr are exact; bytes via 0x hex; strings through
    the escape table) and the statement must stay one physical line."""
    from mysql_secure_agent_spark.sources.dump_sql import (
        _lex_tuples,
        sql_literal,
    )

    arity = len(rows[0])
    rows = [r[:arity] + [None] * (arity - len(r)) for r in rows]
    stmt = (
        "INSERT INTO `t` VALUES "
        + ",".join(
            "(" + ",".join(sql_literal(v) for v in r) + ")" for r in rows
        )
        + ";"
    )
    assert "\n" not in stmt
    got = _lex_tuples(stmt)
    assert len(got) == len(rows)
    for want_row, got_row in zip(rows, got):
        for w, g in zip(want_row, got_row):
            if isinstance(w, bytes):
                assert g == (w if w else "")  # empty bytes render as ''
            elif isinstance(w, float):
                assert isinstance(g, (int, float)) and float(g) == w
            elif isinstance(w, bool):
                assert g == int(w)
            else:
                assert g == w


def test_data_containing_paren_values_keyword(spark, tmp_path):
    """A string VALUE containing "(...) VALUES" must not be mistaken for an
    explicit column list (regression: a re.search over the whole line
    raised 'INSERT column list != schema' on valid data)."""
    df = spark.createDataFrame(
        [(1, "see (appendix) VALUES for details"), (2, "plain")],
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("txt", T.StringType(), True),
            ]
        ),
    )
    out = str(tmp_path / "dump")
    write_dump_sql(df, out, "t", ["id"], n_shards=1)
    tbl, _ = restore_dump(spark, out, str(tmp_path / "tbl"), n_buckets=2)
    got = tbl.read(spark).orderBy("id").toPandas()
    assert got["txt"].tolist() == ["see (appendix) VALUES for details", "plain"]


def test_explicit_column_list_accepted_and_checked(spark, tmp_path):
    """INSERTs carrying an explicit column list parse when it matches the
    schema order and fail loud when it does not."""
    from mysql_secure_agent_spark.sources.dump_sql import read_dump_rows

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("txt", T.StringType(), True),
        ]
    )
    p = tmp_path / "d.sql"
    p.write_text(
        "-- head\n"
        "CREATE TABLE `t` (`id` bigint NOT NULL, `txt` longtext,"
        " PRIMARY KEY (`id`));\n"
        "INSERT INTO `t` (`id`, `txt`) VALUES (1,'a'),(2,'b');\n"
    )
    got = read_dump_rows(spark, str(p), "t", schema).orderBy("id").collect()
    assert [(r.id, r.txt) for r in got] == [(1, "a"), (2, "b")]
    bad = tmp_path / "bad.sql"
    bad.write_text("INSERT INTO `t` (`txt`, `id`) VALUES ('a',1);\n")
    with pytest.raises(Exception, match="column list"):
        read_dump_rows(spark, str(bad), "t", schema).collect()
