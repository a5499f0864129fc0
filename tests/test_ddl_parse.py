"""Wire-native DDL: QUERY_EVENT decode + ALTER TABLE parsing
(sources/ddl_parse.py) and its integration into the packet replay
(packets_to_changelog_and_ddl). The reference never parses DDL — it
re-diffs information_schema per cycle (TableDefinitions.java,
Updater.java:62-86) — so the goldens here come from the public MySQL
binlog-v4 QUERY_EVENT layout (libbinlogevents statement_events)."""

from __future__ import annotations

import pytest

from mysql_secure_agent_spark.sources.binlog_packets import (
    QUERY_EVENT,
    TABLE_MAP_EVENT,
    EXT_WRITE_ROWS,
    Query,
    parse_event_body,
    packets_to_changelog_and_ddl,
)
from mysql_secure_agent_spark.sources.ddl_parse import (
    mysql_type_to_spark,
    parse_alter_table,
    parse_query_ddl,
)


# ----------------------------------------------------------- type mapping
@pytest.mark.parametrize(
    "mysql, spark",
    [
        ("VARCHAR(255)", "string"),
        ("varchar(255) CHARACTER SET utf8mb4", "string"),
        ("INT", "int"),
        ("int(11)", "int"),
        ("INT UNSIGNED", "bigint"),
        ("BIGINT", "bigint"),
        ("BIGINT UNSIGNED", "decimal(20,0)"),
        ("tinyint(1)", "boolean"),
        ("tinyint(1) unsigned", "smallint"),
        ("TINYINT", "tinyint"),
        ("DECIMAL(12,3)", "decimal(12,3)"),
        ("NUMERIC(8)", "decimal(8,0)"),
        ("DATETIME(6)", "timestamp"),
        ("timestamp", "timestamp"),
        ("DATE", "date"),
        ("JSON", "string"),
        ("ENUM('a','b')", "string"),
        ("MEDIUMBLOB", "binary"),
        ("DOUBLE", "double"),
        ("FLOAT(7,4)", "float"),
        ("BIT(64)", "bigint"),
        ("VECTOR(384)", "array<float>"),
        ("mediumint unsigned", "int"),
    ],
)
def test_type_mapping(mysql, spark):
    assert mysql_type_to_spark(mysql) == spark


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unsupported MySQL type"):
        mysql_type_to_spark("GEOMETRYCOLLECTION")


# ----------------------------------------------------------- ALTER parser
def test_add_column_with_options():
    (schema, table), acts = parse_alter_table(
        "ALTER TABLE `db1`.`conv` ADD COLUMN `tool` VARCHAR(64) "
        "DEFAULT NULL COMMENT 'tool name' AFTER `role`"
    )
    assert (schema, table) == ("db1", "conv")
    assert acts == [
        {
            "action": "ADD_COLUMN",
            "column_name": "tool",
            "column_type": "string",
            "new_name": None,
            "position": ("after", "role"),
        }
    ]


def test_multi_clause_chain():
    _, acts = parse_alter_table(
        "alter table t add col_a int unsigned not null, "
        "drop column old_c, "
        "modify `turn_idx` BIGINT, "
        "change column `txt` `text` LONGTEXT, "
        "rename column a to b, "
        "add index idx_x (col_a), "
        "algorithm=inplace, lock=none"
    )
    assert [a["action"] for a in acts] == [
        "ADD_COLUMN",
        "DROP_COLUMN",
        "MODIFY_COLUMN",
        "RENAME_COLUMN",
        "MODIFY_COLUMN",
        "RENAME_COLUMN",
    ]
    assert acts[0]["column_type"] == "bigint"  # unsigned widened
    assert acts[3] == {
        "action": "RENAME_COLUMN",
        "column_name": "txt",
        "column_type": None,
        "new_name": "text",
    }
    assert acts[4]["column_name"] == "text"
    assert acts[4]["column_type"] == "string"


def test_parenthesized_multi_add_and_comments():
    _, acts = parse_alter_table(
        "/* ddl */ ALTER TABLE s.t ADD COLUMN (a INT, b TEXT) -- trailing\n;"
    )
    assert [(a["column_name"], a["column_type"]) for a in acts] == [
        ("a", "int"),
        ("b", "string"),
    ]


def test_change_same_name_is_modify_only():
    _, acts = parse_alter_table("ALTER TABLE t CHANGE c c BIGINT")
    assert acts == [
        {
            "action": "MODIFY_COLUMN",
            "column_name": "c",
            "column_type": "bigint",
            "new_name": None,
        }
    ]


def test_index_only_alter_yields_nothing():
    _, acts = parse_alter_table(
        "ALTER TABLE t ADD UNIQUE KEY uk (a,b), DROP INDEX old_idx, "
        "ADD CONSTRAINT fk FOREIGN KEY (x) REFERENCES p(id)"
    )
    assert acts == []


def test_unsupported_clause_strict_vs_lax():
    with pytest.raises(ValueError, match="unsupported ALTER TABLE clause"):
        parse_alter_table("ALTER TABLE t RENAME TO t2")
    _, acts = parse_alter_table("ALTER TABLE t RENAME TO t2", strict=False)
    assert acts == [{"action": "UNSUPPORTED", "clause": "RENAME TO t2"}]


def test_query_ddl_filtering():
    # txn markers and other tables produce nothing
    assert parse_query_ddl("s", "BEGIN", "s", "t") == []
    assert parse_query_ddl("s", "COMMIT", "s", "t") == []
    assert parse_query_ddl("s", "ALTER TABLE other ADD c INT", "s", "t") == []
    # unqualified resolves against the event's default schema
    assert parse_query_ddl("s2", "ALTER TABLE t ADD c INT", "s", "t") == []
    acts = parse_query_ddl("s", "ALTER TABLE t ADD c INT", "s", "t")
    assert acts[0]["column_name"] == "c"
    # explicit qualifier beats the default schema
    acts = parse_query_ddl("elsewhere", "ALTER TABLE `s`.`t` ADD c INT", "s", "t")
    assert acts[0]["column_name"] == "c"


# ------------------------------------------------------ QUERY_EVENT decode
def _query_body(schema: str, sql: str, status: bytes = b"\x00\x06\x03std") -> bytes:
    sb, qb = schema.encode(), sql.encode()
    return (
        (7).to_bytes(4, "little")          # thread id
        + (0).to_bytes(4, "little")        # exec time
        + bytes([len(sb)])                 # schema length
        + (0).to_bytes(2, "little")        # error code
        + len(status).to_bytes(2, "little")
        + status                           # status vars (opaque, skipped)
        + sb + b"\x00"
        + qb
    )


def test_query_event_decode():
    ev = parse_event_body(_query_body("db1", "ALTER TABLE t ADD c INT"),
                          QUERY_EVENT, {})
    assert isinstance(ev, Query)
    assert ev.schema_name == "db1"
    assert ev.sql == "ALTER TABLE t ADD c INT"
    assert ev.thread_id == 7


# ------------------------------------------- packet replay with wire DDL
def _tmap(types_meta: list[tuple[int, bytes]]) -> bytes:
    """TABLE_MAP for schema s, table t with the given (type, metadata)."""
    body = (7).to_bytes(6, "little") + b"\x00\x00"
    body += bytes([1]) + b"s\x00" + bytes([1]) + b"t\x00"
    body += bytes([len(types_meta)])
    body += bytes([t for t, _ in types_meta])
    meta = b"".join(m for _, m in types_meta)
    body += bytes([len(meta)]) + meta
    body += bytes([(1 << len(types_meta)) - 1])
    return body


def _write(imgs: list[bytes], n_cols: int) -> bytes:
    body = (7).to_bytes(6, "little") + b"\x00\x00"
    body += (2).to_bytes(2, "little")
    body += bytes([n_cols]) + bytes([(1 << n_cols) - 1])
    return body + b"".join(imgs)


def _img(*vals) -> bytes:
    """Row image over LONG columns only (nullable bitmap = none null)."""
    out = bytes([0])
    for v in vals:
        out += int(v).to_bytes(4, "little", signed=True)
    return out


def test_wire_ddl_add_column_mid_stream():
    LONG = (0x03, b"")
    packets = [
        (TABLE_MAP_EVENT, _tmap([LONG, LONG])),
        (EXT_WRITE_ROWS, _write([_img(1, 10)], 2)),
        (QUERY_EVENT, _query_body("s", "ALTER TABLE t ADD COLUMN c INT")),
        (TABLE_MAP_EVENT, _tmap([LONG, LONG, LONG])),
        (EXT_WRITE_ROWS, _write([_img(2, 20, 200)], 3)),
    ]
    rows, ddl = packets_to_changelog_and_ddl(packets, "s", "t", ["id", "v"])
    assert list(rows.columns) == ["op", "id", "v", "c", "source_lsn"]
    assert rows.loc[0, "c"] is None or rows.loc[0, "c"] != rows.loc[0, "c"]
    assert rows.loc[1, ["id", "v", "c"]].tolist() == [2, 20, 200]
    assert len(ddl) == 1
    assert ddl.loc[0].to_dict() == {
        "source_lsn": 3,
        "action": "ADD_COLUMN",
        "column_name": "c",
        "column_type": "int",
        "new_name": None,
    }


def test_wire_ddl_add_after_placement_and_drop():
    LONG = (0x03, b"")
    packets = [
        (TABLE_MAP_EVENT, _tmap([LONG, LONG])),          # id, v
        (EXT_WRITE_ROWS, _write([_img(1, 10)], 2)),
        (QUERY_EVENT, _query_body("s", "ALTER TABLE t ADD mid INT AFTER id")),
        (TABLE_MAP_EVENT, _tmap([LONG, LONG, LONG])),    # id, mid, v
        (EXT_WRITE_ROWS, _write([_img(2, 77, 20)], 3)),
        (QUERY_EVENT, _query_body("s", "ALTER TABLE t DROP COLUMN v")),
        (TABLE_MAP_EVENT, _tmap([LONG, LONG])),          # id, mid
        (EXT_WRITE_ROWS, _write([_img(3, 88)], 2)),
    ]
    rows, ddl = packets_to_changelog_and_ddl(packets, "s", "t", ["id", "v"])
    # AFTER placement: second insert's 77 must land in mid, 20 in v
    r2 = rows[rows["id"] == 2].iloc[0]
    assert (r2["mid"], r2["v"]) == (77, 20)
    # post-DROP: 88 is mid, v absent from the image
    r3 = rows[rows["id"] == 3].iloc[0]
    assert r3["mid"] == 88 and r3["v"] != r3["v"]  # NaN
    assert ddl["action"].tolist() == ["ADD_COLUMN", "DROP_COLUMN"]


def test_wire_ddl_rename_lag():
    LONG = (0x03, b"")
    packets = [
        (TABLE_MAP_EVENT, _tmap([LONG, LONG])),
        (EXT_WRITE_ROWS, _write([_img(1, 10)], 2)),
        (QUERY_EVENT, _query_body("s", "ALTER TABLE t RENAME COLUMN v TO w")),
        (TABLE_MAP_EVENT, _tmap([LONG, LONG])),
        (EXT_WRITE_ROWS, _write([_img(2, 20)], 2)),
    ]
    rows, ddl = packets_to_changelog_and_ddl(packets, "s", "t", ["id", "v"])
    # pre-rename rows under the old name, post-rename under the new
    assert rows[rows["id"] == 1].iloc[0]["v"] == 10
    assert rows[rows["id"] == 2].iloc[0]["w"] == 20
    assert ddl.loc[0, "new_name"] == "w"
