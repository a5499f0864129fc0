"""K1 JSONL sink: event shapes must match the reference's output format
exactly (mirrors output/OutputSpec.java:46-97 — upsert/delete positional
arrays under the table ref, tableDefinition column list with key flags)."""

import json

from mysql_secure_agent_spark.sinks import (
    changelog_jsonl_lines,
    table_definition_line,
    write_jsonl_changelog,
)


def _events_df(spark):
    return spark.createDataFrame(
        [
            ("I", 0, 1, 2, 1),
            ("U", 0, 9, None, 2),
            ("D", 0, 1, 2, 3),
        ],
        "op string, a int, b int, c int, source_lsn long",
    )


def test_upsert_delete_shapes(spark):
    lines = [
        json.loads(r["value"])
        for r in changelog_jsonl_lines(
            _events_df(spark), "test_schema", "test_table", ["a", "b", "c"]
        ).collect()
    ]
    up = lines[0]
    assert up["table"] == {"schemaName": "test_schema", "tableName": "test_table"}
    assert up["upsert"] == ["0", "1", "2"] and len(up["upsert"]) == 3
    # null column stays positional (null), as in the reference's Row
    assert lines[1]["upsert"] == ["0", "9", None]
    assert lines[2]["delete"] == ["0", "1", "2"]
    assert "upsert" not in lines[2] and "delete" not in lines[0]


def test_table_definition_shape():
    line = json.loads(
        table_definition_line(
            "test_schema", "test_table", [("id", "text"), ("data", "text")], ["id"]
        )
    )
    assert line["table"]["schemaName"] == "test_schema"
    assert line["table"]["tableName"] == "test_table"
    assert line["columns"][0] == {"name": "id", "type": "text", "key": True}
    assert line["columns"][1] == {"name": "data", "type": "text", "key": False}


def test_write_jsonl_roundtrip(spark, tmp_path):
    out = str(tmp_path / "jsonl")
    write_jsonl_changelog(
        _events_df(spark), out, "s", "t", ["a", "b", "c"], max_records_per_file=2
    )
    back = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    assert len(back) == 3
    assert sum("upsert" in x for x in back) == 2
    assert sum("delete" in x for x in back) == 1
