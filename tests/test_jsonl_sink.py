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


# --------------------------------------------------------------- source half
def test_parse_changelog_lines_inverts_sink(spark, tmp_path):
    """source.read_jsonl_changelog(sink.write_jsonl_changelog(cl)) == cl —
    ops, nulls, and typed values all survive the positional string render."""
    from mysql_secure_agent_spark.sources.jsonl_changelog import read_jsonl_changelog

    out = str(tmp_path / "rt")
    write_jsonl_changelog(
        _events_df(spark), out, "s", "t", ["a", "b", "c", "source_lsn"]
    )
    cols = [("a", "int"), ("b", "int"), ("c", "int"), ("source_lsn", "long")]
    got = {
        r["source_lsn"]: r
        for r in read_jsonl_changelog(spark, out, cols).collect()
    }
    assert len(got) == 3
    assert (got[1]["op"], got[1]["a"], got[1]["b"], got[1]["c"]) == ("U", 0, 1, 2)
    assert (got[2]["op"], got[2]["c"]) == ("U", None)  # null survives
    assert got[3]["op"] == "D" and got[3]["b"] == 1  # delete keeps its image
    assert got[1]["schema_name"] == "s" and got[1]["table_name"] == "t"
    # typed, not stringly: parsed columns come back as ints/longs
    assert isinstance(got[1]["a"], int)


def test_parse_changelog_double_exact(spark, tmp_path):
    """Doubles round-trip bit-exactly through the string render (Java
    Double.toString is shortest-round-trip)."""
    from mysql_secure_agent_spark.sources.jsonl_changelog import read_jsonl_changelog

    vals = [0.1, 1e-4, 12345678.900000012, -2.5e17, float("inf")]
    df = spark.createDataFrame(
        [("U", v, i) for i, v in enumerate(vals)], "op string, v double, k int"
    )
    out = str(tmp_path / "dbl")
    write_jsonl_changelog(df, out, "s", "t", ["v", "k"])
    got = {
        r["k"]: r["v"]
        for r in read_jsonl_changelog(spark, out, [("v", "double"), ("k", "int")]).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v


def test_parse_table_definitions(spark):
    from mysql_secure_agent_spark.sinks import table_definition_line
    from mysql_secure_agent_spark.sources.jsonl_changelog import (
        parse_table_definitions,
    )

    line = table_definition_line(
        "sch", "tbl", [("id", "integer"), ("data", "text")], ["id"]
    )
    lines = spark.createDataFrame([(line,)], "value string")
    rows = {r["col_name"]: r for r in parse_table_definitions(lines).collect()}
    assert rows["id"]["is_key"] and rows["id"]["ordinal"] == 1
    assert rows["id"]["col_type"] == "integer"
    assert not rows["data"]["is_key"] and rows["data"]["ordinal"] == 2
    assert rows["data"]["schema_name"] == "sch" and rows["data"]["table_name"] == "tbl"


def test_parse_skips_definition_lines_in_changelog(spark):
    """A mixed stream (tableDefinition + rows) parses: definition lines are
    dropped by the row parser, row lines by the definition parser."""
    from mysql_secure_agent_spark.sinks import table_definition_line
    from mysql_secure_agent_spark.sources.jsonl_changelog import (
        parse_changelog_lines,
        parse_table_definitions,
    )

    defline = table_definition_line("s", "t", [("a", "integer")], ["a"])
    rowline = json.dumps({"table": {"schemaName": "s", "tableName": "t"}, "upsert": ["7"]})
    lines = spark.createDataFrame([(defline,), (rowline,)], "value string")
    rows = parse_changelog_lines(lines, [("a", "int")]).collect()
    assert len(rows) == 1 and rows[0]["a"] == 7
    defs = parse_table_definitions(lines).collect()
    assert len(defs) == 1 and defs[0]["col_name"] == "a"
