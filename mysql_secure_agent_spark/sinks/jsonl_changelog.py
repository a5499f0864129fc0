"""JSONL changelog sink — SURVEY §2.9 K1, the reference's OUTPUT format.

The reference emits one JSON object per event into size/time-flushed files
(``output/BucketOutput.java:87-111``), with these exact shapes (verified by
``output/OutputSpec.java:46-97``):

  {"table":{"schemaName":S,"tableName":T},"upsert":[v0,v1,...]}
  {"table":{"schemaName":S,"tableName":T},"delete":[v0,v1,...]}
  {"table":{"schemaName":S,"tableName":T},"columns":[{"name":N,"type":Y,"key":B},...]}

Values are positional (column order = table definition order), rendered as
strings (the reference's Row is stringly-typed, ``source/Row.java:10-22``)
or null. This sink lets a consumer of the reference's S3 output read OUR
engine's changelog unchanged — migration is bidirectional.

The JSON lines are built JVM-side (``to_json`` over structs — codegen, no
Python) and written distributed; file sizing is delegated to Spark's text
writer (maxRecordsPerFile) — the 1 GiB/15 min flush analog at the sink.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def changelog_jsonl_lines(
    df: DataFrame,
    schema_name: str,
    table_name: str,
    columns: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Changelog rows → one-line JSON events (column ``value``), reference
    shapes: op D → delete, else upsert (INSERT→upsert / UPDATE→upsert of the
    new image, ``Updater.java:188-217``; delete rows carry their images in
    the same positional slot, ``BinlogClient.java:285-291``)."""
    table_struct = F.struct(
        F.lit(schema_name).alias("schemaName"), F.lit(table_name).alias("tableName")
    )
    vals = F.array(*[F.col(c).cast("string") for c in columns])
    upsert = F.to_json(F.struct(table_struct.alias("table"), vals.alias("upsert")))
    delete = F.to_json(F.struct(table_struct.alias("table"), vals.alias("delete")))
    return df.select(
        F.when(F.col(op_col) == "D", delete).otherwise(upsert).alias("value")
    )


def table_definition_line(
    schema_name: str,
    table_name: str,
    columns: list[tuple[str, str]],
    key_cols: list[str],
) -> str:
    """The tableDefinition event line (``output/TableDefinition.java``,
    shape per ``OutputSpec.java:77-97``)."""
    return json.dumps(
        {
            "table": {"schemaName": schema_name, "tableName": table_name},
            "columns": [
                {"name": n, "type": t, "key": n in set(key_cols)}
                for n, t in columns
            ],
        },
        separators=(",", ":"),
    )


def write_jsonl_changelog(
    df: DataFrame,
    path: str,
    schema_name: str,
    table_name: str,
    columns: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Distributed JSONL export of a changelog batch in the reference's
    output format. ``max_records_per_file`` bounds file size (the
    MAX_OUTPUT_SIZE flush analog, ``BucketOutput.java:30``)."""
    lines = changelog_jsonl_lines(df, schema_name, table_name, columns)
    w = lines.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.text(path)
