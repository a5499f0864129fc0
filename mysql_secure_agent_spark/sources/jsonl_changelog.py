"""JSONL changelog source — reads the reference's OUTPUT format back in.

The sink half (``sinks/jsonl_changelog.py``) writes the reference's exact
event shapes (``output/OutputSpec.java:46-97``):

  {"table":{"schemaName":S,"tableName":T},"upsert":[v0,v1,...]}
  {"table":{"schemaName":S,"tableName":T},"delete":[v0,v1,...]}
  {"table":{"schemaName":S,"tableName":T},"columns":[{"name":N,"type":Y,"key":B},...]}

This module is the inverse: parse those lines into a typed changelog
DataFrame that ``LakeTable.merge`` / ``last_image_wins`` accept directly.
Together they make migration bidirectional for real — a consumer can replay
the reference agent's S3 output through this engine (or ours through the
reference's loader) and land on the same table state.

All parsing is JVM-side (``from_json`` + positional ``element_at`` casts —
whole-stage codegen, no Python). Values are positional strings in table-
definition column order (the reference's Row is stringly-typed,
``source/Row.java:10-22``); Spark's string casts are exact inverses of the
sink's ``cast("string")`` rendering (Java ``Double.toString`` round-trips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# one parse schema covers all three event shapes; absent fields are null
_EVENT_SCHEMA = (
    "table struct<schemaName:string,tableName:string>, "
    "upsert array<string>, delete array<string>, "
    "columns array<struct<name:string,type:string,key:boolean>>"
)


def parse_changelog_lines(
    lines: DataFrame,
    columns: list[tuple[str, str]],
    value_col: str = "value",
) -> DataFrame:
    """JSONL event lines → typed changelog rows.

    ``columns`` is the table definition: ``[(name, spark_type_str), ...]`` in
    positional order (the order the sink rendered values in). Output columns:
    ``op`` ('U' for upsert — the reference folds INSERT and UPDATE into one
    upsert shape, ``Updater.java:188-217``, so I/U is not recoverable and is
    not needed: merge semantics are identical — or 'D'), the typed payload
    columns, plus ``schema_name``/``table_name`` for demux. tableDefinition
    lines carry no row images and are dropped here (see
    ``parse_table_definitions``).
    """
    e = F.from_json(F.col(value_col), _EVENT_SCHEMA)
    vals = F.coalesce(e["upsert"], e["delete"])
    typed = [
        F.element_at(vals, i + 1).cast(typ).alias(name)
        for i, (name, typ) in enumerate(columns)
    ]
    return (
        lines.select(
            F.when(e["delete"].isNotNull(), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            e["table"]["schemaName"].alias("schema_name"),
            e["table"]["tableName"].alias("table_name"),
            vals.alias("_vals"),
            *typed,
        )
        .filter(F.col("_vals").isNotNull())
        .drop("_vals")
    )


def parse_table_definitions(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """tableDefinition lines → one row per column: (schema_name, table_name,
    ordinal, col_name, col_type, is_key) — the S4 metadata-scan shape."""
    e = F.from_json(F.col(value_col), _EVENT_SCHEMA)
    cols = lines.select(
        e["table"]["schemaName"].alias("schema_name"),
        e["table"]["tableName"].alias("table_name"),
        F.posexplode(e["columns"]).alias("pos", "c"),
    ).filter(F.col("c").isNotNull())
    return cols.select(
        "schema_name",
        "table_name",
        (F.col("pos") + 1).alias("ordinal"),
        F.col("c")["name"].alias("col_name"),
        F.col("c")["type"].alias("col_type"),
        F.col("c")["key"].alias("is_key"),
    )


def read_jsonl_changelog(
    spark: SparkSession,
    path: str,
    columns: list[tuple[str, str]],
) -> DataFrame:
    """Read a JSONL changelog directory (as written by
    ``sinks.jsonl_changelog.write_jsonl_changelog`` or by the reference
    agent) into a typed changelog DataFrame."""
    return parse_changelog_lines(spark.read.text(path), columns)
