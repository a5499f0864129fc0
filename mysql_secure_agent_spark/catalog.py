"""Catalog metadata scan — SURVEY §2.1 S4 (information_schema analog).

The reference re-discovers every synced table's definition each cycle with a
3-way LEFT join over ``information_schema.COLUMNS × KEY_COLUMN_USAGE ×
TABLES`` (``source/TableDefinitions.java:22-38``, SQL text :56-79), collapses
multi-FK rows by taking the first attributes per column
(``TableDefinitions.java:26-36,105-113``), and emits
``TableDefinition{table, [ColumnDefinition{name, type, key}]}``
(``output/TableDefinition.java``, ``output/ColumnDefinition.java:6-31``).

Our catalog is the directory of LakeTables; table and column metadata live in
each table's commit manifest (already the current schema version — no
re-inference race, the gap the reference acknowledges in its TODOs,
``Updater.java:166-168``). This module surfaces the same shape: one row per
column with ordinal, Spark type, and key flag — queryable as a DataFrame,
the engine's ``DESCRIBE``/info-schema surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .lake.table import LakeTable

COLUMNS = [
    "schema_name",
    "table_name",
    "column_name",
    "ordinal_position",
    "data_type",
    "is_key",
    "table_version",
    "n_buckets",
]


def discover_tables(root_dir: str) -> dict[str, LakeTable]:
    """LakeTables under ``root_dir`` (one subdirectory per table; a table is
    any dir with a ``_commits/CURRENT`` pointer). The TableRef key is
    ``{root_basename}.{table_dir}`` — the reference's schema.table string
    form (``TableRef.java:33-39``)."""
    out: dict[str, LakeTable] = {}
    schema_name = os.path.basename(os.path.normpath(root_dir))
    if not os.path.isdir(root_dir):
        return out
    for name in sorted(os.listdir(root_dir)):
        path = os.path.join(root_dir, name)
        if os.path.exists(os.path.join(path, "_commits", "CURRENT")):
            out[f"{schema_name}.{name}"] = LakeTable(path)
    return out


def table_definitions(spark: SparkSession, root_dir: str) -> DataFrame:
    """One row per (table, column): the ``TableDefinitions.get()`` analog.
    Ordered by (table, ordinal) like the reference's info-schema query
    (ORDER BY ordinal, ``TableDefinitions.java:78``)."""
    rows = []
    for ref, table in discover_tables(root_dir).items():
        schema_name, table_name = ref.split(".", 1)
        commit = table.commit_at(resolve=False)
        keys = set(commit.key_cols)
        for i, (col, dtype) in enumerate(commit.schema, start=1):
            rows.append(
                (
                    schema_name,
                    table_name,
                    col,
                    i,
                    dtype,
                    col in keys,
                    commit.version,
                    commit.n_buckets,
                )
            )
    return spark.createDataFrame(
        rows,
        schema="schema_name string, table_name string, column_name string, "
        "ordinal_position int, data_type string, is_key boolean, "
        "table_version int, n_buckets int",
    )
