"""Selection / anonymization config (SURVEY §2.2 P1/P2/P4).

Re-expresses the reference's ``Config → SchemaConfig → TableConfig →
ColumnConfig`` tree (``config/Config.java:13-16``, ``config/SchemaConfig.java:9-22``,
``config/TableConfig.java:9-19``, ``config/ColumnConfig.java:8-19``):

* per-column ``selected`` flags with a ``select_other_columns`` default
  (``config/Config.java:44-65``) → drives ``df.select(...)`` (column pruning
  that Catalyst pushes into the scan),
* per-table / per-schema include-exclude (``config/Config.java:67-79``),
* per-column ``hash`` flag + crypto salt (``config/CryptoConfig.java:7-10``) →
  drives the vectorized SHA-1 anonymization (functions/anonymize.py).

JSON shape mirrors the reference's config file (``deserialize/DeserializeSpec.java:77-130``)
modulo snake_case.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class ColumnConfig:
    # ColumnConfig{selected, hash} — config/ColumnConfig.java:8-19
    selected: bool = True
    hash: bool = False


@dataclass
class TableConfig:
    # TableConfig{selected, selectOtherColumns, columns} — config/TableConfig.java:9-19
    selected: bool = True
    select_other_columns: bool = True
    columns: dict[str, ColumnConfig] = field(default_factory=dict)

    def selected_columns(self, all_columns: list[str]) -> list[str]:
        """Column selection semantics of Config.columnsToSync
        (config/Config.java:44-65): explicit flag wins, otherwise the
        select_other_columns default applies. Order preserved."""
        out = []
        for c in all_columns:
            cc = self.columns.get(c)
            if cc is not None:
                if cc.selected:
                    out.append(c)
            elif self.select_other_columns:
                out.append(c)
        return out

    def hashed_columns(self, all_columns: list[str]) -> list[str]:
        # Updater.hashedColumns analog — Updater.java:227-239
        return [
            c
            for c in all_columns
            if self.columns.get(c) is not None and self.columns[c].hash
        ]


@dataclass
class SchemaConfig:
    # SchemaConfig{selected, selectOtherTables, tables} — config/SchemaConfig.java:9-22
    selected: bool = True
    select_other_tables: bool = True
    tables: dict[str, TableConfig] = field(default_factory=dict)


@dataclass
class Config:
    # Config{schemas, selectOtherSchemas, cryptoSalt} — config/Config.java:13-16
    schemas: dict[str, SchemaConfig] = field(default_factory=dict)
    select_other_schemas: bool = True
    crypto_salt: str = ""

    def table_selected(self, schema: str, table: str) -> bool:
        """Table/schema include-exclude semantics — config/Config.java:67-79."""
        sc = self.schemas.get(schema)
        if sc is None:
            return self.select_other_schemas
        if not sc.selected:
            return False
        tc = sc.tables.get(table)
        if tc is None:
            return sc.select_other_tables
        return tc.selected

    def table_config(self, schema: str, table: str) -> TableConfig:
        sc = self.schemas.get(schema)
        if sc is None:
            return TableConfig()
        return sc.tables.get(table, TableConfig())

    # ------------------------------------------------------------------ serde
    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        schemas = {}
        for sname, sd in d.get("schemas", {}).items():
            tables = {}
            for tname, td in sd.get("tables", {}).items():
                cols = {
                    cname: ColumnConfig(
                        selected=cd.get("selected", True),
                        hash=cd.get("hash", False),
                    )
                    for cname, cd in td.get("columns", {}).items()
                }
                tables[tname] = TableConfig(
                    selected=td.get("selected", True),
                    select_other_columns=td.get("select_other_columns", True),
                    columns=cols,
                )
            schemas[sname] = SchemaConfig(
                selected=sd.get("selected", True),
                select_other_tables=sd.get("select_other_tables", True),
                tables=tables,
            )
        return Config(
            schemas=schemas,
            select_other_schemas=d.get("select_other_schemas", True),
            crypto_salt=d.get("crypto_salt", ""),
        )
