"""mysqldump logical-archive source (restore) + export sink.

The reference bootstraps its initial snapshot only from a LIVE connection —
paged SELECTs over JDBC (``ImportSourceTable.java:23-42``); it has no
offline path. Operationally, new replicas are seeded from an existing
``mysqldump`` archive (``--single-transaction --master-data``), whose header
records the exact binlog coordinates the snapshot is consistent with — the
same "pin the log head BEFORE importing" contract the reference implements
at ``Updater.java:78-79``. This module makes that archive a first-class
snapshot source:

* ``parse_dump_header`` extracts the replication coordinates mysqldump
  records: ``CHANGE MASTER TO MASTER_LOG_FILE=..., MASTER_LOG_POS=...``
  (``--master-data``; commented form when ``=2``), the 8.0.23+
  ``CHANGE REPLICATION SOURCE TO SOURCE_LOG_FILE=...`` spelling, and
  ``SET @@GLOBAL.GTID_PURGED=...`` (``--set-gtid-purged``).
* ``parse_create_table`` turns the archive's ``CREATE TABLE`` into a Spark
  schema + key columns, reusing the ALTER-grammar's MySQL→Spark type map
  (one source of truth for type mapping, ``sources/ddl_parse.py``).
* ``read_dump_rows`` parses the extended-INSERT statements DISTRIBUTED:
  mysqldump emits each INSERT as ONE physical line (string newlines are
  escaped as ``\\n``), so ``spark.read.text`` line-splits the archive for
  free — a single multi-GB dump file is splittable at block boundaries —
  and a mapInPandas stage lexes row tuples with a single-pass SQL-literal
  tokenizer (per-line parallelism; nothing gathers on the driver).
* ``restore_dump`` loads the archive into a LakeTable with every row at
  ``lsn = dump position`` so the subsequent stream handoff needs no
  coordination: any later binlog event supersedes the snapshot image by
  last-image-wins, and deletes at/below the dump position are no-ops —
  the T7 snapshot+replay-overlap argument, verbatim.

Binary-payload note: the reader decodes the archive as UTF-8, so
``_binary '…'`` literals carrying raw high bytes would be mangled —
dump binary columns with ``--hex-blob`` (``0x…`` literals, what our own
``write_dump_sql`` emits), which is the mysqldump-documented practice
for exactly this reason.

Write side: ``write_dump_sql`` renders any DataFrame as a
mysqldump-compatible archive (header + CREATE TABLE + extended INSERTs)
with MySQL string escaping — distributed, one task per shard file, shard 0
carrying the header so ``cat dump.* > all.sql`` is a valid single-file dump.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .ddl_parse import _split_top_level, _unquote, mysql_type_to_spark

_IDENT = r"(`(?:[^`]|``)+`|[A-Za-z_][A-Za-z0-9_$]*)"


# --------------------------------------------------------------- header
def parse_dump_header(text: str) -> dict[str, Any]:
    """Replication coordinates from a dump's head. Returns
    ``{log_file, log_pos, gtid_purged}`` (Nones when absent)."""
    out: dict[str, Any] = {"log_file": None, "log_pos": None, "gtid_purged": None}
    m = re.search(
        r"CHANGE\s+(?:MASTER\s+TO|REPLICATION\s+SOURCE\s+TO)\s+"
        r"(?:MASTER_LOG_FILE|SOURCE_LOG_FILE)\s*=\s*'([^']+)'\s*,\s*"
        r"(?:MASTER_LOG_POS|SOURCE_LOG_POS)\s*=\s*(\d+)",
        text,
        re.I,
    )
    if m:
        out["log_file"] = m.group(1)
        out["log_pos"] = int(m.group(2))
    g = re.search(
        r"SET\s+@@GLOBAL\.GTID_PURGED\s*=\s*(?:/\*!80000 '\+'\*/\s*)?'([^']*)'",
        text,
        re.I,
    )
    if g:
        out["gtid_purged"] = g.group(1)
    return out


# --------------------------------------------------------------- CREATE TABLE
def parse_create_table(sql: str) -> dict[str, Any]:
    """One ``CREATE TABLE`` statement → ``{schema, table, columns, key_cols,
    spark_schema}`` where columns = [(name, mysql_type, spark_type)]. Index /
    constraint entries are skipped; ``PRIMARY KEY (a, b)`` (or, failing that,
    the first ``UNIQUE KEY``) supplies key_cols — the reference's own key
    rule (PK or first unique index, ``ColumnDefinition.java:10-11``)."""
    m = re.match(
        r"\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        + _IDENT
        + r"(?:\s*\.\s*"
        + _IDENT
        + r")?\s*\((.*)\)[^)]*$",
        sql.strip().rstrip(";"),
        re.I | re.S,
    )
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    schema_name = _unquote(m.group(1)) if m.group(2) else None
    table = _unquote(m.group(2) or m.group(1))
    cols: list[tuple[str, str, str]] = []
    pk: list[str] = []
    uniq: list[str] = []
    for entry in _split_top_level(m.group(3)):
        km = re.match(r"PRIMARY\s+KEY\s*\(([^)]*)\)", entry, re.I)
        if km:
            pk = [_unquote(c) for c in _split_top_level(km.group(1))]
            continue
        um = re.match(
            r"UNIQUE\s+(?:KEY|INDEX)?\s*" + _IDENT + r"?\s*\(([^)]*)\)", entry, re.I
        )
        if um:
            if not uniq:
                uniq = [
                    # strip prefix-length suffixes like `col`(20)
                    _unquote(re.sub(r"\(\d+\)\s*$", "", c))
                    for c in _split_top_level(um.group(2))
                ]
            continue
        if re.match(
            r"(KEY|INDEX|CONSTRAINT|FULLTEXT|SPATIAL|FOREIGN|CHECK)\b", entry, re.I
        ):
            continue
        cm = re.match(_IDENT + r"\s+(.*)$", entry, re.S)
        if not cm:
            raise ValueError(f"unparseable column entry: {entry!r}")
        name = _unquote(cm.group(1))
        rest = cm.group(2).strip()
        # the type is the leading word + optional (args) + optional
        # unsigned/zerofill; everything after (NOT NULL, DEFAULT, COMMENT,
        # CHARACTER SET, COLLATE, AUTO_INCREMENT, ...) is column options
        tm = re.match(
            r"([A-Za-z]+(?:\s*\([^)]*\))?(?:\s+unsigned)?(?:\s+zerofill)?)", rest, re.I
        )
        if not tm:
            raise ValueError(f"unparseable type in column entry: {entry!r}")
        mysql_type = tm.group(1).strip()
        cols.append((name, mysql_type, mysql_type_to_spark(mysql_type)))
    key_cols = pk or uniq
    fields = [
        T.StructField(n, _parse_spark_type(st), n not in key_cols)
        for n, _, st in cols
    ]
    return {
        "schema": schema_name,
        "table": table,
        "columns": cols,
        "key_cols": key_cols,
        "spark_schema": T.StructType(fields),
    }


_SIMPLE_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "binary": T.BinaryType(),
    "array<float>": T.ArrayType(T.FloatType()),
}


def _parse_spark_type(s: str) -> T.DataType:
    # no T._parse_datatype_string: that needs a live SparkContext, and the
    # grammar here is driver-side metadata work
    s = s.strip().lower()
    m = re.match(r"decimal\((\d+),\s*(\d+)\)$", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    try:
        return _SIMPLE_TYPES[s]
    except KeyError:
        raise ValueError(f"unsupported Spark type string: {s!r}")


# --------------------------------------------------------------- value lexer
_BACKSLASH = {
    "0": "\0",
    "'": "'",
    '"': '"',
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "Z": "\x1a",
    "\\": "\\",
    "%": "\\%",  # MySQL: \% and \_ keep the backslash outside LIKE
    "_": "\\_",
}


def _lex_tuples(stmt: str) -> list[list[Any]]:
    """Row tuples of one extended ``INSERT ... VALUES (...),(...);``.
    Single pass, no regex over values: handles ``NULL``, signed numbers,
    ``'strings'`` with MySQL backslash escapes and ``''`` doubling,
    ``0x...`` / ``X'...'`` hex (→ bytes), ``_binary '...'`` prefixes, and
    ``b'...'`` bit literals (→ int)."""
    i = stmt.upper().find("VALUES")
    if i < 0:
        raise ValueError("no VALUES clause")
    s = stmt
    n = len(s)
    i += len("VALUES")
    rows: list[list[Any]] = []
    cur: list[Any] | None = None
    while i < n:
        ch = s[i]
        if ch in " \t\r\n,":
            i += 1
            continue
        if ch == ";":
            break
        if ch == "(":
            cur = []
            i += 1
            continue
        if ch == ")":
            if cur is None:
                raise ValueError("unbalanced ')'")
            rows.append(cur)
            cur = None
            i += 1
            continue
        if cur is None:
            raise ValueError(f"value outside tuple at {i}: {s[i:i+20]!r}")
        # --- one value ---
        if ch == "'" or (ch in "_bBxX" and _starts_quoted(s, i)):
            val, i = _lex_string(s, i)
            cur.append(val)
        elif s[i : i + 4].upper() == "NULL":
            cur.append(None)
            i += 4
        elif ch == "0" and i + 1 < n and s[i + 1] in "xX":
            j = i + 2
            while j < n and s[j] in "0123456789abcdefABCDEF":
                j += 1
            cur.append(bytes.fromhex(s[i + 2 : j]))
            i = j
        else:
            j = i
            while j < n and s[j] not in ",)":
                j += 1
            tok = s[i:j].strip()
            if re.fullmatch(r"[+-]?\d+", tok):
                cur.append(int(tok))
            else:
                cur.append(float(tok))  # raises on garbage — fail loud
            i = j
    return rows


def _starts_quoted(s: str, i: int) -> bool:
    """``_binary '...'`` / ``X'...'`` / ``b'...'`` introducer at i?"""
    m = re.match(r"(_[A-Za-z0-9]+\s*'|[xX]'|[bB]')", s[i : i + 16])
    return m is not None


def _lex_string(s: str, i: int) -> tuple[Any, int]:
    mode = "str"
    m = re.match(r"_([A-Za-z0-9]+)\s*'", s[i:])
    if m:
        mode = "bytes" if m.group(1).lower() == "binary" else "str"
        i += m.end() - 1
    elif s[i] in "xX" and s[i + 1] == "'":
        j = s.index("'", i + 2)
        return bytes.fromhex(s[i + 2 : j]), j + 1
    elif s[i] in "bB" and s[i + 1] == "'":
        j = s.index("'", i + 2)
        return int(s[i + 2 : j] or "0", 2), j + 1
    if s[i] != "'":
        raise ValueError(f"expected quote at {i}")
    i += 1
    out: list[str] = []
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append(_BACKSLASH.get(nxt, nxt))
            i += 2
            continue
        if ch == "'":
            if i + 1 < n and s[i + 1] == "'":  # '' doubling
                out.append("'")
                i += 2
                continue
            i += 1
            break
        out.append(ch)
        i += 1
    text = "".join(out)
    if mode == "bytes":
        return text.encode("latin-1"), i
    return text, i


# --------------------------------------------------------------- coercion
def _coerce(values: list[Any], dt: T.DataType) -> pd.Series:
    """Lexed Python values → a pandas Series Arrow can ship as ``dt``."""
    if isinstance(dt, T.DecimalType):
        return pd.Series(
            [None if v is None else decimal.Decimal(str(v)) for v in values],
            dtype=object,
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return pd.Series(pd.to_datetime(values, format="mixed"))
    if isinstance(dt, T.DateType):
        return pd.Series(
            [None if v is None else _dt.date.fromisoformat(str(v)) for v in values],
            dtype=object,
        )
    if isinstance(dt, T.BinaryType):
        return pd.Series(
            [
                None
                if v is None
                else (v if isinstance(v, bytes) else str(v).encode())
                for v in values
            ],
            dtype=object,
        )
    if isinstance(dt, T.BooleanType):
        return pd.Series(
            [None if v is None else bool(v) for v in values], dtype=object
        )
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return pd.Series(
            [None if v is None else int(v) for v in values], dtype=object
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return pd.Series(
            [None if v is None else float(v) for v in values], dtype=object
        )
    return pd.Series(
        [None if v is None else str(v) for v in values], dtype=object
    )


# --------------------------------------------------------------- read side
def scan_dump_head(paths: list[str]) -> dict[str, Any]:
    """Driver-side scan of the archive head: header coordinates + the first
    CREATE TABLE. Stops at the first INSERT — O(head), never O(file)."""
    header_text: list[str] = []
    create: list[str] | None = None
    created: str | None = None
    for p in sorted(paths):
        with open(p, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                if line.upper().startswith("INSERT "):
                    break
                if create is not None:
                    create.append(line)
                    if line.rstrip().endswith(";"):
                        created = "".join(create)
                        create = None
                    continue
                if re.match(r"\s*CREATE\s+TABLE\b", line, re.I):
                    if line.rstrip().endswith(";"):
                        created = line
                    else:
                        create = [line]
                    continue
                header_text.append(line)
            if created is not None:
                break
    if created is None:
        raise ValueError("no CREATE TABLE found in dump head")
    out = parse_dump_header("".join(header_text))
    out.update(parse_create_table(created))
    return out


def read_dump_rows(
    spark: SparkSession,
    dump_path: str,
    table: str,
    spark_schema: T.StructType,
    columns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Distributed parse of the archive's INSERT lines for ``table`` into a
    typed DataFrame. Lines are independent (mysqldump escapes embedded
    newlines), so a single file still parallelizes across block splits."""
    names = [f.name for f in spark_schema.fields]
    dtypes = [f.dataType for f in spark_schema.fields]
    # NB: the \b belongs inside the alternation — after a literal '(' a
    # following backtick has no word boundary, and `(\(|VALUES)\b` silently
    # skipped every INSERT carrying a backtick-quoted column list
    pat = re.compile(
        r"\s*INSERT\s+INTO\s+`?" + re.escape(table) + r"`?\s*(\(|VALUES\b)", re.I
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list[Any]] = []
            for line in pdf["value"]:
                m = pat.match(line)
                if not m:
                    continue
                # Anchor at the match — a re.search over the whole line
                # would false-positive on DATA containing "(...) VALUES"
                # (ValueError on a perfectly valid row) and mis-anchor on
                # a table name containing the word VALUES.
                if m.group(1) == "(":
                    # explicit column list — must match schema order.
                    # (A backtick-quoted identifier CONTAINING ')' would
                    # split early here; mysqldump never emits such names —
                    # refused loudly below rather than mis-lexed.)
                    cm = re.match(
                        r"([^)]*)\)\s*(VALUES)\b", line[m.end() :], re.I
                    )
                    if not cm:
                        raise ValueError(
                            "unparseable INSERT column list near: "
                            f"{line[m.end() : m.end() + 80]!r}"
                        )
                    listed = [
                        _unquote(c) for c in _split_top_level(cm.group(1))
                    ]
                    if listed != names:
                        raise ValueError(
                            f"INSERT column list {listed} != schema {names}"
                        )
                    stmt = "VALUES" + line[m.end() + cm.end() :]
                else:
                    stmt = "VALUES" + line[m.end() :]
                for tup in _lex_tuples(stmt):
                    if len(tup) != len(names):
                        raise ValueError(
                            f"tuple arity {len(tup)} != {len(names)} columns"
                        )
                    rows.append(tup)
            if not rows:
                continue
            cols = list(zip(*rows))
            yield pd.DataFrame(
                {n: _coerce(list(v), dt) for n, v, dt in zip(names, cols, dtypes)}
            )

    lines = spark.read.text(dump_path)
    return lines.mapInPandas(parse, schema=spark_schema)


def restore_dump(
    spark: SparkSession,
    dump_path: str,
    table_root: str,
    *,
    n_buckets: int = 16,
    rotate_every: int = 1_000_000,
    overwrite: bool = False,
):
    """Restore a dump archive into a fresh LakeTable. Every restored row
    merges at ``lsn = the dump's recorded binlog position`` (file no ×
    rotate_every + pos — ``BinlogPosition.as_lsn``'s encoding), so a stream
    started from those coordinates converges by last-image-wins with zero
    overlap coordination. Returns ``(LakeTable, info)`` where ``info`` has
    the header coordinates plus ``start_lsn``."""
    import glob as _glob

    from ..lake.table import LakeTable

    paths = sorted(_glob.glob(os.path.join(dump_path, "*"))) if os.path.isdir(
        dump_path
    ) else [dump_path]
    info = scan_dump_head(paths)
    start_lsn = 0
    if info["log_file"] is not None:
        file_no = int(info["log_file"].rsplit(".", 1)[-1])
        start_lsn = file_no * rotate_every + info["log_pos"]
    info["start_lsn"] = start_lsn

    tbl = LakeTable.create(
        table_root,
        info["spark_schema"],
        info["key_cols"],
        n_buckets=n_buckets,
        overwrite=overwrite,
    )
    rows = read_dump_rows(
        spark, dump_path, info["table"], info["spark_schema"], info["columns"]
    ).withColumns(
        {
            "op": F.lit("I"),
            "source_lsn": F.lit(start_lsn).cast("long"),
        }
    )
    tbl.merge(spark, rows, batch_id=f"dump-restore.{os.path.basename(dump_path)}")
    return tbl, info


# --------------------------------------------------------------- write side
_SPARK_TO_MYSQL = {
    T.ByteType: "tinyint",
    T.ShortType: "smallint",
    T.IntegerType: "int",
    T.LongType: "bigint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "tinyint(1)",
    T.DateType: "date",
    T.TimestampType: "datetime(6)",
    T.TimestampNTZType: "datetime(6)",
    T.BinaryType: "longblob",
    T.StringType: "longtext",
}


def _mysql_type_for(dt: T.DataType, is_key: bool) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType) and is_key:
        return "varchar(255)"  # index-able key column, mysqldump convention
    try:
        return _SPARK_TO_MYSQL[type(dt)]
    except KeyError:
        raise ValueError(f"no MySQL rendering for Spark type {dt}")


def sql_literal(v: Any) -> str:
    """One value → a MySQL literal (the escaping mysqldump itself emits:
    backslash escapes, NO bare newlines — the one-line invariant the read
    side's distribution rests on)."""
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex() if v else "''"
    if isinstance(v, pd.Timestamp):
        if v.nanosecond or v.microsecond:
            return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S") + "'"
    if isinstance(v, _dt.datetime):
        return "'" + v.strftime(
            "%Y-%m-%d %H:%M:%S.%f" if v.microsecond else "%Y-%m-%d %H:%M:%S"
        ) + "'"
    if isinstance(v, _dt.date):
        return f"'{v.isoformat()}'"
    s = str(v)
    s = (
        s.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\0", "\\0")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\x1a", "\\Z")
    )
    return f"'{s}'"


def render_create_table(
    table: str, schema: T.StructType, key_cols: list[str]
) -> str:
    cols = ",\n".join(
        f"  `{f.name}` {_mysql_type_for(f.dataType, f.name in key_cols)}"
        + ("" if f.nullable and f.name not in key_cols else " NOT NULL")
        for f in schema.fields
    )
    pk = ""
    if key_cols:
        pk = ",\n  PRIMARY KEY (" + ", ".join(f"`{c}`" for c in key_cols) + ")"
    return (
        f"CREATE TABLE `{table}` (\n{cols}{pk}\n"
        ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;\n"
    )


def write_dump_sql(
    df: DataFrame,
    out_dir: str,
    table: str,
    key_cols: list[str],
    *,
    n_shards: int = 4,
    rows_per_insert: int = 200,
    log_file: str | None = None,
    log_pos: int | None = None,
    order_cols: list[str] | None = None,
    file_prefix: str = "dump",
    banner: bool = True,
) -> list[dict[str, Any]]:
    """Export ``df`` as a mysqldump-compatible archive: ``dump.00000.sql``
    (header + CREATE TABLE + its shard's INSERTs) … ``dump.NNNNN.sql``.
    Sharding is deterministic (hash of the key columns); each shard is
    rendered and written by ONE task (a text file is sequential), rows
    ordered by ``order_cols`` (default: key) within the shard so re-runs are
    byte-identical. Concatenating the shards in name order is a valid
    single-file dump."""
    os.makedirs(out_dir, exist_ok=True)
    schema = T.StructType([f for f in df.schema.fields])
    names = [f.name for f in schema.fields]
    order = order_cols or key_cols or names[:1]
    head_lines = (
        ["-- mysql_secure_agent_spark logical dump\n"] if banner else []
    )
    if log_file is not None and log_pos is not None:
        head_lines.append(
            "-- CHANGE MASTER TO "
            f"MASTER_LOG_FILE='{log_file}', MASTER_LOG_POS={log_pos};\n"
        )
    head_lines.append("\n" + render_create_table(table, schema, key_cols) + "\n")
    header = "".join(head_lines)

    shard_col = (
        F.pmod(F.hash(*[F.col(c) for c in (key_cols or names[:1])]), F.lit(n_shards))
        if n_shards > 1
        else F.lit(0)
    ).cast("int")

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        no = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(order, kind="mergesort")
        recs = pdf[names].itertuples(index=False, name=None)
        lines: list[str] = []
        buf: list[str] = []
        for tup in recs:
            buf.append("(" + ",".join(sql_literal(v) for v in tup) + ")")
            if len(buf) >= rows_per_insert:
                lines.append(f"INSERT INTO `{table}` VALUES " + ",".join(buf) + ";\n")
                buf = []
        if buf:
            lines.append(f"INSERT INTO `{table}` VALUES " + ",".join(buf) + ";\n")
        path = os.path.join(out_dir, f"{file_prefix}.{no:05d}.sql")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            if no == 0:
                f.write(header)
            f.writelines(lines)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [no], "n_rows": [len(pdf)]})

    manifest = (
        df.withColumn("_shard", shard_col)
        .groupBy("_shard")
        .applyInPandas(write_one, "shard int, n_rows long")
        .collect()
    )
    got = {r["shard"] for r in manifest}
    # an empty shard still needs its file (shard 0 carries the header)
    for no in range(n_shards):
        if no not in got:
            path = os.path.join(out_dir, f"{file_prefix}.{no:05d}.sql")
            with open(path, "w", encoding="utf-8") as f:
                if no == 0:
                    f.write(header)
    return [r.asDict() for r in manifest]


# --------------------------------------------------------- multi-table
def scan_dump_tables(paths: list[str]) -> dict[str, Any]:
    """Whole-archive metadata discovery: header coordinates + EVERY
    ``CREATE TABLE`` (a real mysqldump interleaves per-table blocks —
    CREATE then INSERTs — so the head-only scan sees table 1 only).

    Driver-side single pass with a constant-time skip of INSERT lines
    (which dominate the bytes); the per-table ROW parse stays fully
    distributed via ``read_dump_rows``. Restores are a rare admin
    operation — one sequential metadata pass is the honest cost.
    Returns ``{"header": {...}, "tables": {name: parse_create_table(...)}}``
    in archive order."""
    header_text: list[str] = []
    tables: dict[str, dict[str, Any]] = {}
    create: list[str] | None = None
    seen_insert = False
    for p in sorted(paths):
        with open(p, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                u = line[:12].upper()
                if u.startswith("INSERT "):
                    seen_insert = True
                    continue
                if create is not None:
                    create.append(line)
                    if line.rstrip().endswith(";"):
                        info = parse_create_table("".join(create))
                        tables[info["table"]] = info
                        create = None
                    continue
                if re.match(r"\s*CREATE\s+TABLE\b", line, re.I):
                    if line.rstrip().endswith(";"):
                        info = parse_create_table(line)
                        tables[info["table"]] = info
                    else:
                        create = [line]
                    continue
                if not seen_insert:
                    header_text.append(line)
    if not tables:
        raise ValueError("no CREATE TABLE found in dump")
    return {"header": parse_dump_header("".join(header_text)), "tables": tables}


def restore_dump_all(
    spark: SparkSession,
    dump_path: str,
    root_dir: str,
    *,
    n_buckets: int = 16,
    rotate_every: int = 1_000_000,
    overwrite: bool = False,
) -> dict[str, Any]:
    """Restore EVERY table in the archive, each into
    ``<root_dir>/<table>``, all pinned at the archive's single consistent
    binlog position (mysqldump --single-transaction records one
    coordinate for the whole dump — that is the point of it). Returns
    ``{"start_lsn", "header", "tables": {name: LakeTable}}``."""
    import glob as _glob

    from ..lake.table import LakeTable

    paths = (
        sorted(_glob.glob(os.path.join(dump_path, "*")))
        if os.path.isdir(dump_path)
        else [dump_path]
    )
    meta = scan_dump_tables(paths)
    h = meta["header"]
    start_lsn = 0
    if h["log_file"] is not None:
        start_lsn = (
            int(h["log_file"].rsplit(".", 1)[-1]) * rotate_every + h["log_pos"]
        )
    out: dict[str, Any] = {"start_lsn": start_lsn, "header": h, "tables": {}}
    for name, info in meta["tables"].items():
        tbl = LakeTable.create(
            os.path.join(root_dir, name),
            info["spark_schema"],
            info["key_cols"],
            n_buckets=n_buckets,
            overwrite=overwrite,
        )
        rows = read_dump_rows(
            spark, dump_path, name, info["spark_schema"], info["columns"]
        ).withColumns(
            {"op": F.lit("I"), "source_lsn": F.lit(start_lsn).cast("long")}
        )
        tbl.merge(spark, rows, batch_id=f"dump-restore.{name}")
        out["tables"][name] = tbl
    return out


def write_dump_sql_all(
    tables: dict[str, tuple[DataFrame, list[str]]],
    out_dir: str,
    *,
    n_shards: int = 2,
    rows_per_insert: int = 200,
    log_file: str | None = None,
    log_pos: int | None = None,
) -> dict[str, list[dict[str, Any]]]:
    """Multi-table archive (the inverse of ``restore_dump_all``): each
    table renders as its own block — ``dump.<t>.<table>.<shard>.sql`` —
    with the SINGLE replication coordinate in the first table's head (one
    consistent position for the whole dump, mysqldump
    ``--single-transaction --master-data`` shape). Concatenating every
    file in name order is a valid single-file multi-table dump that
    ``scan_dump_tables``/``restore_dump_all`` round-trips."""
    out: dict[str, list[dict[str, Any]]] = {}
    for i, (name, (df, key_cols)) in enumerate(tables.items()):
        out[name] = write_dump_sql(
            df,
            out_dir,
            name,
            key_cols,
            n_shards=n_shards,
            rows_per_insert=rows_per_insert,
            log_file=log_file if i == 0 else None,
            log_pos=log_pos if i == 0 else None,
            file_prefix=f"dump.{i:02d}.{name}",
            banner=i == 0,
        )
    return out
