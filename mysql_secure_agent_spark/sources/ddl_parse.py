"""Wire-native DDL: parse ``ALTER TABLE`` SQL from binlog QUERY events into
the engine's structured schema actions.

MySQL delivers row changes as ROWS events but schema changes as plain SQL
text inside ``QUERY_EVENT`` (type 0x02) — there is no structured DDL event
on the wire. The reference sidesteps parsing entirely: it re-reads
``information_schema`` on every sync cycle and diffs the result
(``source/TableDefinitions.java``, ``Updater.java:62-86``), which costs a
server round-trip per cycle and can MISS intermediate states (two ALTERs
between cycles collapse into one observed diff). Parsing the QUERY event
gives the exact DDL sequence, at the exact binlog position, with no
server access — which is what the streaming pipeline's ``ddl_hwm``
ordering needs (a DDL applies after every row event below its lsn and
before every one above it).

Scope: the ALTER TABLE column grammar the engine's schema evolution
supports — ADD/DROP/MODIFY/CHANGE COLUMN and RENAME COLUMN, comma-chained,
with MySQL type → Spark SQL type mapping (the same type strings the DDL
sidecar feed uses, ``sources/changelog.py``). Index/constraint/partition
clauses are metadata the lake doesn't model and are skipped; a clause that
WOULD change row decoding but isn't supported (e.g. table RENAME TO) raises
unless ``strict=False``, because silently ignoring it desyncs the column
list against later TABLE_MAPs.

Everything here is driver-side string work on rare events (DDL is O(1) per
schema change, never per row) — no Spark jobs, no UDFs.
"""

from __future__ import annotations

import re

__all__ = [
    "mysql_type_to_spark",
    "parse_alter_table",
    "parse_query_ddl",
]

# MySQL column type → Spark SQL type string (the lake's schema vocabulary).
# UNSIGNED widens: MySQL's unsigned ints overflow the same-width signed
# Spark type, so each maps one width up (BIGINT UNSIGNED has no wider
# integral type — decimal(20,0), the standard CDC convention).
_BASE_TYPES = {
    "tinyint": "tinyint",
    "smallint": "smallint",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "serial": "decimal(20,0)",  # alias: BIGINT UNSIGNED NOT NULL AUTO_INCREMENT
    "float": "float",
    "double": "double",
    "real": "double",
    "bit": "bigint",
    "year": "int",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "time": "string",
    "char": "string",
    "varchar": "string",
    "tinytext": "string",
    "text": "string",
    "mediumtext": "string",
    "longtext": "string",
    "enum": "string",
    "set": "string",
    "json": "string",
    "binary": "binary",
    "varbinary": "binary",
    "tinyblob": "binary",
    "blob": "binary",
    "mediumblob": "binary",
    "longblob": "binary",
    "vector": "array<float>",
}
_UNSIGNED_WIDEN = {
    "tinyint": "smallint",
    "smallint": "int",
    "mediumint": "int",
    "int": "bigint",
    "integer": "bigint",
    "bigint": "decimal(20,0)",
}


def mysql_type_to_spark(mysql_type: str) -> str:
    """``varchar(255)`` → ``string``, ``int unsigned`` → ``bigint``,
    ``decimal(12,3)`` → ``decimal(12,3)``, ``tinyint(1)`` → ``boolean``
    (the MySQL BOOL convention). Raises on types the engine can't decode
    (matching the reference's fail-loud stance on unknown types,
    ``RowParser.java:165-166``)."""
    s = mysql_type.strip().lower()
    unsigned = bool(re.search(r"\bunsigned\b", s))
    s = re.sub(r"\b(unsigned|zerofill)\b", " ", s).strip()
    m = re.match(r"^([a-z]+)\s*(\(([^)]*)\))?", s)
    if not m:
        raise ValueError(f"unparseable MySQL type: {mysql_type!r}")
    base, args = m.group(1), m.group(3)
    if base in ("decimal", "numeric", "dec", "fixed"):
        if args:
            parts = [p.strip() for p in args.split(",")]
            p = int(parts[0])
            sc = int(parts[1]) if len(parts) > 1 else 0
        else:
            p, sc = 10, 0
        return f"decimal({p},{sc})"
    if base == "tinyint" and args and args.strip() == "1" and not unsigned:
        return "boolean"
    if base not in _BASE_TYPES:
        raise ValueError(f"unsupported MySQL type: {mysql_type!r}")
    if unsigned:
        return _UNSIGNED_WIDEN.get(base, _BASE_TYPES[base])
    return _BASE_TYPES[base]


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
    sql = re.sub(r"(^|\s)--[^\n]*", " ", sql)
    sql = re.sub(r"(^|\s)#[^\n]*", " ", sql)
    return sql


def _unquote(ident: str) -> str:
    ident = ident.strip()
    if len(ident) >= 2 and ident[0] == "`" and ident[-1] == "`":
        return ident[1:-1].replace("``", "`")
    return ident


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parens / backticks / string quotes."""
    parts, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "`'\"":
            quote = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


_IDENT = r"(`(?:[^`]|``)+`|[A-Za-z_][A-Za-z0-9_$]*)"


def _position(clause: str) -> tuple[str, str | None] | None:
    """Trailing FIRST / AFTER col placement (changes TABLE_MAP column order,
    so the wire-feed column tracker must honor it)."""
    m = re.search(r"\bafter\s+" + _IDENT + r"\s*$", clause, re.I)
    if m:
        return ("after", _unquote(m.group(1)))
    if re.search(r"\bfirst\s*$", clause, re.I):
        return ("first", None)
    return None


# a column type: word, optional (args), optional unsigned/zerofill, optional
# charset/collate noise — captured lazily up to the option keywords
_TYPE = (
    r"([A-Za-z]+(?:\s*\([^)]*\))?"
    r"(?:\s+unsigned)?(?:\s+zerofill)?)"
)
# column options we ignore (NOT NULL, DEFAULT ..., AUTO_INCREMENT, COMMENT,
# COLLATE, CHARACTER SET, FIRST, AFTER col, ...) — everything after the type.
_SKIP_CLAUSE = re.compile(
    r"^\s*(add\s+(unique\s+|fulltext\s+|spatial\s+)?(index|key)\b"
    r"|add\s+(constraint\b|primary\s+key\b|foreign\s+key\b|unique\b|check\b)"
    r"|drop\s+(index|key|primary\s+key|foreign\s+key|constraint|check)\b"
    r"|alter\s+(column\s+)?" + _IDENT + r"\s+(set|drop)\b"  # default changes
    r"|(algorithm|lock)\s*=?"
    r"|(enable|disable)\s+keys\b"
    r"|(engine|auto_increment|comment|row_format|charset|collate)\s*=?"
    r"|default\s+(character\s+set|charset|collate)\b"
    r"|convert\s+to\s+character\s+set\b"
    r"|(force|order\s+by)\b"
    r")",
    re.I,
)


def parse_alter_table(sql: str, strict: bool = True) -> tuple[tuple[str | None, str], list[dict]]:
    """Parse one ``ALTER TABLE`` statement. Returns
    ``((schema_or_None, table), actions)`` where each action is the engine's
    structured DDL dict: ``{"action": ADD_COLUMN|DROP_COLUMN|MODIFY_COLUMN|
    RENAME_COLUMN, "column_name": ..., "column_type": <spark type>|None,
    "new_name": ...|None}`` — the exact rows the DDL sidecar feed carries
    (``sources/changelog.py``), so the output plugs straight into
    ``CdcPipeline._apply_ddl``.

    ``CHANGE old new type`` emits RENAME (when renamed) then MODIFY (the
    lake's ``modify_column_type`` no-ops on an unchanged type, so a pure
    rename costs no rewrite). Index/constraint/table-option clauses are
    skipped. ``strict=True`` raises on clauses that change row layout in
    ways the lake doesn't model (RENAME TO, PARTITION ops); ``strict=False``
    records them as ``{"action": "UNSUPPORTED", "clause": ...}``.
    """
    s = _strip_comments(sql).strip().rstrip(";").strip()
    m = re.match(
        r"^alter\s+(?:ignore\s+)?table\s+(?:" + _IDENT + r"\s*\.\s*)?"
        + _IDENT + r"\s+(.*)$",
        s,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {sql[:80]!r}")
    schema = _unquote(m.group(1)) if m.group(1) else None
    table = _unquote(m.group(2))
    rest = m.group(3)

    actions: list[dict] = []
    for clause in _split_top_level(rest):
        c = clause.strip()
        cl = c.lower()
        if _SKIP_CLAUSE.match(c):
            continue
        m = re.match(r"^add\s+(column\s+)?" + _IDENT + r"\s+" + _TYPE, c, re.I)
        if m and not re.match(r"^add\s+(column\s+)?\(", c, re.I):
            act = {
                "action": "ADD_COLUMN",
                "column_name": _unquote(m.group(2)),
                "column_type": mysql_type_to_spark(m.group(3)),
                "new_name": None,
            }
            pos = _position(c)
            if pos:
                act["position"] = pos
            actions.append(act)
            continue
        m = re.match(r"^add\s+(column\s+)?\((.*)\)\s*$", c, re.I | re.S)
        if m:  # ADD COLUMN (a int, b text) — parenthesized multi-add
            for sub in _split_top_level(m.group(2)):
                sm = re.match(r"^" + _IDENT + r"\s+" + _TYPE, sub, re.I)
                if not sm:
                    raise ValueError(f"unparseable column def: {sub!r}")
                actions.append(
                    {
                        "action": "ADD_COLUMN",
                        "column_name": _unquote(sm.group(1)),
                        "column_type": mysql_type_to_spark(sm.group(2)),
                        "new_name": None,
                    }
                )
            continue
        m = re.match(r"^drop\s+(column\s+)?" + _IDENT + r"\s*$", c, re.I)
        if m:
            actions.append(
                {
                    "action": "DROP_COLUMN",
                    "column_name": _unquote(m.group(2)),
                    "column_type": None,
                    "new_name": None,
                }
            )
            continue
        m = re.match(r"^modify\s+(column\s+)?" + _IDENT + r"\s+" + _TYPE, c, re.I)
        if m:
            act = {
                "action": "MODIFY_COLUMN",
                "column_name": _unquote(m.group(2)),
                "column_type": mysql_type_to_spark(m.group(3)),
                "new_name": None,
            }
            pos = _position(c)
            if pos:
                act["position"] = pos
            actions.append(act)
            continue
        m = re.match(
            r"^change\s+(column\s+)?" + _IDENT + r"\s+" + _IDENT + r"\s+" + _TYPE,
            c,
            re.I,
        )
        if m:
            old, new = _unquote(m.group(2)), _unquote(m.group(3))
            if old != new:
                actions.append(
                    {
                        "action": "RENAME_COLUMN",
                        "column_name": old,
                        "column_type": None,
                        "new_name": new,
                    }
                )
            actions.append(
                {
                    "action": "MODIFY_COLUMN",
                    "column_name": new,
                    "column_type": mysql_type_to_spark(m.group(4)),
                    "new_name": None,
                }
            )
            continue
        m = re.match(r"^rename\s+column\s+" + _IDENT + r"\s+to\s+" + _IDENT, c, re.I)
        if m:
            actions.append(
                {
                    "action": "RENAME_COLUMN",
                    "column_name": _unquote(m.group(1)),
                    "column_type": None,
                    "new_name": _unquote(m.group(2)),
                }
            )
            continue
        if strict:
            raise ValueError(f"unsupported ALTER TABLE clause: {clause!r}")
        actions.append({"action": "UNSUPPORTED", "clause": clause})
    return (schema, table), actions


_DDL_HEAD = re.compile(r"^\s*alter\s+(ignore\s+)?table\b", re.I)
_TXN_MARKER = re.compile(r"^\s*(begin|commit|rollback|start\s+transaction)\b", re.I)
# TRUNCATE [TABLE] [schema.]name — logged as bare QUERY DDL with NO row
# events (MySQL implements it as drop+recreate, bypassing row logging), so
# a row-image-only consumer silently keeps every pre-truncate row
_TRUNCATE_HEAD = re.compile(
    r"^\s*truncate\s+(?:table\s+)?(?:" + _IDENT + r"\s*\.\s*)?" + _IDENT
    + r"\s*$",
    re.I,
)


def parse_query_ddl(
    default_schema: str,
    sql: str,
    schema_name: str,
    table_name: str,
    strict: bool = True,
) -> list[dict]:
    """Classify one QUERY event's SQL against a (schema, table) filter.
    Returns the structured actions when it is an ALTER TABLE for that table
    (the statement's qualifier wins; an unqualified name resolves against
    the event's default schema — the ``USE``-database MySQL stamps into the
    QUERY event header). BEGIN/COMMIT markers and DDL for other tables
    return []."""
    if _TXN_MARKER.match(sql):
        return []
    tm = _TRUNCATE_HEAD.match(_strip_comments(sql).strip().rstrip(";").strip())
    if tm:
        schema = _unquote(tm.group(1)) if tm.group(1) else default_schema
        if (schema, _unquote(tm.group(2))) != (schema_name, table_name):
            return []
        return [{
            "action": "TRUNCATE",
            "column_name": None,
            "column_type": None,
            "new_name": None,
        }]
    if not _DDL_HEAD.match(sql):
        return []
    (schema, table), actions = parse_alter_table(sql, strict=strict)
    schema = schema if schema is not None else default_schema
    if (schema, table) != (schema_name, table_name):
        return []
    return actions
