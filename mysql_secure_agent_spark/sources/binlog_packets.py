"""MySQL binlog packet parsing — SURVEY §2.1 S7/S8/S11, wire-faithful.

Implements the reference's event decode layer over raw binlog packets:

  * 19-byte event header (``parser/EventHeaderParser.java:17-35``):
    ts:u32le, type:u8, server_id:u32, event_len:u32, next_pos:u32, flags:u16.
  * Wire primitives (``source/binlog/BinlogInputStream.java:46-169``):
    little-endian ints, MySQL packed (length-encoded) integers
    (0-250 inline / 0xFC+2B / 0xFD+3B / 0xFE+8B / 0xFB NULL), null-aware
    bitsets (bit i of byte i>>3, no byte reversal for bigEndian=true),
    zero-terminated strings.
  * TABLE_MAP body (``parser/EventBodyParser.java:parseTableMapEvent``):
    table_id:6B(+2 skip), schema/table z-strings, packed column count,
    column type bytes, per-type metadata block, nullability bitset.
  * EXT_WRITE/DELETE/UPDATE_ROWS bodies (``EventBodyParser.java:
    parseWriteDeleteEvent/parseUpdateEvent``): table_id, extra-info skip,
    packed column count, included-columns bitmap(s), then row images —
    each a null bitmap over the included columns plus per-column values
    decoded by type+metadata (``parser/shyiko/RowParser.java:46-93``),
    including the STRING high-byte ENUM/SET/CHAR disambiguation
    (``RowParser.java:71-105``).
  * ROTATE body (position u64 + next file name) and XID (clears the
    table-map cache — MySQL has no nested transactions,
    ``EventBodyParser.java:34-36``).

Values decode to native Python objects (ints/floats/Decimal/str/bytes/
date/datetime); JSON columns go through the binary-JSON grammar
(functions/json_binary.py). This parser is per-event (like the reference's)
— the engine's BULK path is the columnar payload decode
(functions/decode.py / mysql_codecs.py); this layer exists for wire parity
with genuinely captured binlog bytes (golden tests use the reference's own
captured packets, ``BinlogParserSpec.java``).
"""

from __future__ import annotations

import datetime as dt
import re
import struct
from dataclasses import dataclass, field
from decimal import Decimal

from ..functions.json_binary import parse_json_binary
from ..functions.mysql_codecs import DIG_PER_DEC, DIG_TO_BYTES, decimal_bin_size

# MySQL event type codes (subset the reference routes on,
# EventType enum / BinlogClient.java:191-195)
# QUERY_EVENT carries statement text: BEGIN/COMMIT markers under RBR, and —
# crucially — every DDL statement (there is no structured DDL event on the
# wire; ALTER TABLE arrives as SQL). The reference discards the type and
# instead re-diffs information_schema per sync cycle (TableDefinitions.java,
# Updater.java:62-86); we parse it so schema evolution is positioned exactly
# in the stream (sources/ddl_parse.py).
QUERY_EVENT = 0x02
ROTATE_EVENT = 0x04
FORMAT_DESCRIPTION_EVENT = 0x0F
XID_EVENT = 0x10
TABLE_MAP_EVENT = 0x13
HEARTBEAT_EVENT = 0x1B
EXT_WRITE_ROWS = 0x1E
EXT_UPDATE_ROWS = 0x1F
EXT_DELETE_ROWS = 0x20
# GTID family (MySQL 5.6+ replication positioning; layouts per the public
# MySQL source, libbinlogevents control_events — Gtid_event /
# Previous_gtids_event). The reference positions by (file, pos) only and
# routes these types to the discard branch (BinlogClient.java:191-195); we
# decode them because the multi-source watermark (state.GtidSet) is the
# engine's native resume coordinate.
GTID_EVENT = 0x21
ANONYMOUS_GTID_EVENT = 0x22
PREVIOUS_GTIDS_EVENT = 0x23
# binlog_rows_query_log_events=ON (MySQL 5.6.2+): the original SQL text of
# the statement that produced the following rows events — pure lineage
# metadata, never needed for decode. The reference discards it
# (BinlogClient.java:191-195 keeps only EXT_*_ROWS).
ROWS_QUERY_EVENT = 0x1D
# binlog_row_value_options=PARTIAL_JSON (MySQL 8.0, WL#2955): UPDATEs that
# touch part of a JSON document log a diff vector instead of the full
# document. The reference predates the type (discard branch,
# BinlogClient.java:191-195); we decode AND apply the diffs
# (functions/json_patch.py).
PARTIAL_UPDATE_ROWS_EVENT = 0x27
# binlog_transaction_compression=ON (MySQL 8.0.20, WL#3549): one container
# event wrapping a whole transaction's events, zstd-compressed. Inner
# events carry NO per-event checksum — the container carries the stream's.
TRANSACTION_PAYLOAD_EVENT = 0x28
# Written when mysqld stops cleanly (reference enumerates it,
# EventType.java:46; empty body — the next event continues in a new file,
# which ROTATE/index handling already covers).
STOP_EVENT = 0x03
# "Out of the ordinary event ... might cause data to be in an inconsistent
# state" (EventType.java:155-159) — e.g. LOST_EVENTS after a master crash
# with sync_binlog!=1. The ONLY safe CDC reaction is to stop applying and
# resnapshot; the reference routes it to the discard branch
# (BinlogClient.java:191-195) and would silently apply post-gap events.
INCIDENT_EVENT = 0x1A
# Terminal event of a PREPARED XA transaction (XA ... PREPARE) — "similar
# to XID except that it is specific to XA transaction"
# (EventType.java:195-199). The row events of an XA transaction are
# flushed to the binlog at PREPARE time; the decision (XA COMMIT /
# XA ROLLBACK) arrives LATER as a top-level QUERY event, possibly after
# unrelated transactions. A CDC consumer that applies at prepare time
# replicates data a subsequent XA ROLLBACK never committed.
XA_PREPARE_EVENT = 0x26

# transaction-payload compression algorithm codes
# (libbinlogevents include/compression/base.h)
PAYLOAD_COMPRESSION_ZSTD = 0x00
PAYLOAD_COMPRESSION_NONE = 0xFF

# binlog_checksum algorithm codes (carried by FORMAT_DESCRIPTION since
# MySQL 5.6.1; the reference instead queries the server variable,
# BinlogClient.java:196-208 — both roads lead to the same 0/4-byte tail)
CHECKSUM_NONE = 0x00
CHECKSUM_CRC32 = 0x01


@dataclass
class EventHeader:
    timestamp: int
    type_code: int
    server_id: int
    event_length: int
    next_position: int
    flags: int
    header_length: int = 19


@dataclass
class TableMap:
    table_id: int
    schema_name: str
    table_name: str
    column_types: bytes
    column_metadata: list[int]
    # MySQL 8 optional metadata (binlog_row_metadata, WL#4618; public layout
    # in libbinlogevents rows_event.cpp Table_map_event). All None when the
    # server shipped none (binlog_row_metadata=MINIMAL pre-8.0 default
    # behavior for most fields). The reference never reads these — it
    # re-polls information_schema instead (Updater.java:188-217); decoding
    # them makes the engine self-configuring from the wire alone.
    signedness: list[bool] | None = None  # per COLUMN, True = signed
    column_names: list[str] | None = None
    charsets: list[int | None] | None = None  # per column; None = non-char
    enum_str_values: dict[int, list[str]] | None = None  # col idx → labels
    set_str_values: dict[int, list[str]] | None = None
    geometry_types: dict[int, int] | None = None
    primary_key: list[int] | None = None  # simple PK column indices
    visibility: list[bool] | None = None  # 8.0.23 invisible columns


@dataclass
class RowsEvent:
    table_id: int
    schema_name: str
    table_name: str
    kind: str  # insert | update | delete
    included_columns: list[int]
    new_rows: list[list] = field(default_factory=list)
    old_rows: list[list] = field(default_factory=list)
    # UPDATE carries a SEPARATE included-columns bitmap for the before-image
    # (binlog_row_image=MINIMAL sends only the PK there); None for I/D and
    # for FULL-image streams where both bitmaps coincide.
    included_columns_old: list[int] | None = None


@dataclass
class Rotate:
    position: int
    filename: str


@dataclass
class Gtid:
    """GTID_LOG_EVENT / ANONYMOUS_GTID_LOG_EVENT body: the transaction's
    global id (sid = server UUID, gno = per-server sequence) plus the 5.7+
    logical-clock pair the multi-threaded applier schedules by."""

    sid: str  # canonical 8-4-4-4-12 lowercase UUID
    gno: int
    flags: int  # bit 0 = rbr_only / commit-flag byte
    last_committed: int | None = None
    sequence_number: int | None = None


@dataclass
class PreviousGtids:
    """PREVIOUS_GTIDS_LOG_EVENT body: the gtid_executed set at log open —
    what a resuming replica subtracts to know where this file starts.
    ``intervals`` maps sid -> [(start, end)] INCLUSIVE (the wire carries
    end-exclusive; the decode normalizes to MySQL's printed form)."""

    intervals: dict[str, list[tuple[int, int]]]

    def to_string(self) -> str:
        parts = []
        for sid in sorted(self.intervals):
            spans = ":".join(
                str(a) if a == b else f"{a}-{b}"
                for a, b in self.intervals[sid]
            )
            parts.append(f"{sid}:{spans}")
        return ",".join(parts)


@dataclass
class RowsQuery:
    """ROWS_QUERY_LOG_EVENT body: the SQL statement behind the rows events
    that follow — lineage only (MySQL truncates it server-side to
    binlog-row-event-max-size; the 1-byte length prefix is therefore
    unreliable and the text fills the whole body)."""

    query: str


@dataclass
class Query:
    """QUERY_EVENT body (binlog v4 layout, libbinlogevents
    statement_events — Query_event): thread id, exec time, error code, a
    status-var block (skipped by its declared length), the default schema
    the session had ``USE``d, and the statement text. Under row-based
    replication this is BEGIN/COMMIT markers plus ALL DDL."""

    thread_id: int
    exec_time: int
    error_code: int
    schema_name: str
    sql: str


@dataclass
class TransactionPayload:
    """TRANSACTION_PAYLOAD_EVENT body, decoded: the wrapped transaction as
    concatenated inner events. ``events`` holds (header, body) pairs ready
    for :func:`parse_event_body` with ``checksum_length=0`` — inner events
    are never individually checksummed (the container event carries the
    stream CRC)."""

    compression_type: int
    uncompressed_size: int
    payload: bytes
    events: list[tuple[EventHeader, bytes]]


@dataclass
class Heartbeat:
    """HEARTBEAT_LOG_EVENT: keep-alive carrying the current log name —
    the wire form of the reference's TIMEOUT → NOP liveness signal
    (EventReader.java:8-14)."""

    log_name: str


@dataclass
class XaPrepare:
    """XA_PREPARE_LOG_EVENT body (layout per the public MySQL source,
    libbinlogevents control_events XA_prepare_event: 1-byte one_phase flag,
    4-byte formatID, 4-byte gtrid_length, 4-byte bqual_length, then
    gtrid+bqual data). ``one_phase`` means XA COMMIT ... ONE PHASE — the
    transaction is committed AT this event, no later terminal arrives."""

    one_phase: bool
    format_id: int
    gtrid: bytes
    bqual: bytes

    def xid_key(self) -> tuple[int, bytes, bytes]:
        return (self.format_id, self.gtrid, self.bqual)


@dataclass
class Incident:
    """INCIDENT_EVENT body (1 = LOST_EVENTS): the master declares a gap —
    downstream state MAY be inconsistent from here (EventType.java:155-159).
    Body layout per libbinlogevents Incident_event: 2-byte incident number,
    1-byte message length, message bytes."""

    incident_type: int
    message: str


@dataclass
class Stop:
    """STOP_EVENT: clean mysqld shutdown (EventType.java:43-46); empty body."""


class BinlogReader:
    """Python BinlogInputStream (BinlogInputStream.java:46-169)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def available(self) -> int:
        return len(self.buf) - self.pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def skip(self, n: int) -> None:
        self.pos += n

    def u_le(self, n: int) -> int:
        return int.from_bytes(self.read(n), "little")

    def u_be(self, n: int) -> int:
        return int.from_bytes(self.read(n), "big")

    def packed_int(self) -> int | None:
        b = self.read(1)[0]
        if b < 0xFB:
            return b
        if b == 0xFB:
            return None  # SQL NULL
        if b == 0xFC:
            return self.u_le(2)
        if b == 0xFD:
            return self.u_le(3)
        if b == 0xFE:
            return self.u_le(8)
        raise ValueError(f"unexpected packed-integer lead byte {b:#x}")

    def bitset(self, n_bits: int) -> list[int]:
        """Indices of set bits; bit i lives in byte i>>3 at 1<<(i%8)
        (readBitSet bigEndian=true — no byte reversal)."""
        raw = self.read((n_bits + 7) >> 3)
        return [i for i in range(n_bits) if raw[i >> 3] & (1 << (i % 8))]

    def z_string(self) -> str:
        end = self.buf.index(0, self.pos)
        s = self.buf[self.pos : end].decode("utf-8", errors="replace")
        self.pos = end + 1
        return s


def parse_event_header(buf: bytes) -> EventHeader:
    if len(buf) != 19:
        raise ValueError("improper event header length")
    ts, typ, sid, elen, nxt, flags = struct.unpack("<IBIIIH", buf)
    return EventHeader(ts, typ, sid, elen, nxt, flags)


# ------------------------------------------------------------------ TABLE_MAP
def _table_id(r: BinlogReader) -> int:
    tid = r.u_le(6)
    r.skip(2)  # reserved
    return tid


def _real_type(t: int, meta: int) -> int:
    """STRING (0xFE) metadata smuggles the real ENUM/SET/CHAR type in its
    high byte (same disambiguation as ``_parse_row``)."""
    if t == 0xFE and meta >= 256:
        high = meta >> 8
        if (high & 0x30) != 0x30:
            return high | 0x30
        if high in (0xF7, 0xF8):
            return high
    return t


# numeric / character type sets per libbinlogevents is_numeric_type /
# is_character_type — they define which columns the SIGNEDNESS bitmap and
# the charset fields enumerate (positional, not per-column-index)
_NUMERIC_TYPES = frozenset({0x01, 0x02, 0x03, 0x04, 0x05, 0x08, 0x09, 0xF6})
_CHAR_TYPES = frozenset({0x0F, 0xFC, 0xFD, 0xFE})


def parse_table_map(buf: bytes) -> TableMap:
    r = BinlogReader(buf)
    tid = _table_id(r)
    r.skip(1)  # schema name length (z-string is authoritative)
    schema = r.z_string()
    r.skip(1)  # table name length
    table = r.z_string()
    n_cols = r.packed_int()
    types = r.read(n_cols)
    r.packed_int()  # metadata block length (skipped, per reference)
    meta = []
    for t in types:
        if t in (0x04, 0x05, 0xF5, 0xFC, 0xF2):  # FLOAT/DOUBLE/JSON/BLOB/VECTOR
            # VECTOR (MySQL 9.0, MYSQL_TYPE_VECTOR=242) stores like a BLOB:
            # the metadata byte is the width of the length prefix (4)
            meta.append(r.u_le(1))
        elif t in (0x10, 0x0F, 0xF6):  # BIT, VARCHAR, NEWDECIMAL
            meta.append(r.u_le(2))
        elif t in (0xF8, 0xF7, 0xFE):  # SET, ENUM, STRING — big-endian!
            meta.append(r.u_be(2))
        elif t in (0x11, 0x12, 0x13):  # TIMESTAMP_V2, DATETIME_V2, TIME_V2
            meta.append(r.u_le(1))
        else:
            meta.append(0)
    r.bitset(n_cols)  # nullability (unused, as in the reference)
    tm = TableMap(tid, schema, table, types, meta)
    _parse_optional_metadata(r, tm)
    return tm


def _parse_optional_metadata(r: BinlogReader, tm: TableMap) -> None:
    """TLV fields after the null bitmap (binlog_row_metadata, WL#4618):
    {type:1B, length:packed_int, value}. Positional bitmaps/lists enumerate
    only the relevant column class (numeric for SIGNEDNESS, character for
    charsets, ENUM/SET for label lists) and are expanded here to per-column
    form. Bit order is MSB-first — the OPPOSITE of row null bitmaps. Unknown
    field types are skipped by length (forward compatibility)."""
    n_cols = len(tm.column_types)
    real = [_real_type(tm.column_types[i], tm.column_metadata[i]) for i in range(n_cols)]
    numeric = [i for i in range(n_cols) if real[i] in _NUMERIC_TYPES]
    charcols = [i for i in range(n_cols) if real[i] in _CHAR_TYPES]
    enum_cols = [i for i in range(n_cols) if real[i] == 0xF7]
    set_cols = [i for i in range(n_cols) if real[i] == 0xF8]
    geom_cols = [i for i in range(n_cols) if real[i] == 0xFF]

    def _msb_bits(raw: bytes, n: int) -> list[bool]:
        return [bool(raw[i >> 3] & (0x80 >> (i % 8))) for i in range(n)]

    while r.available() > 0:
        ftype = r.u_le(1)
        flen = r.packed_int()
        fr = BinlogReader(r.read(flen))
        if ftype == 1:  # SIGNEDNESS: one bit per NUMERIC column, set=unsigned
            bits = _msb_bits(fr.buf, len(numeric))
            sg = [True] * n_cols
            for k, col in enumerate(numeric):
                sg[col] = not bits[k]
            tm.signedness = sg
        elif ftype == 2:  # DEFAULT_CHARSET: default id + (col, id) overrides
            default_cs = fr.packed_int()
            cs: list[int | None] = [None] * n_cols
            for c in charcols:
                cs[c] = default_cs
            while fr.available() > 0:
                ci = fr.packed_int()  # column index FIRST, then charset id
                cs[ci] = fr.packed_int()
            tm.charsets = cs
        elif ftype == 3:  # COLUMN_CHARSET: one id per character column
            cs = [None] * n_cols
            for c in charcols:
                cs[c] = fr.packed_int()
            tm.charsets = cs
        elif ftype == 4:  # COLUMN_NAME: {len, utf8} per column
            names = []
            while fr.available() > 0:
                names.append(fr.read(fr.packed_int()).decode("utf-8"))
            tm.column_names = names
        elif ftype in (5, 6):  # SET_STR_VALUE / ENUM_STR_VALUE
            cols = set_cols if ftype == 5 else enum_cols
            vals: dict[int, list[str]] = {}
            for c in cols:
                if fr.available() == 0:
                    break
                cnt = fr.packed_int()
                vals[c] = [
                    fr.read(fr.packed_int()).decode("utf-8") for _ in range(cnt)
                ]
            if ftype == 5:
                tm.set_str_values = vals
            else:
                tm.enum_str_values = vals
        elif ftype == 7:  # GEOMETRY_TYPE: packed_int per geometry column
            g: dict[int, int] = {}
            for c in geom_cols:
                if fr.available() == 0:
                    break
                g[c] = fr.packed_int()
            tm.geometry_types = g
        elif ftype == 8:  # SIMPLE_PRIMARY_KEY: column indices
            pk = []
            while fr.available() > 0:
                pk.append(fr.packed_int())
            tm.primary_key = pk
        elif ftype == 12:  # COLUMN_VISIBILITY: one bit per column, set=visible
            tm.visibility = _msb_bits(fr.buf, n_cols)
        # 9/10/11 (PK-with-prefix, enum/set charsets) and future types:
        # skipped by length


# ----------------------------------------------------------------- charsets
# MySQL collation id → character set name, from the public SHOW COLLATION
# table (8.0 docs / information_schema.collations). Only ids a binlog can
# actually carry in TABLE_MAP optional metadata (DEFAULT_CHARSET /
# COLUMN_CHARSET, WL#4618); unknown ids fall back to utf-8-with-replacement
# — the pre-metadata behavior. The reference decodes with the column
# charset via Java's String(bytes, charset); without this map a latin1
# 0xE9 ('é') becomes U+FFFD and a VARBINARY column is silently mangled
# through a lossy utf-8 pass.
_COLLATION_CHARSET: dict[int, str] = {
    1: "big5", 2: "latin2", 4: "cp850", 5: "latin1", 7: "koi8r", 8: "latin1",
    9: "latin2", 11: "ascii", 12: "ujis", 13: "sjis", 14: "cp1251",
    15: "latin1", 16: "hebrew", 18: "tis620", 19: "euckr", 20: "latin7",
    21: "latin2", 22: "koi8u", 23: "cp1251", 24: "gb2312", 25: "greek",
    26: "cp1250", 27: "latin2", 28: "gbk", 29: "cp1257", 30: "latin5",
    31: "latin1", 33: "utf8mb3", 34: "cp1250", 35: "ucs2", 36: "cp866",
    38: "macce", 39: "macroman", 40: "cp852", 41: "latin7", 42: "latin7",
    43: "macce", 44: "cp1250", 45: "utf8mb4", 46: "utf8mb4", 47: "latin1",
    48: "latin1", 49: "latin1", 50: "cp1251", 51: "cp1251", 52: "cp1251",
    53: "macroman", 54: "utf16", 55: "utf16", 56: "utf16le", 57: "cp1256",
    58: "cp1257", 59: "cp1257", 60: "utf32", 61: "utf32", 62: "utf16le",
    63: "binary", 65: "ascii", 66: "cp1250", 67: "cp1256", 68: "cp866",
    70: "greek", 71: "hebrew", 74: "koi8r", 75: "koi8u", 77: "latin2",
    78: "latin5", 79: "latin7", 80: "cp850", 81: "cp852", 83: "utf8mb3",
    84: "big5", 85: "euckr", 86: "gb2312", 87: "gbk", 88: "sjis",
    89: "tis620", 90: "ucs2", 91: "ujis", 94: "latin1", 95: "cp932",
    96: "cp932", 97: "eucjpms", 98: "eucjpms", 99: "cp1250",
    **{i: "utf16" for i in range(101, 125)},
    **{i: "ucs2" for i in range(128, 152)},
    **{i: "utf32" for i in range(160, 184)},
    **{i: "utf8mb3" for i in range(192, 224)},
    **{i: "utf8mb4" for i in range(224, 248)},
    248: "gb18030", 249: "gb18030", 250: "gb18030",
    # 8.0.30+/9.x uca1400 collations are all utf8mb4
    **{i: "utf8mb4" for i in range(255, 324)},
}

# MySQL charset name → Python codec. MySQL's 'latin1' is cp1252 West
# European with the five cp1252 holes (0x81 0x8D 0x8F 0x90 0x9D) kept as
# C1 controls — decode ISO-8859-1 (total) then remap the 27 cp1252
# printable points, so every byte decodes and round-trips MySQL's table.
_CHARSET_PY: dict[str, str] = {
    "ascii": "ascii", "big5": "big5", "cp1250": "cp1250", "cp1251": "cp1251",
    "cp1256": "cp1256", "cp1257": "cp1257", "cp850": "cp850",
    "cp852": "cp852", "cp866": "cp866", "cp932": "cp932",
    "euckr": "euc_kr", "eucjpms": "euc_jp", "gb18030": "gb18030",
    "gb2312": "gb2312", "gbk": "gbk", "greek": "iso8859-7",
    "hebrew": "iso8859-8", "koi8r": "koi8-r", "koi8u": "koi8-u",
    "latin2": "iso8859-2", "latin5": "iso8859-9", "latin7": "iso8859-13",
    "macce": "mac_latin2", "macroman": "mac_roman", "sjis": "shift_jis",
    "tis620": "tis-620", "ucs2": "utf-16-be", "ujis": "euc_jp",
    "utf16": "utf-16-be", "utf16le": "utf-16-le", "utf32": "utf-32-be",
    "utf8mb3": "utf-8", "utf8mb4": "utf-8",
}

_LATIN1_C1 = {
    i: ord(bytes([i]).decode("cp1252"))
    for i in range(0x80, 0xA0)
    if i not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
}


def decode_mysql_string(raw: bytes, charset_id: int | None):
    """Column-charset-aware string decode. ``charset_id`` comes from
    TABLE_MAP optional metadata (None when the server logs
    binlog_row_metadata=MINIMAL — then utf-8-with-replacement, the only
    safe guess and this module's historical behavior). The ``binary``
    pseudo-charset (63 — BINARY/VARBINARY/BLOB columns) returns the raw
    bytes: a lossy text pass over binary data is silent corruption."""
    if charset_id is None:
        return raw.decode("utf-8", errors="replace")
    cs = _COLLATION_CHARSET.get(charset_id)
    if cs == "binary":
        return bytes(raw)
    if cs == "latin1":
        return raw.decode("latin-1").translate(_LATIN1_C1)
    py = _CHARSET_PY.get(cs) if cs else None
    if py is None:  # charset with no python codec (dec8/swe7/armscii8/...)
        return raw.decode("utf-8", errors="replace")
    return raw.decode(py, errors="replace")


# ------------------------------------------------------------- value decoders
def _sx(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def _render_hms(neg: bool, h: int, m: int, s: int, us: int, frac: bool) -> str:
    txt = f"{h:02d}:{m:02d}:{s:02d}" + (f".{us:06d}" if frac else "")
    return "-" + txt if neg else txt


def _fsp(r: BinlogReader, meta: int) -> int:
    n = (meta + 1) // 2
    if n == 0:
        return 0
    return r.u_be(n) * 100 ** (3 - n)


def _decimal(r: BinlogReader, meta: int) -> Decimal:
    precision, scale = meta & 0xFF, meta >> 8
    raw = bytearray(r.read(decimal_bin_size(precision, scale)))
    positive = (raw[0] & 0x80) == 0x80
    raw[0] ^= 0x80
    if not positive:
        for i in range(len(raw)):
            raw[i] ^= 0xFF
    x = precision - scale
    ipd, ipx = x // DIG_PER_DEC, x % DIG_PER_DEC
    lead = DIG_TO_BYTES[ipx]
    o = 0
    ip = int.from_bytes(raw[:lead], "big") if lead else 0
    o += lead
    for _ in range(ipd):
        ip = ip * 10**DIG_PER_DEC + int.from_bytes(raw[o : o + 4], "big")
        o += 4
    fp = 0
    shift = 0
    while shift + DIG_PER_DEC <= scale:
        fp = fp * 10**DIG_PER_DEC + int.from_bytes(raw[o : o + 4], "big")
        shift += DIG_PER_DEC
        o += 4
    if shift < scale:
        nb = DIG_TO_BYTES[scale - shift]
        fp = fp * 10 ** (scale - shift) + int.from_bytes(raw[o : o + nb], "big")
    unscaled = ip * 10**scale + fp
    d = Decimal(unscaled).scaleb(-scale)
    return d if positive else -d


def _parse_value(
    r: BinlogReader,
    type_code: int,
    meta: int,
    length: int,
    unsigned: bool = False,
    charset: int | None = None,
):
    t = type_code
    if t == 0x01:
        v = r.u_le(1)
        return v if unsigned else _sx(v, 8)
    if t == 0x02:
        v = r.u_le(2)
        return v if unsigned else _sx(v, 16)
    if t == 0x09:
        v = r.u_le(3)
        return v if unsigned else _sx(v, 24)
    if t == 0x03:
        v = r.u_le(4)
        return v if unsigned else _sx(v, 32)
    if t == 0x08:
        v = r.u_le(8)
        return v if unsigned else _sx(v, 64)
    if t == 0x04:
        return struct.unpack("<f", r.read(4))[0]
    if t == 0x05:
        return struct.unpack("<d", r.read(8))[0]
    if t == 0x0D:
        return 1900 + r.u_le(1)
    if t == 0xF6:
        return _decimal(r, meta)
    if t == 0x0A:  # DATE, 3B LE bit-packed
        v = r.u_le(3)
        day, rest = v % 32, v >> 5
        month, year = rest % 16, rest >> 4
        if day == 0 or month == 0:
            return None
        return dt.date(year, month, day)
    if t == 0x13:  # TIME_V2: biased BE fixed-point over (3+fsp) bytes
        # (MySQL my_time_packed_to_binary; sign = word below bias — the
        # reference decodes the non-negative subset, RowParser.java:246-268).
        # Rendered as the canonical '[-]HH:MM:SS[.ffffff]' string, matching
        # mysql_codecs.decode_typed_block — MySQL TIME spans +/-838 hours,
        # beyond datetime.time.
        nb = (meta + 1) // 2
        w = r.u_be(3 + nb) - (0x800000 << (8 * nb))
        neg, a = w < 0, abs(w)
        hms = a >> (8 * nb)
        us = (a & ((1 << (8 * nb)) - 1)) * 100 ** (3 - nb)
        return _render_hms(neg, (hms >> 12) & 0x3FF, (hms >> 6) & 0x3F,
                           hms & 0x3F, us, meta > 0)
    if t == 0x0B:  # TIME pre-5.6: 3B LE signed packed decimal HHMMSS
        v = _sx(r.u_le(3), 24)  # (RowParser.java:234-244)
        neg, a = v < 0, abs(v)
        return _render_hms(neg, a // 10000, (a // 100) % 100, a % 100, 0, False)
    if t == 0x07:  # TIMESTAMP pre-5.6: 4B LE epoch seconds (RowParser.java:270-279)
        secs = r.u_le(4)
        return dt.datetime.fromtimestamp(secs, dt.timezone.utc).replace(tzinfo=None)
    if t == 0x0C:  # DATETIME pre-5.6: 8B LE packed YYYYMMDDHHMMSS
        v = r.u_le(8)  # (RowParser.java:296-313)
        second, v = v % 100, v // 100
        minute, v = v % 100, v // 100
        hour, d = v % 100, v // 100
        day, month, year = d % 100, (d // 100) % 100, d // 10000
        if month == 0 or day == 0:
            return None
        return dt.datetime(year, month, day, hour, minute, second)
    if t == 0x11:  # TIMESTAMP_V2 (BE epoch seconds)
        secs = r.u_be(4)
        us = _fsp(r, meta)
        return dt.datetime.fromtimestamp(secs, dt.timezone.utc).replace(
            tzinfo=None
        ) + dt.timedelta(microseconds=us)
    if t == 0x12:  # DATETIME_V2
        word = r.u_be(5)
        us = _fsp(r, meta)
        ym = (word >> 22) & 0x1FFFF
        year, month = ym // 13, ym % 13
        day = (word >> 17) & 0x1F
        if month == 0 or day == 0:
            return None
        return dt.datetime(
            year, month, day, (word >> 12) & 0x1F, (word >> 6) & 0x3F, word & 0x3F, us
        )
    if t in (0x0F, 0xFD):  # VARCHAR / VAR_STRING: prefix width from meta
        n = r.u_le(1) if meta < 256 else r.u_le(2)
        return decode_mysql_string(r.read(n), charset)
    if t == 0xFE:  # STRING (post-disambiguation): 1/2B prefix from length
        n = r.u_le(1) if length < 256 else r.u_le(2)
        return decode_mysql_string(r.read(n), charset)
    if t == 0xFC:  # BLOB family: meta-byte length prefix. A recorded
        # NON-binary charset marks a TEXT column (TABLE_MAP metadata lists
        # character columns only) → decode; BLOB / no metadata stay bytes
        n = r.u_le(meta)
        raw = r.read(n)
        if charset is not None and _COLLATION_CHARSET.get(charset) != "binary":
            return decode_mysql_string(raw, charset)
        return raw
    if t == 0xF5:  # JSON: blob of binary JSON → text
        n = r.u_le(meta)
        return parse_json_binary(r.read(n))
    if t == 0xF2:  # VECTOR (MySQL 9.0): length-prefixed packed LE float32s
        n = r.u_le(meta)
        raw = r.read(n)
        if n % 4:
            raise ValueError(f"VECTOR payload length {n} not a float32 multiple")
        return list(struct.unpack(f"<{n // 4}f", raw))
    if t == 0xF7:  # ENUM ordinal (pack size = length)
        return r.u_le(length)
    if t == 0xF8:  # SET bitmask
        return r.u_le(length)
    if t == 0x10:  # BIT
        nbits = (meta >> 8) * 8 + (meta & 0xFF)
        return int.from_bytes(r.read((nbits + 7) // 8), "big")
    raise ValueError(f"unsupported column type {t:#x}")


@dataclass
class JsonDiffVector:
    """A partial-JSON after-image value: the diff vector as decoded from
    the wire, before application (``(op, path, decoded_value)`` tuples).
    Empty means 'column mentioned but unchanged'."""

    diffs: list


def _parse_json_diffs(buf: bytes) -> JsonDiffVector:
    """Json_diff_vector wire layout (sql/json_diff.cc write_binary): per
    diff an operation byte (0 REPLACE / 1 INSERT / 2 REMOVE), a
    length-prefixed JSON path (net_field_length + text), and — except for
    REMOVE — a length-prefixed value in the standard binary-JSON encoding
    (type tag + data, exactly like a column document)."""
    from ..functions.json_binary import parse_json_value

    r = BinlogReader(buf)
    out = []
    while r.available() > 0:
        op = r.u_le(1)
        if op > 2:
            raise ValueError(f"unknown JSON diff operation {op}")
        plen = r.packed_int() or 0
        path = r.read(plen).decode("utf-8")
        if op == 2:  # REMOVE carries no value
            out.append((op, path, None))
        else:
            vlen = r.packed_int() or 0
            out.append((op, path, parse_json_value(r.read(vlen))))
    return JsonDiffVector(out)


def _materialize_partial_json(
    old: list,
    new: list,
    included_old: list[int],
    included: list[int],
    partial: set[int],
) -> None:
    """Replace each JsonDiffVector in the after-image with the full
    document: apply the diffs to the before-image's value (in-place on
    ``new``). Requires the before-image to carry the column — true under
    binlog_row_image=FULL (MySQL's default). Under MINIMAL the before-image
    has only the PK, so the vector is left in place for the merge-time
    apply against the TABLE's current image (``_emit_rows_event`` turns it
    into a ``{col}_patch`` changelog column; ``operators/partial_image``
    composes and applies it against base)."""
    import json as _json

    from ..functions.json_binary import _JsonEncoder
    from ..functions.json_patch import apply_json_diffs

    old_pos = {c: j for j, c in enumerate(included_old)}
    for idx, col in enumerate(included):
        v = new[idx]
        if not isinstance(v, JsonDiffVector):
            continue
        if col not in old_pos:
            continue  # defer: apply against the base table at merge time
        before = old[old_pos[col]]
        if not v.diffs:
            new[idx] = before  # unchanged
            continue
        if before is None:
            raise ValueError(
                f"partial JSON diffs for column {col} against a NULL "
                "before-image"
            )
        doc = apply_json_diffs(_json.loads(before), v.diffs)
        new[idx] = _json.dumps(
            doc, separators=(",", ":"), ensure_ascii=False, cls=_JsonEncoder
        )


def _parse_row(
    r: BinlogReader,
    tmap: TableMap,
    included: list[int],
    partial_cols: set[int] | None = None,
) -> list:
    """One row image (RowParser.parseRow, RowParser.java:46-93): null bitmap
    over the included columns, then values. STRING metadata may smuggle the
    real ENUM/SET/CHAR type in its high byte (RowParser.java:71-105).
    Columns in ``partial_cols`` (JSON, partial-update after-images) decode
    to :class:`JsonDiffVector` instead of a document."""
    nulls = set(r.bitset(len(included)))
    out = []
    for idx, col in enumerate(included):
        if idx in nulls:
            out.append(None)
            continue
        if partial_cols and col in partial_cols:
            meta = tmap.column_metadata[col]
            n = r.u_le(meta)
            out.append(_parse_json_diffs(r.read(n)))
            continue
        type_code = tmap.column_types[col]
        meta = tmap.column_metadata[col]
        length = 0
        if type_code == 0xFE:  # STRING disambiguation
            if meta < 256:
                length = meta
            else:
                high, low = meta >> 8, meta & 0xFF
                if (high & 0x30) != 0x30:
                    type_code = high | 0x30
                    length = low | (((high & 0x30) ^ 0x30) << 4)
                else:
                    if high in (0xF7, 0xF8):  # ENUM / SET
                        type_code = high
                    length = low
        unsigned = tmap.signedness is not None and not tmap.signedness[col]
        charset = tmap.charsets[col] if tmap.charsets is not None else None
        out.append(_parse_value(r, type_code, meta, length, unsigned, charset))
    return out


def parse_format_description(buf: bytes) -> tuple[str, int]:
    """FORMAT_DESCRIPTION body → (server_version, checksum_length).

    Layout (every binlog/stream starts with one): binlog_version(2 LE) +
    server_version(50, NUL-padded) + create_timestamp(4) +
    common_header_length(1) + per-type post-header lengths. Servers >=
    5.6.1 append checksum_alg(1) + the FDE's own CRC(4) — the alg byte is
    therefore ``buf[-5]`` (0 = NONE, 1 = CRC32). Older servers have no alg
    byte; their version string says so. Returns the checksum length (0 or
    4) every LATER event carries, so a stream consumer can self-configure
    instead of querying ``binlog_checksum`` like the reference does
    (``BinlogClient.java:196-208``)."""
    if len(buf) < 57:
        raise ValueError("FORMAT_DESCRIPTION too short")
    binlog_version = int.from_bytes(buf[0:2], "little")
    if binlog_version != 4:
        raise ValueError(f"unsupported binlog version {binlog_version}")
    server_version = buf[2:52].split(b"\x00", 1)[0].decode("latin1")

    def _at_least(v: str, want: tuple[int, ...]) -> bool:
        parts = []
        for tok in v.split("-")[0].split("."):
            digits = "".join(ch for ch in tok if ch.isdigit())
            parts.append(int(digits) if digits else 0)
        return tuple(parts[:3]) >= want

    if not _at_least(server_version, (5, 6, 1)):
        return server_version, 0
    alg = buf[-5]
    if alg == CHECKSUM_NONE:
        return server_version, 0
    if alg == CHECKSUM_CRC32:
        return server_version, 4
    raise ValueError(f"unknown binlog checksum algorithm {alg:#04x}")


def _uuid_str(b: bytes) -> str:
    h = b.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def parse_gtid(buf: bytes) -> Gtid:
    """GTID/ANONYMOUS_GTID body: flags(1) + sid(16) + gno(8 LE), then — from
    MySQL 5.7 — the logical-timestamp block tagged by typecode 0x02:
    last_committed(8 LE) + sequence_number(8 LE). Later servers append more
    optional fields (immediate_commit_timestamp, ...); they are ignored, as
    a replica that predates them would."""
    r = BinlogReader(buf)
    flags = r.u_le(1)
    sid = _uuid_str(r.read(16))
    gno = r.u_le(8)
    last_committed = sequence_number = None
    if r.available() >= 17 and r.buf[r.pos] == 0x02:
        r.skip(1)
        last_committed = r.u_le(8)
        sequence_number = r.u_le(8)
    return Gtid(sid, gno, flags, last_committed, sequence_number)


def parse_previous_gtids(buf: bytes) -> PreviousGtids:
    """PREVIOUS_GTIDS body: n_sids(8 LE) then per sid: uuid(16) +
    n_intervals(8 LE) + per interval start(8 LE), end(8 LE, EXCLUSIVE).
    Normalized to inclusive ends — the form ``SHOW MASTER STATUS`` prints
    and ``state.GtidSet.from_string`` consumes."""
    r = BinlogReader(buf)
    out: dict[str, list[tuple[int, int]]] = {}
    for _ in range(r.u_le(8)):
        sid = _uuid_str(r.read(16))
        spans = []
        for _ in range(r.u_le(8)):
            start = r.u_le(8)
            end_excl = r.u_le(8)
            spans.append((start, end_excl - 1))
        out[sid] = spans
    return PreviousGtids(out)


def _zstd_decompress(payload: bytes, uncompressed: int | None) -> bytes:
    """Inflate a ZSTD transaction payload with whatever codec exists:
    ``zstandard`` when installed, else pyarrow's bundled zstd (always
    present next to Spark's Arrow path). pyarrow's frame decompressor
    requires the output size — which the payload header carries as
    OTW field 3, so the wire gives us exactly what the codec needs."""
    try:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(
            payload, max_output_size=uncompressed or 0
        )
    except ImportError:
        pass
    try:
        import pyarrow as pa
    except ImportError as e:
        raise NotImplementedError(
            "zstd-compressed TRANSACTION_PAYLOAD needs the 'zstandard' "
            "module or pyarrow (neither importable)"
        ) from e
    if uncompressed is None:
        raise ValueError(
            "ZSTD payload without an uncompressed-size header field "
            "cannot be inflated through pyarrow (size required)"
        )
    return pa.Codec("zstd").decompress(
        payload, decompressed_size=uncompressed, asbytes=True
    )


def _zstd_compress(payload: bytes) -> bytes:
    try:
        import zstandard

        return zstandard.ZstdCompressor().compress(payload)
    except ImportError:
        import pyarrow as pa

        return pa.Codec("zstd").compress(payload, asbytes=True)


def build_transaction_payload(inner: bytes, *, compress: bool = True) -> bytes:
    """Write-side inverse of :func:`parse_transaction_payload`: frame a
    concatenation of inner events (19-byte headers + bodies, NO per-event
    checksums — the container is checksummed as one event) into a
    TRANSACTION_PAYLOAD body. ``compress=True`` emits a real ZSTD
    payload (what ``binlog_transaction_compression=ON`` servers ship);
    ``compress=False`` the NONE container."""
    def field(ftype: int, value_packed: bytes) -> bytes:
        return bytes([ftype, len(value_packed)]) + value_packed

    if compress:
        comp = _zstd_compress(inner)
        return (
            field(2, _packed_int_bytes(PAYLOAD_COMPRESSION_ZSTD))
            + field(3, _packed_int_bytes(len(inner)))
            + field(1, _packed_int_bytes(len(comp)))
            + bytes([0])  # END_MARK
            + comp
        )
    return (
        field(2, _packed_int_bytes(PAYLOAD_COMPRESSION_NONE))
        + field(1, _packed_int_bytes(len(inner)))
        + bytes([0])
        + inner
    )


def _packed_int_bytes(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def parse_transaction_payload(buf: bytes) -> TransactionPayload:
    """TRANSACTION_PAYLOAD body (libbinlogevents codecs/binary.cpp,
    binary::Transaction_payload::decode): a TLV header — per field a packed
    type, packed length, then ``length`` value bytes — terminated by the
    END_MARK type (0, no length), followed by the wrapped bytes.

    Field types: 1 = payload size, 2 = compression algorithm
    (0 = ZSTD, 255 = NONE), 3 = uncompressed size (absent when NONE).
    Integer field values are themselves packed ints inside the value bytes.
    Unknown field types are skipped by length (forward compatibility).

    The NONE path decodes with the stdlib alone; ZSTD inflates through
    whichever codec the environment provides (``zstandard`` if present,
    else pyarrow's bundled zstd — the wire's uncompressed-size field is
    exactly what pyarrow's frame decompressor requires), raising
    ``NotImplementedError`` only when neither exists."""
    r = BinlogReader(buf)
    compression = PAYLOAD_COMPRESSION_NONE
    payload_size: int | None = None
    uncompressed: int | None = None
    while True:
        if r.available() == 0:
            raise ValueError("TRANSACTION_PAYLOAD header missing END_MARK")
        ftype = r.packed_int()
        if ftype == 0:  # OTW_PAYLOAD_HEADER_END_MARK
            break
        flen = r.packed_int()
        fr = BinlogReader(r.read(flen))
        if ftype == 1:
            payload_size = fr.packed_int()
        elif ftype == 2:
            compression = fr.packed_int()
        elif ftype == 3:
            uncompressed = fr.packed_int()
    payload = r.read(payload_size if payload_size is not None else r.available())
    if payload_size is not None and len(payload) != payload_size:
        raise ValueError(
            f"TRANSACTION_PAYLOAD truncated: header says {payload_size} "
            f"bytes, {len(payload)} present"
        )
    if compression == PAYLOAD_COMPRESSION_ZSTD:
        payload = _zstd_decompress(payload, uncompressed)
    elif compression != PAYLOAD_COMPRESSION_NONE:
        raise ValueError(f"unknown payload compression {compression:#04x}")
    if uncompressed is not None and len(payload) != uncompressed:
        raise ValueError(
            f"TRANSACTION_PAYLOAD inflate mismatch: expected {uncompressed} "
            f"bytes, got {len(payload)}"
        )
    events = []
    pos = 0
    while pos < len(payload):
        hdr = parse_event_header(payload[pos : pos + 19])
        body = payload[pos + 19 : pos + hdr.event_length]
        if len(body) != hdr.event_length - 19:
            raise ValueError("torn inner event in TRANSACTION_PAYLOAD")
        events.append((hdr, body))
        pos += hdr.event_length
    return TransactionPayload(compression, uncompressed or len(payload),
                              payload, events)


def parse_xa_prepare(buf: bytes) -> XaPrepare:
    """Decode XA_PREPARE_LOG_EVENT (see :class:`XaPrepare` for the layout,
    from the public libbinlogevents XA_prepare_event codec)."""
    r = BinlogReader(buf)
    one_phase = r.u_le(1) != 0
    format_id = r.u_le(4)
    gtrid_len = r.u_le(4)
    bqual_len = r.u_le(4)
    return XaPrepare(one_phase, format_id, r.read(gtrid_len), r.read(bqual_len))


def parse_incident(buf: bytes) -> Incident:
    """Decode INCIDENT_EVENT (see :class:`Incident`)."""
    r = BinlogReader(buf)
    itype = r.u_le(2)
    mlen = r.u_le(1)
    return Incident(itype, r.read(mlen).decode("utf-8", errors="replace"))


_XA_STMT_RE = re.compile(
    r"^\s*XA\s+(START|BEGIN|END|PREPARE|COMMIT|ROLLBACK)\s+(.*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_XA_PART_RE = re.compile(
    r"X'([0-9a-fA-F]*)'|'((?:[^'\\]|\\.)*)'|(\d+)"
)


def parse_xa_statement(sql: str):
    """Parse an ``XA START|END|PREPARE|COMMIT|ROLLBACK xid [ONE PHASE]``
    statement into ``(verb, xid_key, one_phase)`` or None if ``sql`` is not
    an XA statement. The xid is ``gtrid [, bqual [, formatID]]`` with string
    parts as ``'...'`` or ``X'hex'`` literals (the binlog writes the hex
    form); xid_key matches :meth:`XaPrepare.xid_key` so the QUERY-event
    terminal pairs with the prepare event's buffered rows."""
    m = _XA_STMT_RE.match(sql)
    if not m:
        return None
    verb = m.group(1).upper()
    if verb == "BEGIN":
        verb = "START"
    rest = m.group(2)
    one_phase = bool(re.search(r"ONE\s+PHASE\s*;?\s*$", rest, re.IGNORECASE))
    parts: list = []
    for pm in _XA_PART_RE.finditer(rest):
        if pm.group(3) is not None:
            parts.append(int(pm.group(3)))
        elif pm.group(2) is not None:
            parts.append(pm.group(2).encode())
        else:
            parts.append(bytes.fromhex(pm.group(1)))
    # parts = [gtrid, bqual?, formatID?]; MySQL defaults bqual='' formatID=1
    strs = [p for p in parts if isinstance(p, bytes)]
    nums = [p for p in parts if isinstance(p, int)]
    gtrid = strs[0] if strs else b""
    bqual = strs[1] if len(strs) > 1 else b""
    format_id = nums[0] if nums else 1
    return verb, (format_id, gtrid, bqual), one_phase


def parse_event_body(
    buf: bytes,
    type_code: int,
    table_maps: dict[int, TableMap],
    checksum_length: int = 0,
    verify_checksum: bool = False,
    header_bytes: bytes | None = None,
) -> (
    RowsEvent | Rotate | Gtid | PreviousGtids | Heartbeat | RowsQuery
    | Query | TransactionPayload | XaPrepare | Incident | Stop | None
):
    """Route one event body (EventBodyParser.parse, EventBodyParser.java:19-40).
    TABLE_MAP updates the cache and returns None; XID clears it; irrelevant
    types return None (BinlogClient.java:191-195 keeps only EXT_*_ROWS).

    ``checksum_length``: bytes of checksum trailing the body (4 when the
    server runs binlog_checksum=CRC32 — the MySQL 5.6+ default; the length
    comes from the server handshake, the reference queries
    ``show global variables like 'binlog_checksum'``,
    ``BinlogClient.java:196-208``). The tail is stripped before parsing
    (``BinlogClient.java:242`` copies bodyBytes minus checksum) — without
    this, the rows loop would misparse the 4 CRC bytes as a row image.
    ``verify_checksum`` additionally checks the CRC32 (zlib, the same
    ISO-3309 polynomial MySQL uses) over header+body and raises on
    mismatch — the reference only strips; verification is our hardening
    (a torn/corrupt event fails loudly instead of decoding garbage).
    """
    if checksum_length:
        if verify_checksum:
            import zlib

            if header_bytes is None:
                # MySQL checksums header+body; verifying over the body alone
                # would spuriously fail on every valid event — refuse the
                # misuse loudly instead of silently defaulting to b"".
                raise ValueError(
                    "verify_checksum=True requires header_bytes (the CRC32 "
                    "covers the 19-byte event header plus the body)"
                )
            want = int.from_bytes(buf[-4:], "little")
            got = zlib.crc32(header_bytes + buf[:-checksum_length])
            if want != got:
                raise ValueError(
                    f"binlog event CRC32 mismatch: stored {want:#010x}, "
                    f"computed {got:#010x}"
                )
        buf = buf[:-checksum_length]
    if type_code == TABLE_MAP_EVENT:
        tm = parse_table_map(buf)
        table_maps[tm.table_id] = tm
        return None
    if type_code == XID_EVENT:
        table_maps.clear()
        return None
    if type_code == ROTATE_EVENT:
        r = BinlogReader(buf)
        pos = r.u_le(8)
        return Rotate(pos, r.read(r.available()).decode())
    if type_code in (GTID_EVENT, ANONYMOUS_GTID_EVENT):
        return parse_gtid(buf)
    if type_code == PREVIOUS_GTIDS_EVENT:
        return parse_previous_gtids(buf)
    if type_code == HEARTBEAT_EVENT:
        return Heartbeat(buf.decode())
    if type_code == ROWS_QUERY_EVENT:
        # 1-byte length prefix is capped at 255 and unreliable for long
        # statements — MySQL fills the rest of the body with the text
        return RowsQuery(buf[1:].decode("utf-8", errors="replace"))
    if type_code == QUERY_EVENT:
        r = BinlogReader(buf)
        thread_id = r.u_le(4)
        exec_time = r.u_le(4)
        schema_len = r.u_le(1)
        error_code = r.u_le(2)
        status_len = r.u_le(2)
        r.skip(status_len)  # status vars: typed KV block, length-delimited
        schema = r.read(schema_len).decode("utf-8", errors="replace")
        r.skip(1)  # NUL terminator after the schema name
        sql = r.read(r.available()).decode("utf-8", errors="replace")
        return Query(thread_id, exec_time, error_code, schema, sql)
    if type_code == TRANSACTION_PAYLOAD_EVENT:
        return parse_transaction_payload(buf)
    if type_code == XA_PREPARE_EVENT:
        # like XID this ends the statement group — later row events belong
        # to a new transaction and re-announce their TABLE_MAPs
        table_maps.clear()
        return parse_xa_prepare(buf)
    if type_code == INCIDENT_EVENT:
        return parse_incident(buf)
    if type_code == STOP_EVENT:
        return Stop()
    if type_code not in (
        EXT_WRITE_ROWS, EXT_UPDATE_ROWS, EXT_DELETE_ROWS,
        PARTIAL_UPDATE_ROWS_EVENT,
    ):
        return None

    r = BinlogReader(buf)
    tid = _table_id(r)
    extra = r.u_le(2)
    if extra < 2:  # the field counts itself — anything lower is a torn/
        # corrupt frame, and skipping backwards would desync the row loop
        # into reading garbage column counts (unbounded memory, not an
        # error message)
        raise ValueError(f"rows event extra_data_len {extra} < 2")
    r.skip(extra - 2)
    n_cols = r.packed_int()
    tmap = table_maps.get(tid)
    if tmap is None:
        raise ValueError(f"no TABLE_MAP for table id {tid}")
    if n_cols != len(tmap.column_types):
        raise ValueError(
            f"rows event declares {n_cols} columns but TABLE_MAP {tid} has "
            f"{len(tmap.column_types)} — desynced or corrupt stream"
        )
    kind = {
        EXT_WRITE_ROWS: "insert",
        EXT_UPDATE_ROWS: "update",
        PARTIAL_UPDATE_ROWS_EVENT: "update",
        EXT_DELETE_ROWS: "delete",
    }[type_code]
    if type_code in (EXT_UPDATE_ROWS, PARTIAL_UPDATE_ROWS_EVENT):
        # Two bitmaps: before-image columns, then after-image columns. The
        # reference assumes binlog_row_image=FULL and reuses one bitmap for
        # both (RowsParser skips the first); under MINIMAL they differ — the
        # before-image carries only the PK, the after-image only changed
        # columns — so each row image must be parsed with ITS OWN bitmap or
        # the byte cursor desyncs.
        included_old = r.bitset(n_cols)
        included = r.bitset(n_cols)
        ev = RowsEvent(
            tid,
            tmap.schema_name,
            tmap.table_name,
            kind,
            included,
            included_columns_old=included_old,
        )
        partial_event = type_code == PARTIAL_UPDATE_ROWS_EVENT
        json_cols = [
            i for i, t in enumerate(tmap.column_types) if t == 0xF5
        ] if partial_event else []
        while r.available() > 0:
            old = _parse_row(r, tmap, included_old)
            partial: set[int] = set()
            if partial_event:
                # the after-image opens with value_options (packed int); bit
                # 0 = PARTIAL_JSON → a bitmap with one bit per JSON column
                # of the TABLE (not per included column) marks which store
                # diff vectors instead of full documents
                # (Rows_log_event::unpack_current_row, WL#2955)
                value_options = r.packed_int() or 0
                if value_options & 1:
                    partial = {json_cols[i] for i in r.bitset(len(json_cols))}
            new = _parse_row(r, tmap, included, partial_cols=partial)
            if partial:
                _materialize_partial_json(
                    old, new, included_old, included, partial
                )
            ev.old_rows.append(old)
            ev.new_rows.append(new)
        return ev
    included = r.bitset(n_cols)
    ev = RowsEvent(tid, tmap.schema_name, tmap.table_name, kind, included)
    while r.available() > 0:
        ev.new_rows.append(_parse_row(r, tmap, included))
    return ev


def _emit_rows_event(
    ev: RowsEvent,
    schema_name: str,
    table_name: str,
    column_names: list[str],
    emit_presence: bool,
    lsn: int,
    out: list,
) -> None:
    """Emit one RowsEvent's images as changelog records (Updater.java:148-217
    semantics — see :func:`packets_to_changelog`).

    Under binlog_row_image=MINIMAL an UPDATE's after-image carries only the
    columns the statement SET — the primary key travels in the BEFORE-image
    (its own bitmap), unless the statement changed it. A column present in
    the before-image but absent from the after-image was unchanged by the
    update, so its before value is current: merge it in (under FULL the
    after-image has every column and this is a no-op). Without the merge,
    MINIMAL updates emit NULL key columns and the downstream keyed merge
    collapses them onto garbage keys."""
    if (ev.schema_name, ev.table_name) != (schema_name, table_name):
        return
    op = {"insert": "I", "update": "U", "delete": "D"}[ev.kind]
    new_set = set(ev.included_columns)
    old_only = [
        c
        for c in (ev.included_columns_old or [])
        if c not in new_set and c < len(column_names)
    ]
    present_cols = sorted(
        {c for c in ev.included_columns if c < len(column_names)}
        | set(old_only)
    )
    present = [column_names[c] for c in present_cols]
    old_pos = {c: j for j, c in enumerate(ev.included_columns_old or [])}
    for idx, row in enumerate(ev.new_rows):
        rec = {"op": op, "source_lsn": lsn}
        row_present = list(present)
        for i, col in enumerate(ev.included_columns):
            if col >= len(column_names):
                continue
            name = column_names[col]
            v = row[i]
            if isinstance(v, JsonDiffVector):
                # a partial-JSON vector that could NOT be materialized from
                # the before-image (binlog_row_image=MINIMAL): ship it as a
                # {col}_patch column for the merge-time apply against base
                # (operators/partial_image). Without presence tracking there
                # is no way to represent "patch, not value" downstream.
                if not emit_presence:
                    raise ValueError(
                        f"partial JSON for column {name!r} cannot be "
                        "materialized (before-image lacks the column) and "
                        "emit_presence=False leaves no way to carry the "
                        "patch — decode with emit_presence=True"
                    )
                import json as _json

                from ..functions.json_binary import _JsonEncoder

                rec[name] = None
                rec[f"{name}_patch"] = _json.dumps(
                    [[o, p, val] for o, p, val in v.diffs],
                    separators=(",", ":"), ensure_ascii=False,
                    cls=_JsonEncoder,
                )
                if name in row_present:
                    row_present.remove(name)
                continue
            rec[name] = v
        if op == "U" and old_only and idx < len(ev.old_rows):
            old_row = ev.old_rows[idx]
            for col in old_only:
                rec[column_names[col]] = old_row[old_pos[col]]
        if emit_presence:
            rec["_present"] = row_present
        out.append(rec)


def packets_to_changelog(
    packets,
    schema_name: str,
    table_name: str,
    column_names: list[str],
    checksum_length: int = 0,
    emit_presence: bool = False,
    emit_stmt: bool = False,
    on_incident: str = "raise",
):
    """Replay a (type_code, payload) packet stream into changelog rows for
    one table — the Updater event loop's emission semantics
    (``Updater.java:148-217``): INSERT/UPDATE emit the NEW row image as an
    upsert (UPDATE's delete(old)+upsert(new) collapses to replacement on a
    fixed key), DELETE emits the key image (delete rows arrive in the
    newRows slot, ``BinlogClient.java:285-291``). Rows are tagged with a
    monotone source_lsn in packet order.

    Returns a pandas DataFrame: op, *column_names, source_lsn — directly
    mergeable into a LakeTable. With ``emit_presence=True`` an extra
    ``_present`` column lists, per row, which column NAMES the row image
    actually carried (binlog_row_image=MINIMAL sends only changed columns +
    PK) — a column that is absent is distinct from present-but-NULL, and
    downstream partial-image folding (``operators.partial_image``) needs the
    mask to avoid nulling unchanged columns on merge. With
    ``emit_stmt=True`` an extra ``_stmt`` column carries the originating
    SQL statement from the preceding ROWS_QUERY event
    (binlog_rows_query_log_events=ON) — per-row statement lineage for
    audit/debug; NULL when the statement wasn't rows-query-logged. The
    reference discards ROWS_QUERY with every other unlisted type
    (``BinlogClient.java:191-195``). Sequential per stream (wire parity
    layer); the engine's bulk path is the columnar payload feed.
    """
    rows, _ = packets_to_changelog_and_ddl(
        packets,
        schema_name,
        table_name,
        column_names,
        checksum_length=checksum_length,
        emit_presence=emit_presence,
        emit_stmt=emit_stmt,
        track_ddl=False,
        on_incident=on_incident,
    )
    return rows


class BinlogGapError(RuntimeError):
    """Raised when the stream carries an INCIDENT_EVENT: the master declared
    a gap (e.g. LOST_EVENTS) and everything applied past it may be
    inconsistent. The only safe recovery is a fresh snapshot — the caller
    must not keep applying (the reference would: INCIDENT falls into its
    discard branch, BinlogClient.java:191-195)."""


def packets_to_changelog_and_ddl(
    packets,
    schema_name: str,
    table_name: str,
    column_names: list[str],
    checksum_length: int = 0,
    emit_presence: bool = False,
    emit_stmt: bool = False,
    track_ddl: bool = True,
    strict_ddl: bool = True,
    on_incident: str = "raise",
):
    """:func:`packets_to_changelog` plus WIRE-NATIVE DDL: QUERY events
    (the only way MySQL ships DDL — as SQL text) are parsed
    (``sources/ddl_parse.py``) and ALTER TABLE statements for this table
    become structured DDL rows in a second frame, positioned at the same
    monotone lsn counter as the row events — exactly the ``ddl.parquet``
    sidecar format the streaming pipeline orders by ``ddl_hwm``.

    The working column list is maintained AS the DDL arrives (ADD with
    FIRST/AFTER placement, DROP, RENAME, MODIFY repositioning), because a
    TABLE_MAP after an ALTER describes the NEW column order and row images
    index positionally into it — a static column list would silently
    misattribute every value to the right of the change. Rows emitted
    before a RENAME carry the old name (rename-lag, same contract as the
    sidecar feed); the rows frame's columns are every name ever current.

    Returns ``(rows_df, ddl_df)`` — pandas; sequential per stream (wire
    parity layer, like :func:`packets_to_changelog`).

    XA transactions (two-phase commit across resource managers) are handled
    with PREPARE-time buffering: MySQL flushes an XA transaction's row
    events to the binlog at ``XA PREPARE`` (QUERY "XA START ..." → rows →
    XA_PREPARE_LOG_EVENT), but the decision arrives LATER as a top-level
    QUERY — ``XA COMMIT xid`` releases the buffered rows, ``XA ROLLBACK
    xid`` discards them. Applying at prepare time would replicate rows a
    later rollback never committed. Released rows keep the source_lsn of
    the packet that carried them: between PREPARE and COMMIT the XA branch
    holds its row locks, so no committed writer can interleave on those
    keys and prepare-order IS commit-order for every key the transaction
    touched. Transactions still in-doubt (prepared, no terminal in this
    packet stream) are NOT emitted — their decision belongs to a later
    stream segment, exactly like the server's own recovery view.

    ``on_incident``: "raise" (default) raises :class:`BinlogGapError` on an
    INCIDENT_EVENT — the master declared a gap and the only safe recovery
    is a resnapshot; "skip" continues (forensic replay of a stream you
    already know to be whole).
    """
    import pandas as pd

    from .ddl_parse import parse_query_ddl

    table_maps: dict[int, TableMap] = {}
    out: list[dict] = []
    ddl_rows: list[dict] = []
    cols = list(column_names)
    ever: dict[str, None] = dict.fromkeys(cols)  # ordered first-seen union
    lsn = 0
    xa_open: tuple | None = None  # xid of the txn currently buffering
    xa_buf: list[dict] = []
    xa_prepared: dict[tuple, list[dict]] = {}  # in-doubt: awaiting terminal
    # statement lineage (binlog_rows_query_log_events=ON): the ROWS_QUERY
    # event precedes its statement's TABLE_MAP+rows; scope ends at the next
    # statement's ROWS_QUERY or the next transaction's GTID — a statement
    # logged WITHOUT rows-query must not inherit the previous one's text
    cur_stmt: str | None = None

    def _handle(ev) -> None:
        nonlocal xa_open, xa_buf, cur_stmt
        if isinstance(ev, RowsQuery):
            cur_stmt = ev.query
            return
        if isinstance(ev, Gtid):
            cur_stmt = None  # new transaction: lineage never crosses it
            return
        if isinstance(ev, Incident):
            if on_incident == "raise":
                raise BinlogGapError(
                    f"INCIDENT event (type {ev.incident_type}) at packet "
                    f"{lsn}: {ev.message or 'master declared a gap'} — "
                    "stream has a gap; resnapshot required"
                )
            return
        if isinstance(ev, XaPrepare):
            if ev.one_phase:
                out.extend(xa_buf)  # XA COMMIT ... ONE PHASE: commits here
            else:
                xa_prepared[ev.xid_key()] = xa_buf  # in-doubt until terminal
            xa_open, xa_buf = None, []
            return
        if isinstance(ev, Query):
            xa = parse_xa_statement(ev.sql)
            if xa is not None:
                verb, xid, one_phase = xa
                if verb == "START":
                    xa_open, xa_buf = xid, []
                elif verb == "PREPARE" and xa_open == xid:
                    # statement form (statement-based segments log PREPARE
                    # as SQL instead of the XA_PREPARE event)
                    xa_prepared[xid] = xa_buf
                    xa_open, xa_buf = None, []
                elif verb == "COMMIT":
                    if xid in xa_prepared:
                        out.extend(xa_prepared.pop(xid))
                    elif xa_open == xid and one_phase:
                        out.extend(xa_buf)
                        xa_open, xa_buf = None, []
                elif verb == "ROLLBACK":
                    xa_prepared.pop(xid, None)
                    if xa_open == xid:
                        xa_open, xa_buf = None, []
                return
            if not track_ddl:
                return
            for act in parse_query_ddl(
                ev.schema_name, ev.sql, schema_name, table_name,
                strict=strict_ddl,
            ):
                if act["action"] == "UNSUPPORTED":
                    continue
                ddl_rows.append(
                    {
                        "source_lsn": lsn,
                        "action": act["action"],
                        "column_name": act["column_name"],
                        "column_type": act["column_type"],
                        "new_name": act["new_name"],
                    }
                )
                name = act["column_name"]
                pos = act.get("position")
                if act["action"] == "ADD_COLUMN":
                    if name in cols:
                        raise ValueError(f"ADD COLUMN {name!r}: already exists")
                    if pos is None:
                        cols.append(name)
                    elif pos[0] == "first":
                        cols.insert(0, name)
                    else:
                        cols.insert(cols.index(pos[1]) + 1, name)
                    ever.setdefault(name)
                elif act["action"] == "DROP_COLUMN":
                    cols.remove(name)
                elif act["action"] == "RENAME_COLUMN":
                    cols[cols.index(name)] = act["new_name"]
                    ever.setdefault(act["new_name"])
                elif act["action"] == "MODIFY_COLUMN" and pos is not None:
                    cols.remove(name)
                    if pos[0] == "first":
                        cols.insert(0, name)
                    else:
                        cols.insert(cols.index(pos[1]) + 1, name)
            return
        if isinstance(ev, TransactionPayload):
            # expand the wrapped transaction inline, in wire order, through
            # the SAME state machine — a compressed XA transaction, DDL, or
            # INCIDENT behaves identically to its uncompressed form. Inner
            # events never carry a per-event checksum; containers never
            # nest (WL#3549), so recursion depth is 1.
            for h, b in ev.events:
                _handle(
                    parse_event_body(b, h.type_code, table_maps,
                                     checksum_length=0)
                )
            return
        if isinstance(ev, RowsEvent):
            sink = xa_buf if xa_open is not None else out
            start = len(sink)
            _emit_rows_event(ev, schema_name, table_name, cols,
                             emit_presence, lsn, sink)
            if emit_stmt:
                # stamped at emission (not at DataFrame assembly): an XA
                # branch's rows must carry the statement that produced them,
                # not whatever is current when the terminal releases them
                for rec in sink[start:]:
                    rec["_stmt"] = cur_stmt
        # Stop / None (TABLE_MAP, XID, ROTATE, GTID, heartbeat): no emission

    for pkt in packets:
        if len(pkt) == 3:
            # explicit log position (the on-disk file reader supplies
            # end_log_pos-derived lsns in the BinlogPosition.as_lsn
            # encoding so rows from different files interleave in true
            # log order) — must be monotone like the counter it replaces
            type_code, payload, pos = pkt
            if pos < lsn:
                raise ValueError(
                    f"packet positions must be non-decreasing: {pos} after {lsn}"
                )
            lsn = pos
        else:
            type_code, payload = pkt
            lsn += 1
        if type_code == FORMAT_DESCRIPTION_EVENT:
            # stream self-configures: the FDE announces the checksum tail
            # every later event carries (alg byte, parse_format_description)
            _, checksum_length = parse_format_description(payload)
            continue
        _handle(
            parse_event_body(
                payload, type_code, table_maps, checksum_length=checksum_length
            )
        )
    row_cols = ["op", *ever, "source_lsn"]
    patch_cols = sorted(
        {k for rec in out for k in rec if k.endswith("_patch")}
        - set(row_cols)
    )
    row_cols += patch_cols
    if emit_presence:
        row_cols.append("_present")
    if emit_stmt:
        row_cols.append("_stmt")
    ddl = pd.DataFrame(
        ddl_rows,
        columns=["source_lsn", "action", "column_name", "column_type", "new_name"],
    )
    return pd.DataFrame(out, columns=row_cols), ddl
