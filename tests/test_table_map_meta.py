"""TABLE_MAP optional metadata (binlog_row_metadata=FULL, WL#4618): TLV
decode of signedness / names / charsets / enum-set labels / PK / visibility,
and unsigned-aware row-value decode."""

import pytest

from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_WRITE_ROWS,
    TABLE_MAP_EVENT,
    parse_event_body,
    parse_table_map,
)


def _p(v: int) -> bytes:
    """MySQL length-encoded (packed) integer."""
    if v < 251:
        return bytes([v])
    if v < 1 << 16:
        return b"\xfc" + v.to_bytes(2, "little")
    if v < 1 << 24:
        return b"\xfd" + v.to_bytes(3, "little")
    return b"\xfe" + v.to_bytes(8, "little")


def _tlv(ftype: int, value: bytes) -> bytes:
    return bytes([ftype]) + _p(len(value)) + value


def _base_body() -> bytes:
    # cols: TINY, LONG, VARCHAR(20), STRING-smuggled ENUM(1B), STRING-smuggled
    # SET(2B), DATE — numeric = [0,1], char = [2], enum = [3], set = [4]
    body = (9).to_bytes(6, "little") + b"\x00\x00"
    body += bytes([1]) + b"s\x00"
    body += bytes([1]) + b"t\x00"
    body += bytes([6])
    body += bytes([0x01, 0x03, 0x0F, 0xFE, 0xFE, 0x0A])
    meta_block = (
        (20).to_bytes(2, "little")  # VARCHAR max len (LE)
        + bytes([0xF7, 0x01])  # ENUM via STRING: real type, pack size (BE)
        + bytes([0xF8, 0x02])  # SET via STRING: real type, pack size (BE)
    )
    body += _p(len(meta_block)) + meta_block
    body += bytes([0x3F])  # nullability bitset
    return body


def _names(*names: str) -> bytes:
    out = b""
    for n in names:
        raw = n.encode()
        out += _p(len(raw)) + raw
    return out


def test_optional_metadata_full_decode():
    body = _base_body()
    body += _tlv(1, b"\x80")  # SIGNEDNESS: TINY unsigned, LONG signed
    body += _tlv(2, _p(255) + _p(2) + _p(63))  # default cs 255; col2 → 63
    body += _tlv(4, _names("id", "n", "name", "col_e", "col_s", "d"))
    body += _tlv(6, _p(3) + _names("a", "bb", "ccc"))  # ENUM labels
    body += _tlv(5, _p(2) + _names("x", "y"))  # SET labels
    body += _tlv(7, b"")  # GEOMETRY_TYPE: no geometry columns
    body += _tlv(8, _p(0) + _p(1))  # SIMPLE_PRIMARY_KEY: cols 0, 1
    body += _tlv(12, bytes([0b11111000]))  # col 5 invisible
    body += _tlv(9, b"\xaa\xbb")  # unknown type: must be skipped by length

    tm = parse_table_map(body)
    assert tm.signedness == [False, True, True, True, True, True]
    assert tm.column_names == ["id", "n", "name", "col_e", "col_s", "d"]
    assert tm.charsets == [None, None, 63, None, None, None]
    assert tm.enum_str_values == {3: ["a", "bb", "ccc"]}
    assert tm.set_str_values == {4: ["x", "y"]}
    assert tm.geometry_types == {}
    assert tm.primary_key == [0, 1]
    assert tm.visibility == [True, True, True, True, True, False]


def test_no_optional_metadata_stays_none():
    tm = parse_table_map(_base_body())
    assert tm.signedness is None and tm.column_names is None
    assert tm.primary_key is None and tm.charsets is None


def test_column_charset_positional():
    # COLUMN_CHARSET (type 3): one id per character column, in order
    tm = parse_table_map(_base_body() + _tlv(3, _p(45)))
    assert tm.charsets == [None, None, 45, None, None, None]


def test_signedness_drives_integer_decode():
    """TINY 0xFF / LONG 0xFFFFFFFF decode as 255 / 4294967295 when the wire
    says unsigned, and as -1 / -1 without metadata (the pre-8.0 default)."""
    row = bytes([0x00]) + b"\xff" + b"\xff\xff\xff\xff"
    rows_body = (
        (9).to_bytes(6, "little")
        + b"\x00\x00"
        + (2).to_bytes(2, "little")
        + bytes([2])  # two columns in this narrow fixture
        + bytes([0x03])  # included-columns bitmap: cols 0,1
        + row
    )
    narrow = (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + bytes([1]) + b"s\x00" + bytes([1]) + b"t\x00"
        + bytes([2]) + bytes([0x01, 0x03]) + _p(0) + bytes([0x03])
    )

    maps = {}
    parse_event_body(narrow + _tlv(1, b"\xc0"), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(rows_body, EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == [255, 4294967295]

    maps = {}
    parse_event_body(narrow, TABLE_MAP_EVENT, maps)
    ev = parse_event_body(rows_body, EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == [-1, -1]


# ----------------------------------------------------------- column charsets
def _char_table(charset_tlv: bytes, col_type: int = 0x0F, meta: bytes = None) -> bytes:
    """One-column fixture: a single character column of ``col_type``
    (default VARCHAR(20)) with the given charset TLV appended."""
    if meta is None:
        meta = (20).to_bytes(2, "little")  # VARCHAR max length
    body = (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + bytes([1]) + b"s\x00" + bytes([1]) + b"t\x00"
        + bytes([1]) + bytes([col_type]) + _p(len(meta)) + meta + bytes([0x01])
    )
    return body + charset_tlv


def _one_row(value_bytes: bytes, prefix: bytes = None) -> bytes:
    if prefix is None:
        prefix = bytes([len(value_bytes)])  # 1-byte VARCHAR length
    return (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + (2).to_bytes(2, "little") + bytes([1]) + bytes([0x01])
        + bytes([0x00]) + prefix + value_bytes
    )


def test_decode_mysql_string_charsets():
    from mysql_secure_agent_spark.sources.binlog_packets import decode_mysql_string

    # MySQL latin1 = cp1252 glyphs with the five holes kept as C1 controls
    assert decode_mysql_string(b"caf\xe9", 8) == "café"
    assert decode_mysql_string(b"\x80", 8) == "€"
    assert decode_mysql_string(b"\x81", 8) == "\x81"
    assert decode_mysql_string("héllo".encode(), 45) == "héllo"  # utf8mb4
    assert decode_mysql_string(b"\x00\xff\x01", 63) == b"\x00\xff\x01"  # binary
    assert decode_mysql_string("Ж".encode("utf-16-be"), 35) == "Ж"  # ucs2
    assert decode_mysql_string("Ж".encode("cp1251"), 51) == "Ж"
    assert decode_mysql_string(b"abc", 9999) == "abc"  # unknown id: utf-8
    assert decode_mysql_string(b"caf\xe9", None) == "caf�"  # no metadata


def test_latin1_varchar_row_decode():
    maps = {}
    parse_event_body(
        _char_table(_tlv(2, _p(8))), TABLE_MAP_EVENT, maps
    )  # DEFAULT_CHARSET latin1
    ev = parse_event_body(_one_row(b"caf\xe9"), EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == ["café"]


def test_varbinary_row_decode_returns_bytes():
    maps = {}
    parse_event_body(_char_table(_tlv(3, _p(63))), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(_one_row(b"\x00\xfe\xff"), EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == [b"\x00\xfe\xff"]


def test_text_column_decodes_via_charset():
    # TEXT = BLOB type (0xFC) WITH a recorded character charset → str;
    # the same wire bytes with binary/no charset stay bytes
    maps = {}
    parse_event_body(
        _char_table(_tlv(2, _p(8)), col_type=0xFC, meta=bytes([1])),
        TABLE_MAP_EVENT,
        maps,
    )
    ev = parse_event_body(_one_row(b"caf\xe9"), EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == ["café"]

    maps = {}
    parse_event_body(
        _char_table(b"", col_type=0xFC, meta=bytes([1])), TABLE_MAP_EVENT, maps
    )
    ev = parse_event_body(_one_row(b"caf\xe9"), EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == [b"caf\xe9"]


def test_no_metadata_varchar_keeps_utf8_fallback():
    maps = {}
    parse_event_body(_char_table(b""), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(_one_row("héllo".encode()), EXT_WRITE_ROWS, maps)
    assert ev.new_rows[0] == ["héllo"]


def test_malformed_extra_len_raises_not_desyncs():
    # extra_data_len counts itself (min 2); a lower value must raise loudly
    # instead of rewinding the cursor into a garbage column count
    maps = {}
    parse_event_body(_char_table(b""), TABLE_MAP_EVENT, maps)
    bad = (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + (1).to_bytes(2, "little") + bytes([1]) + bytes([0x01])
        + bytes([0x00]) + bytes([3]) + b"abc"
    )
    with pytest.raises(ValueError, match="extra_data_len"):
        parse_event_body(bad, EXT_WRITE_ROWS, maps)


def test_column_count_mismatch_raises():
    maps = {}
    parse_event_body(_char_table(b""), TABLE_MAP_EVENT, maps)
    bad = (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + (2).to_bytes(2, "little") + bytes([4]) + bytes([0x0F])
        + bytes([0x00]) + bytes([3]) + b"abc"
    )
    with pytest.raises(ValueError, match="desynced or corrupt"):
        parse_event_body(bad, EXT_WRITE_ROWS, maps)
