"""S10 MySQL binary-JSON grammar (JsonBinaryParser.java analog).

Golden vectors come from the reference's OWN captured binlog packets
(BinlogParserSpec.java): the value blob of insertRow/complexArrayJson
('[1, "a"]') and nestedArray2Json ('[{"a":1}]') — real MySQL 5.7 output,
so these pin the grammar to the genuine wire format.
"""

import json
import struct

import pandas as pd
import pytest

from mysql_secure_agent_spark.functions.json_binary import (
    parse_json_binary,
    parse_json_value,
)
from mysql_secure_agent_spark.functions.mysql_codecs import (
    JSON, ColumnSpec, decode_typed_block,
)


def test_reference_capture_small_array():
    # BinlogParserSpec.java insertRow: INSERT ... VALUES ('[1, "a"]')
    v = bytes.fromhex("0202000C000501000C0A000161")
    assert parse_json_binary(v) == '[1,"a"]'


def test_reference_capture_nested_object():
    # BinlogParserSpec.java nestedArray2Json: '[{"a":1}]'
    v = bytes.fromhex("020100130000070001000C000B00010005010061")
    assert parse_json_binary(v) == '[{"a":1}]'


def _enc_string(s: bytes) -> bytes:
    # varlen 7-bit length (all test strings are short)
    assert len(s) < 128
    return bytes([len(s)]) + s


def _small_object(pairs):
    """Hand-build a SMALL_OBJECT document for scalar values (test encoder)."""
    count = len(pairs)
    key_bytes = b"".join(k.encode() for k, _ in pairs)
    key_entries = b""
    koff = 4 + count * 4 + count * 3
    for k, _ in pairs:
        key_entries += struct.pack("<HH", koff, len(k.encode()))
        koff += len(k.encode())
    value_entries = b""
    tail = b""
    voff = 4 + count * 4 + count * 3 + len(key_bytes)
    for _, v in pairs:
        if v is None:
            value_entries += bytes([0x04]) + struct.pack("<H", 0x00)
        elif isinstance(v, bool):
            value_entries += bytes([0x04]) + struct.pack("<H", 0x01 if v else 0x02)
        elif isinstance(v, int) and -32768 <= v < 32768:
            value_entries += bytes([0x05]) + struct.pack("<h", v)
        elif isinstance(v, float):
            value_entries += bytes([0x0B]) + struct.pack("<H", voff)
            tail += struct.pack("<d", v)
            voff += 8
        elif isinstance(v, str):
            enc = _enc_string(v.encode())
            value_entries += bytes([0x0C]) + struct.pack("<H", voff)
            tail += enc
            voff += len(enc)
        else:
            raise AssertionError(v)
    body = (
        struct.pack("<HH", count, 0)  # size field unused by the parser
        + key_entries
        + value_entries
        + key_bytes
        + tail
    )
    return bytes([0x00]) + body


def test_small_object_scalars_roundtrip():
    doc = _small_object(
        [("i", 42), ("neg", -7), ("s", "hi"), ("b", True), ("n", None), ("d", 2.5)]
    )
    assert json.loads(parse_json_binary(doc)) == {
        "i": 42, "neg": -7, "s": "hi", "b": True, "n": None, "d": 2.5,
    }


def test_int64_and_large_tags():
    v = bytes([0x09]) + struct.pack("<q", -(1 << 40))
    assert parse_json_value(v) == -(1 << 40)
    v = bytes([0x0A]) + struct.pack("<Q", (1 << 63) + 5)
    assert parse_json_value(v) == (1 << 63) + 5


def test_json_column_through_codec_path():
    """A JSON column with binary_json meta decodes blob payloads through the
    binary grammar inside decode_typed_block."""
    spec = [ColumnSpec("j", JSON, {"len_bytes": 2, "binary_json": True})]
    doc = bytes.fromhex("0202000C000501000C0A000161")  # [1,"a"]
    payload = pd.Series(
        [bytes([0]) + struct.pack("<H", len(doc)) + doc, bytes([1])]  # row2: NULL
    )
    out = decode_typed_block(spec, payload)
    assert out["j"][0] == '[1,"a"]' and out["j"][1] is None


def test_unknown_tag_raises():
    with pytest.raises(ValueError):
        parse_json_value(bytes([0x77, 0x00]))


# --- opaque temporals -------------------------------------------------------
# MySQL packs JSON temporal scalars as OPAQUE(column-type, 8-byte LE int64)
# where the int64 is TIME_to_longlong_packed output: bit-packed fields in
# raw>>24 and microseconds in the low 24 bits (JsonBinaryParser.java:715-806).


def _opaque(ctype: int, raw: int) -> bytes:
    return bytes([0x0F, ctype, 8]) + struct.pack("<q", raw)


def _dt_packed(year, month, day, hour=0, minute=0, sec=0, micros=0) -> int:
    ym = year * 13 + month
    word = (ym << 22) | (day << 17) | (hour << 12) | (minute << 6) | sec
    return (word << 24) | micros


def _time_packed(hour, minute, sec, micros=0, negative=False) -> int:
    raw = (((hour << 12) | (minute << 6) | sec) << 24) | micros
    return -raw if negative else raw


def test_opaque_date():
    v = _opaque(10, _dt_packed(2023, 7, 15))  # DATE=10
    assert parse_json_value(v) == "2023-07-15"


def test_opaque_datetime_micros_trimmed():
    # micros 789000 renders ".789": 6-digit pad then trailing-zero trim
    v = _opaque(18, _dt_packed(2023, 7, 15, 12, 34, 56, 789000))  # DATETIME_V2
    assert parse_json_value(v) == "2023-07-15 12:34:56.789"
    v = _opaque(12, _dt_packed(1999, 12, 31, 23, 59, 59))  # DATETIME, no fsp
    assert parse_json_value(v) == "1999-12-31 23:59:59"


def test_opaque_timestamp_routes_as_datetime():
    # parseOpaque dispatch sends TIMESTAMP/TIMESTAMP_V2 to parseDatetime
    # (JsonBinaryParser.java:678-683)
    for ctype in (7, 17):
        v = _opaque(ctype, _dt_packed(2020, 1, 2, 3, 4, 5, 60000))
        assert parse_json_value(v) == "2020-01-02 03:04:05.06"


def test_opaque_time_positive_and_negative():
    v = _opaque(11, _time_packed(13, 14, 15, 500000))  # TIME=11
    assert parse_json_value(v) == "13:14:15.5"
    v = _opaque(19, _time_packed(0, 0, 1, negative=True))  # TIME_V2=19
    assert parse_json_value(v) == "-00:00:01"
    v = _opaque(11, _time_packed(838, 59, 59, negative=True))  # MySQL min TIME
    assert parse_json_value(v) == "-838:59:59"


def test_opaque_unknown_type_base64():
    # non-temporal opaque renders base64, as valueOpaque does
    # (JsonStringFormatter.java:199-203)
    v = bytes([0x0F, 254, 3]) + b"abc"  # STRING column type, arbitrary bytes
    import base64

    assert parse_json_value(v) == base64.b64encode(b"abc").decode()
