"""MySQL binary-JSON decoder — SURVEY §2.1 S10.

MySQL stores JSON columns (and emits them in the row-based binlog) in a
binary tree format; the reference renders it back to JSON text with a
988-LoC recursive parser (``parser/shyiko/JsonBinaryParser.java:167-262``,
value-type tags ``ValueType.java:50-65``). This module implements the same
grammar:

  tag  meaning                       layout
  0x00 SMALL_OBJECT   count:u16 size:u16, key entries (off:u16 len:u16),
                      value entries (tag:u8 + u16 offset-or-inlined), keys,
                      values — offsets relative to the start of count
  0x01 LARGE_OBJECT   same with u32 count/size/offsets
  0x02 SMALL_ARRAY    count:u16 size:u16, value entries, values
  0x03 LARGE_ARRAY    u32 variant
  0x04 LITERAL        0x00 null / 0x01 true / 0x02 false
  0x05/0x06 INT16/UINT16, 0x07/0x08 INT32/UINT32, 0x09/0x0a INT64/UINT64
  0x0b DOUBLE (IEEE LE)
  0x0c STRING         varlen length (7-bit continuation) + utf8 bytes
  0x0f OPAQUE         column-type byte + varlen data (NEWDECIMAL packed BCD,
                      DATE/TIME/DATETIME bit-packed — decoded via the S9
                      codecs in mysql_codecs.py)

In the small format, LITERAL/INT16/UINT16 values are inlined in the 2-byte
offset slot; the large format additionally inlines INT32/UINT32.

Decode is inherently per-value recursive (as in the reference); JSON columns
are not on the engine's bulk hot path — decoded values surface as StringType
JSON text queried via ``get_json_object``/``from_json`` (SURVEY §1.2).
"""

from __future__ import annotations

import json
import struct
from decimal import Decimal

SMALL_OBJECT, LARGE_OBJECT, SMALL_ARRAY, LARGE_ARRAY = 0x00, 0x01, 0x02, 0x03
LITERAL, INT16, UINT16, INT32, UINT32 = 0x04, 0x05, 0x06, 0x07, 0x08
INT64, UINT64, DOUBLE, STRING, OPAQUE = 0x09, 0x0A, 0x0B, 0x0C, 0x0F


def _varlen(buf: bytes, pos: int) -> tuple[int, int]:
    """Variable-length unsigned int: 7 bits per byte, high bit = continue."""
    length = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            return length, pos
        shift += 7


def _parse_scalar(tag: int, buf: bytes, pos: int):
    if tag == LITERAL:
        return {0x00: None, 0x01: True, 0x02: False}[buf[pos]]
    if tag == INT16:
        return struct.unpack_from("<h", buf, pos)[0]
    if tag == UINT16:
        return struct.unpack_from("<H", buf, pos)[0]
    if tag == INT32:
        return struct.unpack_from("<i", buf, pos)[0]
    if tag == UINT32:
        return struct.unpack_from("<I", buf, pos)[0]
    if tag == INT64:
        return struct.unpack_from("<q", buf, pos)[0]
    if tag == UINT64:
        return struct.unpack_from("<Q", buf, pos)[0]
    if tag == DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0]
    if tag == STRING:
        n, p = _varlen(buf, pos)
        return buf[p : p + n].decode("utf-8")
    if tag == OPAQUE:
        return _parse_opaque(buf, pos)
    raise ValueError(f"unknown JSON value tag 0x{tag:02x}")


def _micros_suffix(micros: int) -> str:
    """Fractional-seconds rendering: 6-digit zero-padded, trailing zeros
    trimmed, omitted entirely when 0 (JsonStringFormatter.appendTime +
    appendSixDigitUnsignedInt(trimTrailingZeros=true),
    JsonStringFormatter.java:315-325)."""
    if micros == 0:
        return ""
    return "." + f"{micros:06d}".rstrip("0")


def _parse_opaque(buf: bytes, pos: int):
    """Opaque custom types: column-type byte + varlen payload.

    Temporal values are stored as one 8-byte *little-endian* signed int64
    (MySQL ``Json_datetime::to_packed`` / ``TIME_to_longlong_packed``):
    ``value = raw >> 24`` holds the DATETIME_V2-style bit-packed fields and
    the low 24 bits hold microseconds (JsonBinaryParser.java:715-806 —
    parseDate/parseTime/parseDatetime all read ``readInt64()`` LE). This is
    NOT the 5-byte big-endian column wire format used in row images.
    TIMESTAMP/TIMESTAMP_V2 route through the datetime renderer, as in the
    reference's parseOpaque dispatch (JsonBinaryParser.java:671-683).
    """
    import pandas as pd

    from .mysql_codecs import (
        DATE, DATETIME, DATETIME_V2, NEWDECIMAL, TIME, TIME_V2,
        TIMESTAMP, TIMESTAMP_V2, ColumnSpec, decode_typed_block,
    )

    ctype = buf[pos]
    n, p = _varlen(buf, pos + 1)
    data = buf[p : p + n]
    if ctype == NEWDECIMAL:
        precision, scale = data[0], data[1]
        spec = [ColumnSpec("v", NEWDECIMAL, {"precision": precision, "scale": scale})]
        out = decode_typed_block(spec, pd.Series([bytes([0]) + data[2:]]))
        return out["v"][0]
    if ctype in (DATE, DATETIME, TIME, TIME_V2, DATETIME_V2, TIMESTAMP, TIMESTAMP_V2):
        raw = struct.unpack("<q", data[:8])[0]
        value = raw >> 24  # arithmetic shift: sign (bit 63..) preserved
        if ctype in (TIME, TIME_V2):
            # Negative TIME packs as the negation of the positive packed
            # word (my_time.c TIME_to_longlong_packed); unpack the absolute
            # value and carry the sign into the rendering, as the
            # reference's valueTime does (JsonStringFormatter.java:182-190).
            negative = value < 0
            if negative:
                raw = -raw
                value = raw >> 24
            hour = (value >> 12) & 0x3FF  # 10 bits
            minute = (value >> 6) & 0x3F
            sec = value & 0x3F
            micros = raw & 0xFFFFFF
            sign = "-" if negative else ""
            return f"{sign}{hour:02d}:{minute:02d}:{sec:02d}{_micros_suffix(micros)}"
        # DATE / DATETIME / TIMESTAMP family: sign bit always 1 (value >= 0)
        year_month = (value >> 22) & 0x1FFFF  # 17 bits
        year, month = year_month // 13, year_month % 13
        day = (value >> 17) & 0x1F
        if ctype == DATE:
            return f"{year:04d}-{month:02d}-{day:02d}"
        hour = (value >> 12) & 0x1F
        minute = (value >> 6) & 0x3F
        sec = value & 0x3F
        micros = raw & 0xFFFFFF
        return (
            f"{year:04d}-{month:02d}-{day:02d} "
            f"{hour:02d}:{minute:02d}:{sec:02d}{_micros_suffix(micros)}"
        )
    # unknown custom type: base64, matching the reference's valueOpaque
    # (JsonStringFormatter.java:199-203 printBase64Binary)
    import base64

    return base64.b64encode(data).decode("ascii")


def parse_json_value(buf: bytes, tag: int | None = None, pos: int = 0):
    """Parse one binary-JSON value → Python object."""
    if tag is None:
        tag = buf[pos]
        pos += 1
    if tag in (SMALL_OBJECT, LARGE_OBJECT, SMALL_ARRAY, LARGE_ARRAY):
        return _parse_container(tag, buf, pos)
    return _parse_scalar(tag, buf, pos)


def _parse_container(tag: int, buf: bytes, base: int):
    large = tag in (LARGE_OBJECT, LARGE_ARRAY)
    is_object = tag in (SMALL_OBJECT, LARGE_OBJECT)
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    count = struct.unpack_from(fmt, buf, base)[0]
    pos = base + 2 * w  # skip count + size

    keys: list[str] = []
    if is_object:
        for i in range(count):
            koff = struct.unpack_from(fmt, buf, pos + i * (w + 2))[0]
            klen = struct.unpack_from("<H", buf, pos + i * (w + 2) + w)[0]
            keys.append(buf[base + koff : base + koff + klen].decode("utf-8"))
        pos += count * (w + 2)

    values = []
    inline_ok = {LITERAL, INT16, UINT16} | ({INT32, UINT32} if large else set())
    for i in range(count):
        vtag = buf[pos + i * (w + 1)]
        slot = pos + i * (w + 1) + 1
        if vtag in inline_ok:
            values.append(_parse_scalar(vtag, buf, slot))
        else:
            voff = struct.unpack_from(fmt, buf, slot)[0]
            values.append(parse_json_value(buf, vtag, base + voff))
    return dict(zip(keys, values)) if is_object else values


class _JsonEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, Decimal):
            return float(o)
        return super().default(o)


def parse_json_binary(buf: bytes) -> str:
    """Binary JSON document → compact JSON text (the reference's
    ``JsonBinaryParser.parseAsString`` + ``JsonStringFormatter`` rendering:
    no whitespace, keys in storage order)."""
    return json.dumps(
        parse_json_value(buf), separators=(",", ":"), ensure_ascii=False,
        cls=_JsonEncoder,
    )


# --------------------------------------------------------------- encoder
def _enc_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(v) -> tuple[int, bytes, bool]:
    """→ (tag, data_without_tag, inlineable_in_small_format)."""
    if v is None:
        return LITERAL, b"\x00", True
    if v is True:
        return LITERAL, b"\x01", True
    if v is False:
        return LITERAL, b"\x02", True
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return INT16, struct.pack("<h", v), True
        if -(1 << 31) <= v < (1 << 31):
            return INT32, struct.pack("<i", v), False
        return INT64, struct.pack("<q", v), False
    if isinstance(v, float):
        return DOUBLE, struct.pack("<d", v), False
    if isinstance(v, str):
        b = v.encode("utf-8")
        return STRING, _enc_varlen(len(b)) + b, False
    if isinstance(v, dict):
        return SMALL_OBJECT, _encode_container(v), False
    if isinstance(v, (list, tuple)):
        return SMALL_ARRAY, _encode_container(list(v)), False
    raise TypeError(f"cannot encode {type(v).__name__} as binary JSON")


def _encode_container(v) -> bytes:
    """Small-format container body (count/size/entries/keys/values) —
    offsets relative to the container base, inline slots per the grammar
    above. Raises if the small u16 offsets overflow (64 KiB documents are
    not what the synthetic feeds need; MySQL would switch to the large
    format)."""
    is_object = isinstance(v, dict)
    items = list(v.items()) if is_object else [(None, x) for x in v]
    count = len(items)
    key_bytes = [str(k).encode("utf-8") for k, _ in items] if is_object else []
    encoded = [_encode_value(x) for _, x in items]

    head = 4  # count:u16 + size:u16
    key_entries = count * 4 if is_object else 0
    val_entries = count * 3
    pos = head + key_entries + val_entries
    key_offs = []
    for kb in key_bytes:
        key_offs.append(pos)
        pos += len(kb)
    val_offs = []
    for tag, data, inline in encoded:
        if inline:
            val_offs.append(None)
        else:
            val_offs.append(pos)
            pos += len(data)
    size = pos
    if size > 0xFFFF:
        raise ValueError("document too large for the small JSON format")

    out = bytearray()
    out += struct.pack("<HH", count, size)
    for kb, ko in zip(key_bytes, key_offs):
        out += struct.pack("<HH", ko, len(kb))
    for (tag, data, inline), vo in zip(encoded, val_offs):
        out.append(tag)
        if inline:
            out += data.ljust(2, b"\x00")
        else:
            out += struct.pack("<H", vo)
    for kb in key_bytes:
        out += kb
    for (tag, data, inline), vo in zip(encoded, val_offs):
        if not inline:
            out += data
    return bytes(out)


def encode_json_binary(value) -> bytes:
    """Python value → MySQL binary JSON (type tag + data), the inverse of
    :func:`parse_json_binary` over the small format. The reference has no
    encoder (it only reads the binlog); this exists to synthesize wire
    fixtures and partial-JSON diff values (``Json_diff_vector`` values are
    encoded exactly like column documents, json_diff.cc write_binary)."""
    tag, data, inline = _encode_value(value)
    if inline and tag == INT16:
        # top level has no inline slot — promote to the 4-byte form
        return bytes([INT32]) + struct.pack("<i", int(value))
    return bytes([tag]) + data
