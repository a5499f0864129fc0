"""Wire-faithful binlog packet parsing (S7/S8/S11).

Golden vectors are the reference's OWN captured MySQL packets
(``BinlogParserSpec.java``): the 19-byte header, two TABLE_MAP bodies, and
three EXT_WRITE_ROWS bodies (binary JSON + longtext). A synthetic
multi-type packet (hand-encoded per the wire layout) covers int/varchar/
decimal/date/null columns and the UPDATE old/new pairing.
"""

import datetime as dt
from decimal import Decimal

import pytest

from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_UPDATE_ROWS, EXT_WRITE_ROWS, ROTATE_EVENT, TABLE_MAP_EVENT, XID_EVENT,
    parse_event_body, parse_event_header, parse_table_map,
)

TM_JSON = "FA0000000000010015636170747572655F62696E6C6F675F6576656E74730003666F6F0001F5010401"
ROW_JSON = "FA00000000000100020001FFFE0D0000000202000C000501000C0A000161"


def test_header_golden():
    # BinlogParserSpec.java readHeader
    h = parse_event_header(bytes.fromhex("80AD835A1E0100000028000000BA6B00000000"))
    assert h.type_code == EXT_WRITE_ROWS
    assert h.server_id == 1 and h.flags == 0 and h.header_length == 19


def test_table_map_golden():
    tm = parse_table_map(bytes.fromhex(TM_JSON))
    assert tm.table_id == 0xFA
    assert tm.schema_name == "capture_binlog_events" and tm.table_name == "foo"
    assert list(tm.column_types) == [0xF5] and tm.column_metadata == [4]


def test_insert_row_json_golden():
    # BinlogParserSpec.java insertRow / complexArrayJson: '[1, "a"]'
    maps = {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(bytes.fromhex(ROW_JSON), EXT_WRITE_ROWS, maps)
    assert ev.kind == "insert" and ev.new_rows == [['[1,"a"]']]


def test_longtext_golden():
    # BinlogParserSpec.java multiLongtext: 'foobarbazqux'
    maps = {}
    parse_event_body(
        bytes.fromhex(
            "1F0200000000010015636170747572655F62696E6C6F675F6576656E74730003666F6F0001FC010401"
        ),
        TABLE_MAP_EVENT,
        maps,
    )
    ev = parse_event_body(
        bytes.fromhex("1F02000000000100020001FFFE0C000000666F6F62617262617A717578"),
        EXT_WRITE_ROWS,
        maps,
    )
    assert ev.new_rows == [[b"foobarbazqux"]]


def test_nested_json_golden():
    maps = {}
    parse_event_body(
        bytes.fromhex(
            "210200000000010015636170747572655F62696E6C6F675F6576656E74730003666F6F0001F5010401"
        ),
        TABLE_MAP_EVENT,
        maps,
    )
    ev = parse_event_body(
        bytes.fromhex(
            "2102000000000100020001FFFE14000000020100130000070001000C000B00010005010061"
        ),
        EXT_WRITE_ROWS,
        maps,
    )
    assert ev.new_rows == [['[{"a":1}]']]


def test_xid_clears_table_maps():
    maps = {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    assert maps
    assert parse_event_body(b"\x00" * 8, XID_EVENT, maps) is None
    assert not maps  # EventBodyParser.java:34-36


def test_rotate():
    body = (4).to_bytes(8, "little") + b"mysql-bin.000042"
    ev = parse_event_body(body, ROTATE_EVENT, {})
    assert ev.position == 4 and ev.filename == "mysql-bin.000042"


# -------------------------------------------- synthetic multi-type packets
def _synthetic_table_map() -> bytes:
    # table 7: cols = LONG, VARCHAR(20), NEWDECIMAL(8,2), DATE
    body = (7).to_bytes(6, "little") + b"\x00\x00"
    body += bytes([1]) + b"s\x00"  # schema "s"
    body += bytes([1]) + b"t\x00"  # table "t"
    body += bytes([4])  # packed column count
    body += bytes([0x03, 0x0F, 0xF6, 0x0A])  # types
    body += bytes([5])  # metadata block length (packed)
    body += (20).to_bytes(2, "little")  # VARCHAR max len
    body += bytes([8, 2])  # decimal precision, scale (LE: low=precision)
    body += bytes([0x0F])  # nullability bitset (unused)
    return body


def _row(i: int, name: str | None, amt: Decimal | None, d: dt.date) -> bytes:
    nulls = (0 if name is not None else 2) | (0 if amt is not None else 4)
    out = bytes([nulls])
    out += i.to_bytes(4, "little", signed=True)
    if name is not None:
        b = name.encode()
        out += bytes([len(b)]) + b
    if amt is not None:
        # DECIMAL(8,2): int part 6 digits → 3 bytes BE, frac 2 digits → 1 byte
        unscaled = int(amt.scaleb(2))
        ip, fp = divmod(abs(unscaled), 100)
        raw = bytearray(ip.to_bytes(3, "big") + fp.to_bytes(1, "big"))
        raw[0] |= 0x80
        if unscaled < 0:
            for k in range(len(raw)):
                raw[k] ^= 0xFF
        out += bytes(raw)
    out += (d.year * 512 + d.month * 32 + d.day).to_bytes(3, "little")
    return out


def _rows_body(rows: list[bytes], n_images: int = 1) -> bytes:
    body = (7).to_bytes(6, "little") + b"\x00\x00"
    body += (2).to_bytes(2, "little")  # extra-info length (just itself)
    body += bytes([4])  # packed column count
    body += bytes([0x0F]) * n_images  # included-columns bitmap(s)
    for r in rows:
        body += r
    return body


def test_synthetic_write_rows_multi_type():
    maps = {}
    parse_event_body(_synthetic_table_map(), TABLE_MAP_EVENT, maps)
    rows = [
        _row(42, "alice", Decimal("123456.78"), dt.date(2026, 8, 17)),
        _row(-7, None, Decimal("-0.05"), dt.date(1999, 1, 2)),
    ]
    ev = parse_event_body(_rows_body(rows), EXT_WRITE_ROWS, maps)
    assert ev.schema_name == "s" and ev.table_name == "t"
    assert ev.new_rows[0] == [42, "alice", Decimal("123456.78"), dt.date(2026, 8, 17)]
    assert ev.new_rows[1] == [-7, None, Decimal("-0.05"), dt.date(1999, 1, 2)]


def test_synthetic_update_rows_old_new_pairing():
    maps = {}
    parse_event_body(_synthetic_table_map(), TABLE_MAP_EVENT, maps)
    old = _row(1, "before", Decimal("1.00"), dt.date(2020, 1, 1))
    new = _row(1, "after", Decimal("2.00"), dt.date(2020, 1, 2))
    ev = parse_event_body(_rows_body([old, new], n_images=2), EXT_UPDATE_ROWS, maps)
    assert ev.kind == "update"
    assert ev.old_rows == [[1, "before", Decimal("1.00"), dt.date(2020, 1, 1)]]
    assert ev.new_rows == [[1, "after", Decimal("2.00"), dt.date(2020, 1, 2)]]


def test_missing_table_map_raises():
    with pytest.raises(ValueError, match="no TABLE_MAP"):
        parse_event_body(_rows_body([]), EXT_WRITE_ROWS, {})


def test_packet_stream_to_lake_final_state(spark, tmp_path):
    """Wire → lake end-to-end: a synthetic packet stream (TABLE_MAP, insert,
    update, delete across two keys) replays through packets_to_changelog and
    merges into a LakeTable; final state follows last-image-wins."""
    import pyspark.sql.types as T

    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.sources.binlog_packets import (
        EXT_DELETE_ROWS, packets_to_changelog,
    )

    packets = [
        (TABLE_MAP_EVENT, _synthetic_table_map()),
        (EXT_WRITE_ROWS, _rows_body([
            _row(1, "alice", Decimal("10.00"), dt.date(2026, 1, 1)),
            _row(2, "bob", Decimal("20.00"), dt.date(2026, 1, 2)),
        ])),
        (EXT_UPDATE_ROWS, _rows_body([
            _row(1, "alice", Decimal("10.00"), dt.date(2026, 1, 1)),
            _row(1, "alice2", Decimal("11.00"), dt.date(2026, 1, 3)),
        ], n_images=2)),
        (EXT_DELETE_ROWS, _rows_body([
            _row(2, "bob", Decimal("20.00"), dt.date(2026, 1, 2)),
        ])),
    ]
    cl = packets_to_changelog(packets, "s", "t", ["id", "name", "amt", "d"])
    assert cl["op"].tolist() == ["I", "I", "U", "D"]

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("amt", T.DecimalType(8, 2), True),
        T.StructField("d", T.DateType(), True),
    ])
    tbl = LakeTable.create(str(tmp_path / "tbl"), schema, ["id"], n_buckets=4)
    tbl.merge(spark, spark.createDataFrame(cl), "wire")
    got = tbl.read(spark).orderBy("id").collect()
    assert len(got) == 1
    assert got[0]["id"] == 1 and got[0]["name"] == "alice2"
    assert got[0]["amt"] == Decimal("11.00") and str(got[0]["d"]) == "2026-01-03"


def test_parse_value_temporal_wire_paths():
    """Direct wire decode of the temporal codecs, including the legacy
    pre-5.6 trio (RowParser.java:234-244, 270-279, 296-313) and negative
    TIME_V2 (biased fixed-point, MySQL my_time_packed_to_binary)."""
    from mysql_secure_agent_spark.sources.binlog_packets import (
        BinlogReader, _parse_value,
    )

    # legacy TIME 0x0B: 123456 packed decimal, LE
    r = BinlogReader((123456).to_bytes(3, "little"))
    assert _parse_value(r, 0x0B, 0, 0) == "12:34:56"
    r = BinlogReader((-8385959 & 0xFFFFFF).to_bytes(3, "little"))
    assert _parse_value(r, 0x0B, 0, 0) == "-838:59:59"

    # legacy TIMESTAMP 0x07: LE epoch seconds
    r = BinlogReader((86400 + 3723).to_bytes(4, "little"))
    assert _parse_value(r, 0x07, 0, 0) == dt.datetime(1970, 1, 2, 1, 2, 3)

    # legacy DATETIME 0x0C: packed decimal YYYYMMDDHHMMSS, LE
    r = BinlogReader((19991231235959).to_bytes(8, "little"))
    assert _parse_value(r, 0x0C, 0, 0) == dt.datetime(1999, 12, 31, 23, 59, 59)
    r = BinlogReader((0).to_bytes(8, "little"))
    assert _parse_value(r, 0x0C, 0, 0) is None  # zero-date

    # TIME_V2 0x13 fsp=6: positive keeps the reference layout; negative is
    # the negated packed word under the bias
    word = (1 << 23) | (12 << 12) | (34 << 6) | 56
    r = BinlogReader(word.to_bytes(3, "big") + (789012).to_bytes(3, "big"))
    assert _parse_value(r, 0x13, 6, 0) == "12:34:56.789012"
    packed = (((838 << 12) | (59 << 6) | 59) << 24) | 999999
    stored = (0x800000 << 24) - packed
    r = BinlogReader(stored.to_bytes(6, "big"))
    assert _parse_value(r, 0x13, 6, 0) == "-838:59:59.999999"
    # fsp=0 negative
    r = BinlogReader((0x800000 - ((1 << 12) | (2 << 6) | 3)).to_bytes(3, "big"))
    assert _parse_value(r, 0x13, 0, 0) == "-01:02:03"


# -------------------------------------------------------------- CRC32 tail
def test_checksummed_event_strips_and_parses_identically():
    """binlog_checksum=CRC32 (the 5.6+ default) appends 4 bytes per event;
    the parser must strip them before the rows loop (BinlogClient.java:242)
    or they'd be misparsed as a row image."""
    import zlib

    maps, maps2 = {}, {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps2)
    body = bytes.fromhex(ROW_JSON)
    header = bytes.fromhex("80AD835A1E0100000028000000BA6B00000000")
    plain = parse_event_body(body, EXT_WRITE_ROWS, maps)
    crc = zlib.crc32(header + body).to_bytes(4, "little")
    checked = parse_event_body(
        body + crc, EXT_WRITE_ROWS, maps2, checksum_length=4,
        verify_checksum=True, header_bytes=header,
    )
    assert checked.new_rows == plain.new_rows
    assert checked.included_columns == plain.included_columns


def test_checksum_mismatch_raises():
    maps = {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    body = bytes.fromhex(ROW_JSON)
    header = bytes.fromhex("80AD835A1E0100000028000000BA6B00000000")
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        parse_event_body(
            body + b"\x00\x00\x00\x00", EXT_WRITE_ROWS, maps,
            checksum_length=4, verify_checksum=True, header_bytes=header,
        )


def test_verify_without_header_is_refused():
    """MySQL checksums header+body; verifying body-only would spuriously
    fail every valid event — the misuse must raise, not default to b""."""
    maps = {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    body = bytes.fromhex(ROW_JSON)
    with pytest.raises(ValueError, match="requires header_bytes"):
        parse_event_body(
            body + b"\x00\x00\x00\x00", EXT_WRITE_ROWS, maps,
            checksum_length=4, verify_checksum=True,
        )


def test_checksum_covers_header_when_given():
    import zlib

    maps = {}
    parse_event_body(bytes.fromhex(TM_JSON), TABLE_MAP_EVENT, maps)
    body = bytes.fromhex(ROW_JSON)
    header = bytes.fromhex("80AD835A1E0100000028000000BA6B00000000")
    crc = zlib.crc32(header + body).to_bytes(4, "little")
    ev = parse_event_body(
        body + crc, EXT_WRITE_ROWS, maps,
        checksum_length=4, verify_checksum=True, header_bytes=header,
    )
    assert ev is not None and len(ev.new_rows) == 1


def _fde(server_version: bytes, alg: int | None) -> bytes:
    body = (4).to_bytes(2, "little") + server_version.ljust(50, b"\x00")
    body += (0).to_bytes(4, "little") + bytes([19])
    body += bytes(range(1, 41))  # post-header lengths (content irrelevant)
    if alg is not None:
        body += bytes([alg]) + b"\x00\x00\x00\x00"  # alg + FDE's own CRC
    return body


def test_format_description_announces_crc32():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        parse_format_description,
    )

    v, n = parse_format_description(_fde(b"5.7.33-log", 1))
    assert (v, n) == ("5.7.33-log", 4)
    v, n = parse_format_description(_fde(b"8.0.32", 0))
    assert (v, n) == ("8.0.32", 0)
    # pre-5.6.1 servers have no alg byte at all
    v, n = parse_format_description(_fde(b"5.5.8-log", None))
    assert (v, n) == ("5.5.8-log", 0)
    with pytest.raises(ValueError, match="unknown binlog checksum"):
        parse_format_description(_fde(b"5.7.33", 9))


def test_packets_to_changelog_self_configures_checksum():
    """A stream opening with a CRC32-announcing FDE parses checksummed
    events without the caller passing checksum_length."""
    import zlib

    from mysql_secure_agent_spark.sources.binlog_packets import (
        FORMAT_DESCRIPTION_EVENT, packets_to_changelog,
    )

    tm = _synthetic_table_map()
    row = _rows_body([_row(1, "a", Decimal("3.50"), dt.date(2024, 5, 1))])
    crc = lambda b: b + zlib.crc32(b).to_bytes(4, "little")  # noqa: E731
    packets = [
        (FORMAT_DESCRIPTION_EVENT, _fde(b"5.7.33-log", 1)),
        (TABLE_MAP_EVENT, crc(tm)),
        (EXT_WRITE_ROWS, crc(row)),
    ]
    df = packets_to_changelog(packets, "s", "t", ["id", "name", "amount", "d"])
    assert len(df) == 1 and df.iloc[0]["op"] == "I" and df.iloc[0]["id"] == 1


# ------------------------------------------------------------- GTID family
# Layouts per the public MySQL source (libbinlogevents control_events:
# Gtid_event, Previous_gtids_event, Heartbeat_event). The reference routes
# these types to its discard branch (BinlogClient.java:191-195); the engine
# decodes them because GtidSet is its native multi-source resume coordinate.

SID = bytes.fromhex("3E11FA4771CA11E19E33C80AA9429562")  # uuid from the
# MySQL replication docs' canonical GTID example 3E11FA47-71CA-11E1-...


def _gtid_body(gno, flags=1, lc=None, sn=None):
    b = bytes([flags]) + SID + gno.to_bytes(8, "little")
    if lc is not None:
        b += b"\x02" + lc.to_bytes(8, "little") + sn.to_bytes(8, "little")
    return b


def test_gtid_event_decodes_sid_gno_and_logical_clock():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        GTID_EVENT, Gtid,
    )

    ev = parse_event_body(_gtid_body(23, lc=11, sn=12), GTID_EVENT, {})
    assert isinstance(ev, Gtid)
    assert ev.sid == "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert ev.gno == 23 and ev.flags == 1
    assert ev.last_committed == 11 and ev.sequence_number == 12
    # 5.6-era body: no logical-clock block
    ev = parse_event_body(_gtid_body(7), GTID_EVENT, {})
    assert ev.gno == 7 and ev.last_committed is None


def test_gtid_trailing_fields_ignored_and_checksum_stripped():
    import zlib

    from mysql_secure_agent_spark.sources.binlog_packets import (
        ANONYMOUS_GTID_EVENT, Gtid,
    )

    # 5.8+ servers append immediate_commit_timestamp etc. after the clock
    # pair — an older-replica decode ignores the tail; CRC32 strip composes
    body = _gtid_body(99, lc=1, sn=2) + b"\x00" * 11
    hdr = b"\x00" * 19
    pkt = body + zlib.crc32(hdr + body).to_bytes(4, "little")
    ev = parse_event_body(
        pkt, ANONYMOUS_GTID_EVENT, {}, checksum_length=4,
        verify_checksum=True, header_bytes=hdr,
    )
    assert isinstance(ev, Gtid) and ev.gno == 99 and ev.sequence_number == 2


def test_previous_gtids_intervals_inclusive_normalization():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        PREVIOUS_GTIDS_EVENT, PreviousGtids,
    )

    sid2 = bytes(range(16))
    body = (2).to_bytes(8, "little")
    # sid 1: [1,6) and [8,9) — prints 1-5:8
    body += SID + (2).to_bytes(8, "little")
    body += (1).to_bytes(8, "little") + (6).to_bytes(8, "little")
    body += (8).to_bytes(8, "little") + (9).to_bytes(8, "little")
    # sid 2: [3,11) — prints 3-10
    body += sid2 + (1).to_bytes(8, "little")
    body += (3).to_bytes(8, "little") + (11).to_bytes(8, "little")
    ev = parse_event_body(body, PREVIOUS_GTIDS_EVENT, {})
    assert isinstance(ev, PreviousGtids)
    assert ev.intervals["3e11fa47-71ca-11e1-9e33-c80aa9429562"] == [
        (1, 5),
        (8, 8),
    ]
    assert ev.intervals["00010203-0405-0607-0809-0a0b0c0d0e0f"] == [(3, 10)]
    assert ev.to_string() == (
        "00010203-0405-0607-0809-0a0b0c0d0e0f:3-10,"
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5:8"
    )


def test_previous_gtids_to_string_canonical():
    from mysql_secure_agent_spark.sources.binlog_packets import PreviousGtids

    pg = PreviousGtids(
        {"bbb": [(3, 10)], "aaa": [(1, 5), (8, 8)]}
    )
    assert pg.to_string() == "aaa:1-5:8,bbb:3-10"


def test_heartbeat_carries_log_name():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        HEARTBEAT_EVENT, Heartbeat,
    )

    ev = parse_event_body(b"mysql-bin.000042", HEARTBEAT_EVENT, {})
    assert isinstance(ev, Heartbeat) and ev.log_name == "mysql-bin.000042"


# ---------------------------------------------------- rows-query / txn payload
def test_rows_query_carries_statement_text():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        ROWS_QUERY_EVENT, RowsQuery,
    )

    sql = "UPDATE s.t SET name='x' WHERE id=1"
    body = bytes([min(len(sql), 255)]) + sql.encode()
    ev = parse_event_body(body, ROWS_QUERY_EVENT, {})
    assert isinstance(ev, RowsQuery) and ev.query == sql


def _packed(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def _inner_event(type_code: int, body: bytes) -> bytes:
    import struct as _struct

    hdr = _struct.pack("<IBIIIH", 0, type_code, 1, 19 + len(body), 0, 0)
    return hdr + body


def _payload_event(inner: bytes, compression: int = 0xFF,
                   uncompressed: int | None = None) -> bytes:
    # TLV header: (2=compression)(1=payload size)[3=uncompressed], END_MARK=0
    val_c = _packed(compression)
    val_s = _packed(len(inner))
    out = _packed(2) + _packed(len(val_c)) + val_c
    out += _packed(1) + _packed(len(val_s)) + val_s
    if uncompressed is not None:
        val_u = _packed(uncompressed)
        out += _packed(3) + _packed(len(val_u)) + val_u
    return out + _packed(0) + inner


def test_transaction_payload_expands_wrapped_transaction():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        TRANSACTION_PAYLOAD_EVENT, TransactionPayload, packets_to_changelog,
    )

    # a whole txn — TABLE_MAP + WRITE_ROWS — wrapped in one container event
    row = _row(9, "wrapped", Decimal("5.25"), dt.date(2026, 3, 1))
    inner = _inner_event(TABLE_MAP_EVENT, _synthetic_table_map())
    inner += _inner_event(EXT_WRITE_ROWS, _rows_body([row]))
    body = _payload_event(inner, uncompressed=len(inner))

    tp = parse_event_body(body, TRANSACTION_PAYLOAD_EVENT, {})
    assert isinstance(tp, TransactionPayload)
    assert tp.compression_type == 0xFF and len(tp.events) == 2

    df = packets_to_changelog(
        [(TRANSACTION_PAYLOAD_EVENT, body)], "s", "t",
        ["id", "name", "amt", "d"],
    )
    assert df.to_dict("records") == [
        {"op": "I", "id": 9, "name": "wrapped", "amt": Decimal("5.25"),
         "d": dt.date(2026, 3, 1), "source_lsn": 1}
    ]


def test_transaction_payload_guards():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        parse_transaction_payload,
    )

    inner = _inner_event(XID_EVENT, b"\x01\x00\x00\x00\x00\x00\x00\x00")
    # missing END_MARK
    with pytest.raises(ValueError, match="END_MARK"):
        parse_transaction_payload(_packed(2) + _packed(3) + _packed(0xFF))
    # uncompressed-size mismatch
    with pytest.raises(ValueError, match="mismatch"):
        parse_transaction_payload(
            _payload_event(inner, uncompressed=len(inner) + 3)
        )
    # zstd wanted, module absent in this container
    with pytest.raises((NotImplementedError, Exception)):
        parse_transaction_payload(_payload_event(b"\x28\xb5\x2f\xfd", 0x00))
    # torn inner event
    with pytest.raises(ValueError, match="torn inner"):
        parse_transaction_payload(_payload_event(inner[:-3]))


# ------------------------------------------------------------------ VECTOR 9.0
def test_vector_column_decodes_float32_array():
    import struct as _struct

    from mysql_secure_agent_spark.sources.binlog_packets import (
        parse_table_map,
    )

    # table 8: cols = LONG, VECTOR (meta byte = 4-byte length prefix)
    tm = (8).to_bytes(6, "little") + b"\x00\x00"
    tm += bytes([1]) + b"s\x00" + bytes([1]) + b"v\x00"
    tm += bytes([2]) + bytes([0x03, 0xF2])
    tm += bytes([1, 4])  # metadata block: len=1, VECTOR length-prefix width 4
    tm += bytes([0x03])  # nullability
    maps = {}
    parse_event_body(tm, TABLE_MAP_EVENT, maps)
    assert maps[8].column_metadata == [0, 4]

    vec = [1.0, -2.5, 0.125]
    packed = _struct.pack("<3f", *vec)
    body = (8).to_bytes(6, "little") + b"\x00\x00"
    body += (2).to_bytes(2, "little") + bytes([2]) + bytes([0x03])
    body += bytes([0x00])  # null bitmap
    body += (7).to_bytes(4, "little", signed=True)
    body += len(packed).to_bytes(4, "little") + packed
    ev = parse_event_body(body, EXT_WRITE_ROWS, maps)
    assert ev.new_rows == [[7, vec]]

    # non-multiple-of-4 payload fails loudly
    bad = body[:-len(packed) - 4] + (3).to_bytes(4, "little") + packed[:3]
    with pytest.raises(ValueError, match="float32"):
        parse_event_body(bad, EXT_WRITE_ROWS, maps)


def test_stmt_lineage_attaches_and_scopes():
    """emit_stmt: rows carry the preceding ROWS_QUERY text; the next
    transaction's GTID clears it so a non-logged statement gets NULL, and
    a fresh ROWS_QUERY replaces the previous statement's text."""
    import datetime as dt
    from decimal import Decimal

    from mysql_secure_agent_spark.sources.binlog_packets import (
        EXT_DELETE_ROWS,
        GTID_EVENT,
        ROWS_QUERY_EVENT,
        packets_to_changelog,
    )

    def rq(sql: str) -> bytes:
        return bytes([min(len(sql), 255)]) + sql.encode()

    gtid = bytes([1]) + b"\x00" * 16 + (7).to_bytes(8, "little")
    s1 = "INSERT INTO s.t VALUES (...)"
    s2 = "UPDATE s.t SET name='y'"
    packets = [
        (TABLE_MAP_EVENT, _synthetic_table_map()),
        (GTID_EVENT, gtid),
        (ROWS_QUERY_EVENT, rq(s1)),
        (EXT_WRITE_ROWS, _rows_body([
            _row(1, "a", Decimal("1.00"), dt.date(2026, 1, 1)),
        ])),
        (ROWS_QUERY_EVENT, rq(s2)),
        (EXT_UPDATE_ROWS, _rows_body([
            _row(1, "a", Decimal("1.00"), dt.date(2026, 1, 1)),
            _row(1, "y", Decimal("2.00"), dt.date(2026, 1, 2)),
        ], n_images=2)),
        (GTID_EVENT, gtid),  # next txn: statement not rows-query-logged
        (EXT_DELETE_ROWS, _rows_body([
            _row(1, "y", Decimal("2.00"), dt.date(2026, 1, 2)),
        ])),
    ]
    cl = packets_to_changelog(
        packets, "s", "t", ["id", "name", "amt", "d"], emit_stmt=True
    )
    assert cl["op"].tolist() == ["I", "U", "D"]
    assert cl["_stmt"].tolist() == [s1, s2, None]
    # default off: no _stmt column
    cl2 = packets_to_changelog(packets, "s", "t", ["id", "name", "amt", "d"])
    assert "_stmt" not in cl2.columns


def test_transaction_payload_zstd_roundtrip():
    """binlog_transaction_compression=ON: a REAL zstd-compressed container
    (inflated through pyarrow's bundled codec — the wire's
    uncompressed-size field is exactly the size pyarrow requires) decodes
    to the same rows as the NONE container. build_transaction_payload is
    the write-side inverse, exercised both ways."""
    from mysql_secure_agent_spark.sources.binlog_packets import (
        TRANSACTION_PAYLOAD_EVENT,
        TransactionPayload,
        build_transaction_payload,
        packets_to_changelog,
        parse_event_body,
    )

    row = _row(11, "zstd", Decimal("7.75"), dt.date(2026, 4, 2))
    inner = _inner_event(TABLE_MAP_EVENT, _synthetic_table_map())
    inner += _inner_event(EXT_WRITE_ROWS, _rows_body([row]))

    for compress in (True, False):
        body = build_transaction_payload(inner, compress=compress)
        tp = parse_event_body(body, TRANSACTION_PAYLOAD_EVENT, {})
        assert isinstance(tp, TransactionPayload)
        assert tp.compression_type == (0x00 if compress else 0xFF)
        assert len(tp.events) == 2
        df = packets_to_changelog(
            [(TRANSACTION_PAYLOAD_EVENT, body)], "s", "t",
            ["id", "name", "amt", "d"],
        )
        assert df.to_dict("records") == [
            {"op": "I", "id": 11, "name": "zstd", "amt": Decimal("7.75"),
             "d": dt.date(2026, 4, 2), "source_lsn": 1}
        ]


def test_transaction_payload_zstd_size_mismatch_guard():
    from mysql_secure_agent_spark.sources.binlog_packets import (
        _packed_int_bytes,
        _zstd_compress,
        parse_transaction_payload,
    )

    inner = _inner_event(XID_EVENT, b"\x01\x00\x00\x00\x00\x00\x00\x00")
    comp = _zstd_compress(inner)
    lying = (
        bytes([2, 1, 0x00])
        + bytes([3, len(_packed_int_bytes(len(inner) + 7))])
        + _packed_int_bytes(len(inner) + 7)
        + bytes([1, len(_packed_int_bytes(len(comp)))])
        + _packed_int_bytes(len(comp))
        + bytes([0])
        + comp
    )
    with pytest.raises(Exception):  # inflate mismatch or codec error
        parse_transaction_payload(lying)
