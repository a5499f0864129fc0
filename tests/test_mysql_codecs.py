"""S9 type-codec surface: MySQL binlog wire layouts, columnar decode.

Layouts mirror the reference's RowParser codecs (file:line cited in
mysql_codecs.py). Golden vectors: hand-derived packed-BCD decimals (layout
per RowParser.java:408-446 / mysql strings/decimal.c) and the blob slice of
the reference's own captured packet (BinlogParserSpec.java:83-97
multiLongtext: 4-byte LE length prefix + bytes).
"""

import datetime as dt
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from mysql_secure_agent_spark.functions.mysql_codecs import (
    BIT, BLOB, DATE, DATETIME_V2, DOUBLE, ENUM, FLOAT, INT24, LONG, LONGLONG,
    NEWDECIMAL, SET, SHORT, STRING, TIME_V2, TIMESTAMP_V2, TINY, VARCHAR,
    YEAR, ColumnSpec, decimal_bin_size, decode_typed_block, encode_typed_rows,
)

FULL_SCHEMA = [
    ColumnSpec("a_tiny", TINY),
    ColumnSpec("a_short", SHORT),
    ColumnSpec("b_i24", INT24),
    ColumnSpec("c_long", LONG),
    ColumnSpec("d_ll", LONGLONG),
    ColumnSpec("e_f", FLOAT),
    ColumnSpec("f_d", DOUBLE),
    ColumnSpec("g_dec", NEWDECIMAL, {"precision": 14, "scale": 4}),
    ColumnSpec("h_date", DATE),
    ColumnSpec("i_time", TIME_V2, {"fsp": 6}),
    ColumnSpec("j_ts", TIMESTAMP_V2, {"fsp": 6}),
    ColumnSpec("k_dt", DATETIME_V2, {"fsp": 0}),
    ColumnSpec("l_year", YEAR),
    ColumnSpec("m_vc", VARCHAR, {"max_len": 100}),
    ColumnSpec("m_wide", STRING, {"max_len": 70000}),
    ColumnSpec("n_blob", BLOB, {"len_bytes": 4}),
    ColumnSpec("o_enum", ENUM, {"labels": ["red", "green", "blue"]}),
    ColumnSpec("p_set", SET, {"labels": ["a", "b", "c", "d"]}),
    ColumnSpec("q_bit", BIT, {"bits": 20}),
]


def test_roundtrip_all_types_with_nulls():
    rows = [
        dict(
            a_tiny=-5, a_short=-32768, b_i24=-8388608, c_long=2147483647,
            d_ll=-9007199254740993, e_f=1.5, f_d=3.141592653589793,
            g_dec=Decimal("1234567890.1234"), h_date=dt.date(2026, 8, 17),
            i_time=dt.time(12, 34, 56, 789012),
            j_ts=dt.datetime(2026, 8, 17, 12, 34, 56, 789012, tzinfo=dt.timezone.utc),
            k_dt=dt.datetime(2026, 8, 17, 12, 34, 56),
            l_year=2026, m_vc="hello world", m_wide="x" * 300,
            n_blob=b"\x00\x01binary", o_enum="green", p_set="a,c", q_bit=0xABCDE,
        ),
        dict(
            a_tiny=None, a_short=7, b_i24=12345, c_long=None, d_ll=42,
            e_f=None, f_d=-2.5, g_dec=Decimal("-0.0001"), h_date=None,
            i_time=None, j_ts=None, k_dt=dt.datetime(1999, 12, 31, 23, 59, 59),
            l_year=None, m_vc="", m_wide=None, n_blob=None,
            o_enum="red", p_set="", q_bit=None,
        ),
    ]
    out = decode_typed_block(FULL_SCHEMA, encode_typed_rows(FULL_SCHEMA, rows))
    assert out["a_tiny"][0] == -5 and pd.isna(out["a_tiny"][1])
    assert out["a_short"].tolist() == [-32768, 7]
    assert out["b_i24"].tolist() == [-8388608, 12345]  # sign-extended INT24
    assert out["c_long"][0] == 2147483647 and pd.isna(out["c_long"][1])
    assert out["d_ll"].tolist() == [-9007199254740993, 42]
    assert out["e_f"][0] == 1.5 and np.isnan(out["e_f"][1])
    assert out["f_d"].tolist() == [3.141592653589793, -2.5]  # exact IEEE bits
    assert out["g_dec"][0] == Decimal("1234567890.1234")
    assert out["g_dec"][1] == Decimal("-0.0001")
    assert str(out["h_date"][0].date()) == "2026-08-17" and pd.isna(out["h_date"][1])
    assert out["i_time"][0] == "12:34:56.789012" and out["i_time"][1] is None
    assert str(out["j_ts"][0]) == "2026-08-17 12:34:56.789012"
    assert str(out["k_dt"][0]) == "2026-08-17 12:34:56"
    assert out["l_year"][0] == 2026
    assert out["m_vc"].tolist() == ["hello world", ""]
    assert out["m_wide"][0] == "x" * 300 and out["m_wide"][1] is None
    assert out["n_blob"][0] == b"\x00\x01binary" and out["n_blob"][1] is None
    assert out["o_enum"].tolist() == ["green", "red"]
    assert out["p_set"].tolist() == ["a,c", ""]
    assert out["q_bit"][0] == 0xABCDE and pd.isna(out["q_bit"][1])


def test_decimal_golden_vectors():
    """Hand-derived from the packed-BCD layout (RowParser.java:408-446):
    DECIMAL(4,2) stores int part 12 in 1 byte, frac 34 in 1 byte; positive
    sets the sign bit on byte 0 (0x0C|0x80=0x8C); negative complements every
    byte → 0x73 0xDD."""
    spec = [ColumnSpec("d", NEWDECIMAL, {"precision": 4, "scale": 2})]
    assert decimal_bin_size(4, 2) == 2
    pos = decode_typed_block(spec, pd.Series([bytes([0, 0x8C, 0x22])]))
    neg = decode_typed_block(spec, pd.Series([bytes([0, 0x73, 0xDD])]))
    assert pos["d"][0] == Decimal("12.34")
    assert neg["d"][0] == Decimal("-12.34")
    # and the encoder produces exactly those bytes
    enc = encode_typed_rows(spec, [{"d": Decimal("12.34")}, {"d": Decimal("-12.34")}])
    assert enc[0] == bytes([0, 0x8C, 0x22]) and enc[1] == bytes([0, 0x73, 0xDD])


def test_blob_golden_vector_from_reference_capture():
    """Value slice of the reference's captured longtext packet
    (BinlogParserSpec.java:90-96): 0C000000 (LE length 12) + 'foobarbazqux'."""
    payload = pd.Series([bytes([0]) + bytes.fromhex("0C000000666F6F62617262617A717578")])
    out = decode_typed_block([ColumnSpec("t", BLOB, {"len_bytes": 4})], payload)
    assert out["t"][0] == b"foobarbazqux"


def test_date_bitpack_layout():
    """DATE packs as year*512 + month*32 + day, 3 bytes LE
    (RowParser.java:220-232): 2026-08-17 → 1037585 → 11 D5 0F."""
    spec = [ColumnSpec("d", DATE)]
    enc = encode_typed_rows(spec, [{"d": dt.date(2026, 8, 17)}])
    assert enc[0] == bytes([0, 0x11, 0xD5, 0x0F])
    out = decode_typed_block(spec, pd.Series([bytes([0, 0x11, 0xD5, 0x0F])]))
    assert str(out["d"][0].date()) == "2026-08-17"


def test_zero_date_is_null():
    """MySQL zero dates (0000-00-00) decode to NULL rather than a bogus date."""
    spec = [ColumnSpec("d", DATE)]
    out = decode_typed_block(spec, pd.Series([bytes([0, 0, 0, 0])]))
    assert pd.isna(out["d"][0])


def test_decimal_wide_precision():
    spec = [ColumnSpec("d", NEWDECIMAL, {"precision": 30, "scale": 10})]
    vals = [Decimal("12345678901234567890.0123456789"), Decimal("-0.0000000001")]
    out = decode_typed_block(spec, encode_typed_rows(spec, [{"d": v} for v in vals]))
    assert out["d"].tolist() == vals


def test_empty_batch():
    out = decode_typed_block(FULL_SCHEMA, pd.Series([], dtype=object))
    assert len(out) == 0


def test_legacy_pre56_temporal_roundtrip():
    """Pre-5.6 codecs: TIME 3B LE packed decimal (RowParser.java:234-244),
    TIMESTAMP 4B LE epoch seconds (:270-279), DATETIME 8B LE packed decimal
    YYYYMMDDHHMMSS (:296-313)."""
    from mysql_secure_agent_spark.functions.mysql_codecs import (
        DATETIME, TIME, TIMESTAMP,
    )

    schema = [
        ColumnSpec("t", TIME),
        ColumnSpec("ts", TIMESTAMP),
        ColumnSpec("d", DATETIME),
    ]
    rows = [
        dict(t=dt.time(12, 34, 56),
             ts=dt.datetime(2026, 8, 17, 1, 2, 3, tzinfo=dt.timezone.utc),
             d=dt.datetime(1999, 12, 31, 23, 59, 59)),
        dict(t="-838:59:59", ts=0, d=dt.datetime(1000, 1, 1, 0, 0, 0)),
        dict(t=None, ts=None, d=None),
    ]
    out = decode_typed_block(schema, encode_typed_rows(schema, rows))
    assert out["t"].tolist() == ["12:34:56", "-838:59:59", None]
    assert str(out["ts"][0]) == "2026-08-17 01:02:03"
    assert str(out["ts"][1]) == "1970-01-01 00:00:00" and pd.isna(out["ts"][2])
    assert str(out["d"][0]) == "1999-12-31 23:59:59"
    assert str(out["d"][1]) == "1000-01-01 00:00:00" and pd.isna(out["d"][2])


def test_legacy_time_golden_wire_bytes():
    """123456 decimal-packed = 0x01E240 → LE bytes 40 E2 01; negative is the
    3-byte two's complement."""
    from mysql_secure_agent_spark.functions.mysql_codecs import TIME

    spec = [ColumnSpec("t", TIME)]
    enc = encode_typed_rows(spec, [{"t": "12:34:56"}, {"t": "-00:00:01"}])
    assert enc[0] == bytes([0, 0x40, 0xE2, 0x01])
    assert enc[1] == bytes([0]) + (-1 & 0xFFFFFF).to_bytes(3, "little")


def test_time_v2_negative_all_fsp():
    """Negative TIME_V2 stores the negated packed word under the
    0x800000<<8nb bias (MySQL my_time_packed_to_binary); check the full fsp
    domain and that positive values keep the reference-compatible layout."""
    for fsp, frac_txt in ((0, ""), (2, ".120000"), (4, ".123400"), (6, ".123456")):
        spec = [ColumnSpec("t", TIME_V2, {"fsp": fsp})]
        us = {0: 0, 2: 120000, 4: 123400, 6: 123456}[fsp]
        vals = [
            dt.time(1, 2, 3, us),
            "-838:59:59" + frac_txt,
            "-00:00:01",
        ]
        out = decode_typed_block(spec, encode_typed_rows(spec, [{"t": v} for v in vals]))
        exp_frac = frac_txt if fsp else ""
        assert out["t"][0] == "01:02:03" + exp_frac
        assert out["t"][1] == "-838:59:59" + exp_frac
        assert out["t"][2] == "-00:00:01" + (".000000" if fsp else "")


def test_time_v2_positive_wire_layout_unchanged():
    """Non-negative TIME_V2 bytes must equal the pre-sign-support layout:
    3B BE word with top bit set + separate BE fsp bytes (what the reference
    parses, RowParser.java:246-268)."""
    spec = [ColumnSpec("t", TIME_V2, {"fsp": 6})]
    enc = encode_typed_rows(spec, [{"t": dt.time(12, 34, 56, 789012)}])
    word = (1 << 23) | (12 << 12) | (34 << 6) | 56
    assert enc[0] == bytes([0]) + word.to_bytes(3, "big") + (789012).to_bytes(3, "big")


# ------------------------------------------------------------- GEOMETRY/WKB
def test_geometry_golden_vector_mysql_docs():
    """Public golden: SELECT HEX(ST_GeomFromText('POINT(1 -1)')) in MySQL is
    00000000 01 01000000 000000000000F03F 000000000000F0BF (docs 11.4.3).
    The reference throws on this type (RowParser.java:165-166) — decoding
    it is engine-beyond-reference surface."""
    from mysql_secure_agent_spark.functions.mysql_codecs import (
        GEOMETRY,
        wkb_point,
        wkb_to_wkt,
    )

    payload = bytes.fromhex(
        "00000000" "01" "01000000" "000000000000F03F" "000000000000F0BF"
    )
    assert payload[4:] == wkb_point(1.0, -1.0)
    assert wkb_to_wkt(payload) == "POINT(1 -1)"


def test_geometry_wkt_full_double_precision():
    """Coordinates render at full double precision (shortest round-trip),
    not %g's 6 significant digits — real GPS coordinates must survive."""
    from mysql_secure_agent_spark.functions.mysql_codecs import (
        wkb_point,
        wkb_to_wkt,
    )

    payload = (0).to_bytes(4, "little") + wkb_point(139.6917, -35.123456789)
    assert wkb_to_wkt(payload) == "POINT(139.6917 -35.123456789)"
    assert float(wkb_to_wkt(payload).split("(")[1].split(" ")[0]) == 139.6917


def test_geometry_roundtrip_point_linestring_srid_and_nulls():
    from mysql_secure_agent_spark.functions.mysql_codecs import (
        GEOMETRY,
        ColumnSpec,
        decode_typed_block,
        encode_typed_rows,
        wkb_linestring,
        wkb_point,
        wkb_to_wkt,
    )

    spec = [ColumnSpec("g", GEOMETRY, {"len_bytes": 4})]
    rows = [
        {"g": (0, wkb_point(3.5, -7))},
        {"g": (4326, wkb_point(0, 0))},
        {"g": (0, wkb_linestring([(0, 0), (1, 1), (2, -3)]))},
        {"g": None},
    ]
    out = decode_typed_block(spec, encode_typed_rows(spec, rows))
    assert out["g"][0] == "POINT(3.5 -7)"
    assert out["g"][1] == "SRID=4326;POINT(0 0)"
    assert out["g"][2] == "LINESTRING(0 0,1 1,2 -3)"
    assert out["g"][3] is None


def test_geometry_big_endian_wkb():
    """Byte-order flag 0 = big-endian WKB decodes identically."""
    import struct

    from mysql_secure_agent_spark.functions.mysql_codecs import wkb_to_wkt

    be = struct.pack(">BIdd", 0, 1, 2.0, 4.0)
    # struct '>B' of 0 is the first byte; wkb_to_wkt reads payload[4] as flag
    payload = (0).to_bytes(4, "little") + bytes([0]) + be[1:]
    assert wkb_to_wkt(payload) == "POINT(2 4)"


def test_geometry_polygon_golden_hex():
    """POLYGON with a hole, hand-encoded per OGC SFA §8.2.3 (LE): byte
    order 01, type 03000000, 2 rings of 5 and 4 points. Spec-derived
    golden, independent of the encoder under test."""
    import struct

    from mysql_secure_agent_spark.functions.mysql_codecs import wkb_to_wkt

    def pts(*xy):
        return b"".join(struct.pack("<dd", x, y) for x, y in xy)

    wkb = (
        bytes.fromhex("0103000000" + "02000000")
        + struct.pack("<I", 5)
        + pts((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
        + struct.pack("<I", 4)
        + pts((5, 5), (7, 5), (5, 7), (5, 5))
    )
    payload = (0).to_bytes(4, "little") + wkb
    assert wkb_to_wkt(payload) == (
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(5 5,7 5,5 7,5 5))"
    )


def test_geometry_multi_and_collection():
    from mysql_secure_agent_spark.functions.mysql_codecs import (
        wkb_linestring,
        wkb_multi,
        wkb_point,
        wkb_polygon,
        wkb_to_wkt,
    )

    def p(b):
        return (0).to_bytes(4, "little") + b

    assert wkb_to_wkt(p(wkb_multi(4, [wkb_point(1, 1), wkb_point(2, -2)]))) == (
        "MULTIPOINT((1 1),(2 -2))"
    )
    assert wkb_to_wkt(p(wkb_multi(5, [
        wkb_linestring([(0, 0), (1, 1)]), wkb_linestring([(2, 2), (3, 3)]),
    ]))) == "MULTILINESTRING((0 0,1 1),(2 2,3 3))"
    sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    sq2 = [(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]
    assert wkb_to_wkt(p(wkb_multi(6, [wkb_polygon([sq]), wkb_polygon([sq2])]))) == (
        "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))"
    )
    # nested collection keeps full tagged children
    gc = wkb_multi(7, [wkb_point(9, 9), wkb_multi(4, [wkb_point(1, 2)])])
    assert wkb_to_wkt(p(gc)) == (
        "GEOMETRYCOLLECTION(POINT(9 9),MULTIPOINT((1 2)))"
    )
    assert wkb_to_wkt(p(wkb_multi(7, []))) == "GEOMETRYCOLLECTION()"
    # SRID prefix composes with containers
    srid = (4326).to_bytes(4, "little") + wkb_polygon([sq])
    assert wkb_to_wkt(srid) == "SRID=4326;POLYGON((0 0,1 0,1 1,0 1,0 0))"


def test_geometry_trailing_bytes_refused():
    import pytest

    from mysql_secure_agent_spark.functions.mysql_codecs import (
        wkb_point,
        wkb_to_wkt,
    )

    payload = (0).to_bytes(4, "little") + wkb_point(1, 1) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        wkb_to_wkt(payload)


def test_vector_roundtrip_and_golden_bytes():
    """MySQL 9.0 VECTOR (MYSQL_TYPE_VECTOR=242): blob-framed packed LE
    float32s. Golden: VECTOR [1.0, -2.5] encodes as length 8 (4B LE) +
    0000803F (1.0f) + 000020C0 (-2.5f)."""
    from mysql_secure_agent_spark.functions.mysql_codecs import VECTOR

    spec = [ColumnSpec("id", LONG), ColumnSpec("emb", VECTOR)]
    enc = encode_typed_rows(spec, [{"id": 1, "emb": [1.0, -2.5]}])
    assert enc[0] == (
        bytes([0]) + (1).to_bytes(4, "little")
        + (8).to_bytes(4, "little") + bytes.fromhex("0000803F000020C0")
    )

    rows = [
        {"id": 1, "emb": [1.0, -2.5, 0.125]},
        {"id": 2, "emb": None},
        {"id": 3, "emb": []},
        {"id": 4, "emb": [float(i) / 7 for i in range(64)]},
    ]
    out = decode_typed_block(spec, encode_typed_rows(spec, rows))
    assert out["emb"][0].tolist() == [1.0, -2.5, 0.125]
    assert out["emb"][1] is None
    assert out["emb"][2].tolist() == []
    np.testing.assert_allclose(
        out["emb"][3], np.array([i / 7 for i in range(64)], dtype=np.float32)
    )
    # misaligned payload fails loudly
    bad = bytes([0]) + (1).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"abc"
    with pytest.raises(ValueError, match="float32"):
        decode_typed_block(spec, pd.Series([bad]))
