"""Property-based codec tests (hypothesis): encode→decode is the identity
over the value domains MySQL's wire formats can carry. Complements the
golden-vector tests with randomized coverage of sign/magnitude/precision
corners the fixed vectors might miss.
"""

import datetime as dt
from decimal import Decimal

import pandas as pd
from hypothesis import given, settings, strategies as st

from mysql_secure_agent_spark.functions.mysql_codecs import (
    BLOB, DATE, DATETIME_V2, INT24, LONGLONG, NEWDECIMAL, SET, TIME_V2,
    VARCHAR, ColumnSpec, decode_typed_block, encode_typed_rows,
)


def _roundtrip(spec, values, key="v"):
    rows = [{key: v} for v in values]
    return decode_typed_block([spec], encode_typed_rows([spec], rows))[key]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-(1 << 23), (1 << 23) - 1) | st.none(), min_size=1, max_size=40))
def test_int24_roundtrip(vals):
    out = _roundtrip(ColumnSpec("v", INT24), vals)
    for got, exp in zip(out, vals):
        assert (pd.isna(got) and exp is None) or got == exp


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1), min_size=1, max_size=40))
def test_longlong_roundtrip(vals):
    assert _roundtrip(ColumnSpec("v", LONGLONG), vals).tolist() == vals


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-99999999999999.9999"),
            max_value=Decimal("99999999999999.9999"),
            places=4,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_decimal_18_4_roundtrip(vals):
    spec = ColumnSpec("v", NEWDECIMAL, {"precision": 18, "scale": 4})
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.dates(min_value=dt.date(1000, 1, 1), max_value=dt.date(9999, 12, 31)),
        min_size=1,
        max_size=40,
    )
)
def test_date_roundtrip(vals):
    out = _roundtrip(ColumnSpec("v", DATE), vals)
    for got, exp in zip(out, vals):
        assert got.date() == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1000, 1, 1), max_value=dt.datetime(9999, 12, 31)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_datetime_v2_roundtrip_microseconds(vals):
    spec = ColumnSpec("v", DATETIME_V2, {"fsp": 6})
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        assert got.to_pydatetime() == exp


@settings(max_examples=60, deadline=None)
@given(st.lists(st.times(), min_size=1, max_size=40))
def test_time_v2_roundtrip(vals):
    spec = ColumnSpec("v", TIME_V2, {"fsp": 6})
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        assert got == exp.strftime("%H:%M:%S.%f")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(max_size=300) | st.none(),
        min_size=1,
        max_size=30,
    )
)
def test_varchar_roundtrip_unicode(vals):
    spec = ColumnSpec("v", VARCHAR, {"max_len": 2000})
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        assert (got is None and exp is None) or got == exp


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=500) | st.none(), min_size=1, max_size=30))
def test_blob_roundtrip(vals):
    spec = ColumnSpec("v", BLOB, {"len_bytes": 3})
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        assert (got is None and exp is None) or got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sets(st.sampled_from(["a", "b", "c", "d", "e"])),
        min_size=1,
        max_size=40,
    )
)
def test_set_roundtrip_membership(vals):
    spec = ColumnSpec("v", SET, {"labels": ["a", "b", "c", "d", "e"]})
    out = _roundtrip(spec, [sorted(v) for v in vals])
    for got, exp in zip(out, vals):
        members = set(got.split(",")) - {""}
        assert members == exp


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # negative
            st.integers(0, 838), st.integers(0, 59), st.integers(0, 59),
            st.integers(0, 999999),
        ),
        min_size=1, max_size=40,
    ),
    st.sampled_from([0, 2, 4, 6]),
)
def test_time_v2_signed_full_domain_roundtrip(vals, fsp):
    """Full MySQL TIME domain ±838:59:59.ffffff through the biased
    fixed-point wire format, at every fsp width."""
    from mysql_secure_agent_spark.functions.mysql_codecs import TIME_V2

    spec = ColumnSpec("v", TIME_V2, {"fsp": fsp})
    texts = []
    for neg, h, m, s, us in vals:
        us -= us % (100 ** (3 - (fsp + 1) // 2)) if fsp < 6 else 0
        if fsp == 0:
            us = 0
        sign = "-" if neg and (h or m or s or us) else ""
        frac = f".{us:06d}" if fsp else ""
        texts.append(f"{sign}{h:02d}:{m:02d}:{s:02d}{frac}")
    out = decode_typed_block([spec], encode_typed_rows([spec], [{"v": t} for t in texts]))
    assert out["v"].tolist() == texts


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.datetimes(min_value=dt.datetime(1000, 1, 1),
                     max_value=dt.datetime(9999, 12, 31)) | st.none(),
        min_size=1, max_size=40,
    )
)
def test_legacy_datetime_roundtrip(vals):
    """Pre-5.6 DATETIME: packed-decimal seconds precision."""
    from mysql_secure_agent_spark.functions.mysql_codecs import DATETIME

    spec = ColumnSpec("v", DATETIME)
    out = _roundtrip(spec, [None if v is None else v.replace(microsecond=0) for v in vals])
    for got, exp in zip(out, vals):
        if exp is None:
            assert pd.isna(got)
        else:
            assert got.to_pydatetime() == exp.replace(microsecond=0)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**31 - 1) | st.none(), min_size=1, max_size=40))
def test_legacy_timestamp_roundtrip(vals):
    """Pre-5.6 TIMESTAMP: LE epoch seconds."""
    from mysql_secure_agent_spark.functions.mysql_codecs import TIMESTAMP

    spec = ColumnSpec("v", TIMESTAMP)
    out = _roundtrip(spec, vals)
    for got, exp in zip(out, vals):
        if exp is None:
            assert pd.isna(got)
        else:
            assert got == pd.Timestamp(exp, unit="s")
