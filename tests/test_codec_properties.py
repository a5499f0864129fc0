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
