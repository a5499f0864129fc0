"""Arrow-vectorized binary row-image decode — SURVEY §2.1 S9/S10.

The reference decodes binlog row images one column at a time, one row at a
time, honoring a per-row null bitmap and length-prefixed variable fields
(``parser/shyiko/RowParser.java:46-93`` framing, ``:115-168`` type dispatch,
``:171-457`` codecs; null bitmap ``RowParser.java:57,65``). Our engine keeps
the *format concepts* — null bitmap, fixed scalar slots, length-prefixed
strings — but decodes a whole Arrow batch columnar-ly: no per-row Python
(mandated by the north star). The trick is that a batch of length-prefixed
rows is exactly an Arrow binary column; headers are gathered with numpy fancy
indexing, and the string fields are *rebuilt as Arrow StringArrays straight
from (offsets, values) buffers* — zero per-row work.

Wire format per row-image (little-endian, transcript payload):

    header (23 bytes):
      null_bitmap : uint8   bits 0..5 = conv_id, turn_idx, role, text, tool, ts
      len_conv    : uint16  UTF-8 byte length (0 if null)
      len_role    : uint16
      len_text    : uint32  (text can exceed 64 KiB — BLOB-style length,
                             cf. RowParser.java:353-356)
      len_tool    : uint16
      turn_idx    : int32
      ts_us       : int64   epoch microseconds UTC
    body: conv_id ∥ role ∥ text ∥ tool  (UTF-8, concatenated)

The encoder exists for the synthetic feed generator / tests only (the
reference's live-capture harness analog, ``binlog_test_generator/CaptureBinlogEvents.java``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

HEADER = struct.Struct("<BHHIHiq")  # 23 bytes
_B_CONV, _B_TURN, _B_ROLE, _B_TEXT, _B_TOOL, _B_TS = (1 << i for i in range(6))


def encode_row(
    conv_id: str | None,
    turn_idx: int | None,
    role: str | None,
    text: str | None,
    tool: str | None,
    ts_us: int | None,
) -> bytes:
    """Encode one row image (test-harness side; per-row is fine here)."""
    bitmap = 0
    bc = conv_id.encode() if conv_id is not None else b""
    br = role.encode() if role is not None else b""
    bt = text.encode() if text is not None else b""
    bl = tool.encode() if tool is not None else b""
    if conv_id is None:
        bitmap |= _B_CONV
    if turn_idx is None:
        bitmap |= _B_TURN
    if role is None:
        bitmap |= _B_ROLE
    if text is None:
        bitmap |= _B_TEXT
    if tool is None:
        bitmap |= _B_TOOL
    if ts_us is None:
        bitmap |= _B_TS
    head = HEADER.pack(
        bitmap, len(bc), len(br), len(bt), len(bl), turn_idx or 0, ts_us or 0
    )
    return head + bc + br + bt + bl


def encode_frame(pdf: pd.DataFrame) -> pd.Series:
    """Encode a changelog frame (cols conv_id, turn_idx, role, text, tool, ts)
    into a binary payload series. Deletes (all-null payload) encode too."""
    out = []
    for i in range(len(pdf)):
        r = pdf.iloc[i]
        t = r["ts"]
        out.append(
            encode_row(
                r["conv_id"] if pd.notna(r["conv_id"]) else None,
                int(r["turn_idx"]) if pd.notna(r["turn_idx"]) else None,
                r["role"] if pd.notna(r["role"]) else None,
                r["text"] if pd.notna(r["text"]) else None,
                r["tool"] if pd.notna(r["tool"]) else None,
                int(pd.Timestamp(t).value // 1000) if pd.notna(t) else None,
            )
        )
    return pd.Series(out, index=pdf.index)


def _string_field(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, null_mask: np.ndarray
) -> pd.Series:
    """Build an Arrow StringArray directly from gathered (start, length) spans
    over the concatenated payload buffer — the columnar inverse of the
    reference's readString (RowParser.java:340-351). No per-row Python:
    the values buffer is assembled by one boolean-mask gather."""
    n = len(starts)
    # take the exact spans out of buf into a packed values buffer
    take = np.zeros(len(buf), dtype=bool)
    # mark [start, start+len) spans via difference trick
    marks = np.zeros(len(buf) + 1, dtype=np.int64)
    np.add.at(marks, starts, 1)
    np.add.at(marks, starts + lengths, -1)
    take = np.cumsum(marks[:-1]) > 0
    values = buf[take].tobytes()
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    arr = pa.StringArray.from_buffers(
        n,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(values),
    )
    s = arr.to_pandas()
    s[null_mask] = None
    return s


def decode_payload_block(
    payload: pd.Series, quarantine: bool = False
) -> pd.DataFrame:
    """Vectorized decode of a batch of row-image payloads.

    Returns a frame with columns conv_id, turn_idx, role, text, tool, ts.

    ``quarantine=True`` adds dead-letter columns instead of trusting the
    wire bytes: every row is structurally VALIDATED first (header present,
    reserved bitmap bits clear, null-flag/length agreement, and the frame-
    size identity ``23 + Σ field lengths == row length`` — which catches
    both truncation and trailing garbage), all with the same fancy-indexed
    header math the decode itself uses (no second pass over the payload
    bytes). Valid rows decode normally; invalid rows decode to all-NULL
    fields plus ``_error`` (reason code, checked in precedence order:
    null_payload → short_header → reserved_bits → null_length_conflict →
    frame_size_mismatch) and ``_raw`` (the original payload bytes, kept for
    forensics — NULL on valid rows so the extra column is ~free). The
    reference's RowParser simply throws mid-stream on bytes it cannot frame
    (``RowParser.java:165-166`` IOException) — killing the whole agent on
    one poisoned event; validate-then-decode keeps the stream alive and the
    poison auditable.
    """
    binarr = pa.array(payload, type=pa.binary())
    n = len(binarr)
    if n == 0:
        out = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype="Int32"),
                "role": pd.Series([], dtype=object),
                "text": pd.Series([], dtype=object),
                "tool": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
        if quarantine:
            out["_error"] = pd.Series([], dtype=object)
            out["_raw"] = pd.Series([], dtype=object)
        return out
    # One contiguous buffer + per-row offsets (Arrow's native layout).
    flat = binarr.combine_chunks() if isinstance(binarr, pa.ChunkedArray) else binarr
    voff = np.frombuffer(flat.buffers()[1], dtype=np.int32, count=n + 1)
    buf = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    row_start = voff[:-1].astype(np.int64)
    row_len = (voff[1:] - voff[:-1]).astype(np.int64)
    null_payload = np.zeros(n, dtype=bool)
    if flat.null_count:
        null_payload = np.asarray(flat.is_null())

    reason = None
    if quarantine:
        # ---- structural validation (header math only; zero extra passes
        # over the payload bytes) ------------------------------------------
        reason = np.full(n, None, dtype=object)
        short = (row_len < HEADER.size) | null_payload
        reason[null_payload] = "null_payload"
        reason[short & ~null_payload] = "short_header"
        # clamp the gather base for short rows so header reads stay in
        # bounds; their decoded garbage is discarded below
        if len(buf) < HEADER.size:  # every row malformed-short
            buf = np.concatenate(
                [buf, np.zeros(HEADER.size - len(buf), dtype=np.uint8)]
            )
        clamped = np.minimum(row_start, max(len(buf) - HEADER.size, 0))
        row_start = np.where(short, clamped, row_start)

    # ---- header gather (fancy-indexed, no loop) ---------------------------
    def u8(off):
        return buf[row_start + off].astype(np.int64)

    def u16(off):
        return u8(off) | (u8(off + 1) << 8)

    def u32(off):
        return u16(off) | (u16(off + 2) << 16)

    def i64(off):
        v = u32(off) | (u32(off + 4) << 32)
        return v.astype(np.int64)

    bitmap = u8(0)
    len_conv = u16(1)
    len_role = u16(3)
    len_text = u32(5)
    len_tool = u16(9)
    turn = u32(11).astype(np.int32)
    ts_us = i64(15)

    null_conv = (bitmap & _B_CONV) != 0
    null_turn = (bitmap & _B_TURN) != 0
    null_role = (bitmap & _B_ROLE) != 0
    null_text = (bitmap & _B_TEXT) != 0
    null_tool = (bitmap & _B_TOOL) != 0
    null_ts = (bitmap & _B_TS) != 0

    if quarantine:
        open_ = reason == None  # noqa: E711 — elementwise against object array
        # reserved bitmap bits (6-7) must be clear
        bad = open_ & ((bitmap & ~np.int64(0x3F)) != 0)
        reason[bad] = "reserved_bits"
        open_ &= ~bad
        # a null field must declare length 0 (the encoder writes none)
        bad = open_ & (
            (null_conv & (len_conv != 0))
            | (null_role & (len_role != 0))
            | (null_text & (len_text != 0))
            | (null_tool & (len_tool != 0))
        )
        reason[bad] = "null_length_conflict"
        open_ &= ~bad
        # exact frame-size identity: catches truncation AND trailing bytes
        bad = open_ & (
            HEADER.size + len_conv + len_role + len_text + len_tool != row_len
        )
        reason[bad] = "frame_size_mismatch"
        valid = reason == None  # noqa: E711
        # neutralize invalid rows' spans so the masked string gather can't
        # walk out of bounds (start=0 / len=0 contributes nothing)
        len_conv = np.where(valid, len_conv, 0)
        len_role = np.where(valid, len_role, 0)
        len_text = np.where(valid, len_text, 0)
        len_tool = np.where(valid, len_tool, 0)
        row_start = np.where(valid, row_start, 0)
        # decoded scalars of invalid rows are garbage — null them
        null_conv |= ~valid
        null_role |= ~valid
        null_text |= ~valid
        null_tool |= ~valid
        null_turn |= ~valid
        null_ts |= ~valid

    # ---- body: running offsets per field ----------------------------------
    s_conv = row_start + HEADER.size
    s_role = s_conv + len_conv
    s_text = s_role + len_role
    s_tool = s_text + len_text

    conv = _string_field(buf, s_conv, len_conv, null_conv)
    role = _string_field(buf, s_role, len_role, null_role)
    text = _string_field(buf, s_text, len_text, null_text)
    tool = _string_field(buf, s_tool, len_tool, null_tool)

    turn_s = pd.Series(turn).astype("Int32")
    turn_s[null_turn] = pd.NA
    ts = pd.Series(ts_us.astype("datetime64[us]"))
    ts[null_ts] = pd.NaT
    out = pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": turn_s,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    if quarantine:
        out["_error"] = pd.Series(reason, dtype=object)
        raw = np.full(n, None, dtype=object)
        if (~valid).any():
            vals = payload.reset_index(drop=True)
            raw[~valid] = vals[~valid].values
        out["_raw"] = pd.Series(raw, dtype=object)
    return out


def decode_raw_feed(raw_df, quarantine: bool = False):
    """Raw feed (RAW_CHANGELOG_SCHEMA) → typed changelog DataFrame via
    ``mapInPandas`` (Arrow batches in and out; the engine's replacement for
    the reference's event loop around RowParser).

    ``quarantine=True`` validates before decoding (see
    ``decode_payload_block``) and appends ``_error`` / ``_raw`` dead-letter
    columns instead of crashing or silently mis-decoding on malformed
    images; the pipeline routes flagged rows to the dead-letter sink."""
    from pyspark.sql import types as T

    from ..schemas import CHANGELOG_SCHEMA

    pass_cols = ["op", "source_lsn", "binlog_file", "binlog_pos"]
    schema = CHANGELOG_SCHEMA
    if quarantine:
        # every field nullable: a quarantined row decodes to all-NULL fields,
        # including columns (op, keys, lsn) the clean contract marks NOT NULL
        schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in CHANGELOG_SCHEMA.fields]
            + [
                T.StructField("_error", T.StringType(), True),
                T.StructField("_raw", T.BinaryType(), True),
            ]
        )
    out_cols = [f.name for f in schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_payload_block(pdf["payload"], quarantine=quarantine)
            for c in pass_cols:
                decoded[c] = pdf[c].values
            yield decoded[out_cols]

    return raw_df.mapInPandas(fn, schema=schema)


# ------------------------------------------------ generic MySQL-typed decode
def codec_spark_schema(codec_schema) -> "T.StructType":
    """Spark schema for a list of mysql_codecs.ColumnSpec (SURVEY §1.2 type
    mapping: MySQL binlog type → native Spark type)."""
    from pyspark.sql import types as T

    from .mysql_codecs import (
        BIT, BLOB, DATE, DATETIME_V2, DOUBLE, ENUM, FLOAT, INT24, JSON, LONG,
        LONG_BLOB, LONGLONG, MEDIUM_BLOB, NEWDECIMAL, SET, SHORT, STRING,
        TIME_V2, TIMESTAMP_V2, TINY, TINY_BLOB, VAR_STRING, VARCHAR, VECTOR,
        YEAR,
    )

    def dtype(spec):
        t = spec.type_code
        if t in (TINY, SHORT, INT24, LONG, LONGLONG, YEAR, BIT):
            return T.LongType()
        if t in (FLOAT, DOUBLE):
            return T.DoubleType()
        if t == NEWDECIMAL:
            return T.DecimalType(spec.meta["precision"], spec.meta["scale"])
        if t == DATE:
            return T.DateType()
        if t in (TIMESTAMP_V2, DATETIME_V2):
            return T.TimestampType()
        if t in (TIME_V2, VARCHAR, VAR_STRING, STRING, ENUM, SET, JSON):
            return T.StringType()
        if t in (BLOB, TINY_BLOB, MEDIUM_BLOB, LONG_BLOB):
            return T.BinaryType()
        if t == VECTOR:  # MySQL 9.0 embedding column
            return T.ArrayType(T.FloatType(), True)
        raise ValueError(f"unsupported type code {t}")

    return T.StructType([T.StructField(s.name, dtype(s), True) for s in codec_schema])


def decode_raw_feed_typed(raw_df, codec_schema):
    """Schema-driven raw-feed decode: payload column of MySQL-binlog-layout
    row images (any column mix of the S9 type surface) → typed DataFrame via
    the columnar codecs in mysql_codecs.py. This is the general form of
    ``decode_raw_feed`` — the reference's RowParser dispatch over an arbitrary
    TABLE_MAP schema (RowParser.java:115-168), Arrow-batched."""
    from pyspark.sql import types as T

    from .mysql_codecs import DATE, decode_typed_block

    pass_cols = ["op", "source_lsn", "binlog_file", "binlog_pos"]
    out_schema = codec_spark_schema(codec_schema)
    for c, t in (
        ("op", T.StringType()),
        ("source_lsn", T.LongType()),
        ("binlog_file", T.StringType()),
        ("binlog_pos", T.LongType()),
    ):
        out_schema = out_schema.add(c, t, True)
    date_cols = [s.name for s in codec_schema if s.type_code == DATE]
    out_cols = [f.name for f in out_schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_typed_block(codec_schema, pdf["payload"])
            for c in date_cols:  # datetime64 → date objects for DateType
                decoded[c] = pd.Series(
                    [None if pd.isna(x) else x.date() for x in decoded[c]],
                    dtype=object,
                )
            for c in pass_cols:
                decoded[c] = pdf[c].values
            yield decoded[out_cols]

    return raw_df.mapInPandas(fn, schema=out_schema)
