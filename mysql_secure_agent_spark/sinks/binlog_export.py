"""Binlog-format EXPORT sink: a changelog rendered as ``mysql-bin.NNNNNN``
files.

The reference is strictly one-directional: binlog in, JSONL out
(``output/OutputSpec.java``). This sink closes the loop — a lake
changefeed (``LakeTable.read_changes``), a repaired stream, or any
``(op, columns..., source_lsn)`` DataFrame is re-rendered as REAL binlog
files: magic + FORMAT_DESCRIPTION + per-transaction TABLE_MAP /
EXT_WRITE_ROWS / EXT_DELETE_ROWS / XID framing with CRC32 checksums and
end_log_pos chaining (``sources/binlog_file.encode_binlog_file``). Uses:
feeding downstream MySQL-ecosystem tooling (mysqlbinlog, Debezium-style
replayers, this repo's own ``read_binlog_files``), archiving a changefeed
in the wire format, or fixture generation at scale. Upserts export as
WRITE_ROWS and deletes as DELETE_ROWS: a changefeed carries net NEW
images, so insert-vs-update is not distinguishable (nor meaningful to a
row-idempotent consumer; the same collapse the engine's own replay
applies, Updater.java:148-186 analog).

Distribution: rows are split into ``n_files`` by a uniform lsn-range
cut (deterministic given the data) and each file is written by ONE task
in lsn order — a binlog file is inherently sequential, so per-FILE
parallelism is the correct unit, exactly like the read side. Encoding
is per-row Python over the wire bytes (unavoidable for a byte-exact
variable-length format) but each task streams its shard; nothing ever
gathers on the driver.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.mysql_codecs import (
    BLOB,
    DATETIME_V2,
    DOUBLE,
    FLOAT,
    INT24,
    JSON,
    LONG,
    LONGLONG,
    NEWDECIMAL,
    SHORT,
    TIME_V2,
    TIMESTAMP_V2,
    TINY,
    VARCHAR,
    ColumnSpec,
    encode_typed_rows,
)

DATE = 0x0A


def _packed(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    return b"\xfd" + n.to_bytes(3, "little")


def _column_metadata(spec: ColumnSpec) -> bytes:
    """The TABLE_MAP per-column metadata bytes for this type — the exact
    inverse of ``parse_table_map``'s reader."""
    t, m = spec.type_code, spec.meta or {}
    if t in (FLOAT, DOUBLE):
        return bytes([4 if t == FLOAT else 8])
    if t in (BLOB, JSON):
        return bytes([m.get("len_bytes", 2)])
    if t == VARCHAR:
        return int(m["max_len"]).to_bytes(2, "little")
    if t == NEWDECIMAL:
        return bytes([m["precision"], m["scale"]])
    if t in (TIMESTAMP_V2, DATETIME_V2, TIME_V2):
        return bytes([m.get("fsp", 0)])
    if t in (TINY, SHORT, INT24, LONG, LONGLONG, DATE):
        return b""
    raise NotImplementedError(
        f"binlog export metadata for type {t:#04x} ({spec.name!r})"
    )


def table_map_body(
    table_id: int, schema_name: str, table_name: str, specs: list[ColumnSpec]
) -> bytes:
    meta = b"".join(_column_metadata(s) for s in specs)
    n = len(specs)
    return (
        table_id.to_bytes(6, "little")
        + b"\x00\x00"
        + bytes([len(schema_name)]) + schema_name.encode() + b"\x00"
        + bytes([len(table_name)]) + table_name.encode() + b"\x00"
        + _packed(n)
        + bytes(s.type_code for s in specs)
        + _packed(len(meta)) + meta
        + bytes((n + 7) // 8)  # nullability bitmap (readers skip it)
    )


def rows_event_body(
    table_id: int, n_cols: int, images: list[bytes], n_images: int = 1
) -> bytes:
    bm = bytes([0xFF] * ((n_cols + 7) // 8))  # all columns included
    # mask padding bits beyond n_cols? readers use packed n_cols; 0xFF safe
    return (
        table_id.to_bytes(6, "little")
        + b"\x00\x00"
        + (2).to_bytes(2, "little")  # extra-info length (just itself)
        + _packed(n_cols)
        + bm * n_images
        + b"".join(images)
    )


def write_binlog_changelog(
    df: DataFrame,
    out_dir: str,
    schema_name: str,
    table_name: str,
    specs: list[ColumnSpec],
    *,
    n_files: int = 4,
    txn_rows: int = 64,
    base_file_no: int = 1,
    table_id: int = 7,
    server_version: str = "8.0.36-engine",
    checksum: bool = True,
    server_id: int = 1,
    origin_col: str | None = None,
) -> list[dict[str, Any]]:
    """Export a changelog DataFrame (``op`` U/D + ``specs``-named columns +
    ``source_lsn``) as ``n_files`` rotated binlog files under ``out_dir``.
    Returns the manifest [(file_no, n_events, bytes)]. Eager (the files
    must exist for any reader to plan over them).

    ``server_id`` stamps the event headers (this exporter's identity);
    ``origin_col`` names an int column carrying each row's ORIGIN server
    id instead — the relay contract of circular replication (MySQL
    preserves the originating server's id through the relay log, which is
    what lets every server drop its own changes coming back around).
    Rows are grouped into same-origin runs so each run's TABLE_MAP /
    rows / XID framing carries one origin id."""
    from ..sources.binlog_file import encode_binlog_file
    from ..sources.binlog_packets import (
        EXT_DELETE_ROWS,
        EXT_WRITE_ROWS,
        TABLE_MAP_EVENT,
        XID_EVENT,
    )

    os.makedirs(out_dir, exist_ok=True)
    lo, hi = df.agg(F.min("source_lsn"), F.max("source_lsn")).first()
    if lo is None:
        return []
    span = int(hi) - int(lo) + 1
    names = [s.name for s in specs]
    with_file = df.withColumn(
        "_file_no",
        (
            F.lit(base_file_no)
            + F.floor((F.col("source_lsn") - F.lit(int(lo)))
                      * n_files / F.lit(span))
        ).cast("int"),
    )

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_lsn")
        no = int(pdf["_file_no"].iloc[0])
        tmap = table_map_body(table_id, schema_name, table_name, specs)
        events: list[tuple[int, bytes]] = []
        recs = pdf.to_dict("records")
        for i in range(0, len(recs), txn_rows):
            chunk = recs[i : i + txn_rows]
            # same-origin runs: one TABLE_MAP..XID frame per run, every
            # event stamped with that run's origin id
            runs: list[tuple[int | None, list[dict]]] = []
            for r in chunk:
                o = int(r[origin_col]) if origin_col else None
                if not runs or runs[-1][0] != o:
                    runs.append((o, []))
                runs[-1][1].append(r)
            for o, rs in runs:
                tag = () if o is None else (o,)
                events.append((TABLE_MAP_EVENT, tmap, *tag))
                imgs = encode_typed_rows(specs, rs)
                for r, img in zip(rs, imgs):
                    tc = EXT_DELETE_ROWS if r["op"] == "D" else EXT_WRITE_ROWS
                    events.append(
                        (tc, rows_event_body(table_id, len(specs), [img]), *tag)
                    )
                events.append((XID_EVENT, (1).to_bytes(8, "little"), *tag))
        data = encode_binlog_file(
            events,
            server_version=server_version,
            checksum=checksum,
            server_id=server_id,
            next_file=f"mysql-bin.{no + 1:06d}",
        )
        path = os.path.join(out_dir, f"mysql-bin.{no:06d}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"file_no": [no], "n_events": [len(recs)], "bytes": [len(data)]}
        )

    # source_lsn may itself be an exported column (specs naming it) — don't
    # select it twice
    sel = ["op", *names] + (["source_lsn"] if "source_lsn" not in names else [])
    if origin_col and origin_col not in sel:
        sel.append(origin_col)
    manifest = (
        with_file.select(*sel, "_file_no")
        .groupBy("_file_no")
        .applyInPandas(write_one, "file_no int, n_events long, bytes long")
        .collect()
    )
    return [r.asDict() for r in manifest]
