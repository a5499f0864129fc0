"""On-disk binlog FILE source: ``mysql-bin.NNNNNN`` → changelog DataFrame.

The reference consumes binlog events only over a live replication socket —
``source/binlog/client/EventReader.java`` frames packets off the stream the
DUMP command opened (``client/shyiko/BinlogChannel.java:43-236``); it has no
reader for the server's on-disk binlog files. At bulk scale the files
themselves are the natural interchange: ``mysqlbinlog --raw``, filesystem
snapshots, and object-store archival all deliver ``mysql-bin.NNNNNN`` files,
and a cluster can decode MANY files in parallel (one task per file — a
binlog file cannot be split mid-stream because events are variable-length)
while a socket tail is inherently serial. Reading the files directly also
makes historical backfill a batch job instead of a server re-serve.

The file layout is public (MySQL internals manual "Binary Log Overview";
libbinlogevents ``binlog_event.h``): a 4-byte magic ``0xFE 'b' 'i' 'n'``,
then events back-to-back, each a 19-byte v4 header plus body. The first
event is always FORMAT_DESCRIPTION, which self-describes the checksum
algorithm every later event carries (alg byte at body[-5], see
``parse_format_description``). Each header's ``next_position`` is the
byte offset of the NEXT event (end_log_pos) — the same number ``SHOW
BINLOG EVENTS`` prints and ``BinlogPosition.position`` checkpoints — so a
row's lsn can be derived exactly as ``BinlogPosition.as_lsn`` does:
``file_no * rotate_every + end_log_pos``.

Framing is validated, not trusted: magic, per-event size floor, the
end_log_pos chain, and (optionally) each event's CRC32. A truncated final
event — a server crash mid-write; mysqld itself truncates these during
binlog recovery — raises by default, or is dropped with
``on_torn_tail="truncate"`` (the recovery semantic).
"""

from __future__ import annotations

import os
import re
import struct
import zlib

from .binlog_packets import (
    CHECKSUM_CRC32,
    FORMAT_DESCRIPTION_EVENT,
    ROTATE_EVENT,
    EventHeader,
    parse_event_header,
    parse_format_description,
)

BINLOG_MAGIC = b"\xfebin"  # 0xFE 'b' 'i' 'n'

#: default (file, pos) → lsn stride. ``max_binlog_size`` is capped at 1 GiB
#: and end_log_pos is a u32, so 2**32 guarantees positions never collide
#: across file numbers (BinlogPosition.as_lsn's 1e6 default suits synthetic
#: positions, not byte offsets).
ROTATE_EVERY = 1 << 32


def file_number(path: str) -> int:
    """``.../mysql-bin.000007`` → 7 (the numeric rotation suffix)."""
    m = re.search(r"\.(\d+)$", path)
    if not m:
        raise ValueError(f"binlog file name has no numeric suffix: {path!r}")
    return int(m.group(1))


#: stream-framing event types that server-id filtering must never drop
_FRAMING_TYPES = frozenset({FORMAT_DESCRIPTION_EVENT, ROTATE_EVENT, 0x03, 0x23})


def iter_binlog_events(
    data: bytes,
    *,
    verify_checksum: bool = False,
    on_torn_tail: str = "raise",
    ignore_server_ids: frozenset[int] | set[int] = frozenset(),
):
    """Walk one binlog file's bytes, yielding ``(EventHeader, body)``.

    The body INCLUDES the checksum tail (callers strip it exactly like the
    socket path does, via the FDE-derived ``checksum_length``). Yields the
    FDE itself first — feeding the events straight into
    ``packets_to_changelog`` lets the stream self-configure.

    ``verify_checksum``: check each event's CRC32 (ISO-3309, over header +
    body-minus-CRC — the same span the server writes) once the FDE
    announces CRC32. ``on_torn_tail``: "raise" (default) on a truncated
    final event, "truncate" to drop it (mysqld's own binlog-recovery
    behavior for a crash mid-write).
    """
    if on_torn_tail not in ("raise", "truncate"):
        raise ValueError(f"on_torn_tail must be raise|truncate, got {on_torn_tail!r}")
    if data[:4] != BINLOG_MAGIC:
        raise ValueError(
            f"not a binlog file: magic {data[:4]!r} != {BINLOG_MAGIC!r}"
        )
    off = 4
    checksum_length = 0
    first = True
    n = len(data)
    while off < n:
        if off + 19 > n:
            if on_torn_tail == "truncate":
                return
            raise ValueError(f"torn event header at offset {off} (file ends at {n})")
        header_bytes = data[off : off + 19]
        h = parse_event_header(header_bytes)
        if h.event_length < 19:
            raise ValueError(
                f"corrupt event at offset {off}: event_length {h.event_length} < 19"
            )
        end = off + h.event_length
        if end > n:
            if on_torn_tail == "truncate":
                return
            raise ValueError(
                f"torn event at offset {off}: declared size {h.event_length} "
                f"runs past end of file ({n})"
            )
        body = data[off + 19 : end]
        if first:
            if h.type_code != FORMAT_DESCRIPTION_EVENT:
                raise ValueError(
                    "first event is not FORMAT_DESCRIPTION "
                    f"(type {h.type_code:#04x}) — checksum config unknown"
                )
            _, checksum_length = parse_format_description(body)
            # Corruption the alg byte alone cannot protect against: a flip
            # turning CRC32(1) into NONE(0) silently disables ALL later
            # verification (real readers share this gap — the alg byte is
            # the only signal). Probe: if the FDE claims no checksum but
            # its own tail verifies as a CRC32 of the rest of the frame,
            # the file is overwhelmingly likely checksummed (false-positive
            # odds 2^-32) and the alg byte is the corrupt bit — refuse.
            if verify_checksum and checksum_length == 0 and len(body) >= 9:
                # the CRC covers the alg byte itself, so test the frame
                # with the alg byte restored to CRC32
                patched = bytearray(body[:-4])
                patched[-1] = 0x01  # CHECKSUM_CRC32
                if int.from_bytes(body[-4:], "little") == zlib.crc32(
                    header_bytes + bytes(patched)
                ):
                    raise ValueError(
                        "FORMAT_DESCRIPTION declares no checksum but its "
                        "tail verifies as a CRC32 with the alg byte "
                        "restored — checksum-alg byte corrupt"
                    )
            first = False
        if verify_checksum and checksum_length:
            want = int.from_bytes(body[-4:], "little")
            got = zlib.crc32(header_bytes + body[:-4])
            if want != got:
                raise ValueError(
                    f"binlog event CRC32 mismatch at offset {off}: "
                    f"stored {want:#010x}, computed {got:#010x}"
                )
        # end_log_pos chain: next_position is the offset of the next event.
        # Artificial events (a ROTATE the server fabricates for a connecting
        # replica) carry 0 — skip the check for those.
        if h.next_position not in (0, end):
            raise ValueError(
                f"end_log_pos chain broken at offset {off}: header says "
                f"{h.next_position}, next event starts at {end}"
            )
        # circular-replication loop prevention (MySQL replicate-same-
        # server-id=0 / IGNORE_SERVER_IDS): drop events ORIGINATING from an
        # ignored server — relays preserve the origin id in the header, so
        # a server's own changes coming back around carry its id. Framing
        # events (FDE/ROTATE/STOP/PREVIOUS_GTIDS) always pass: they
        # describe the FILE, not a change, and the checksum/rotation state
        # machine needs them regardless of who wrote the file.
        if (
            ignore_server_ids
            and h.server_id in ignore_server_ids
            and h.type_code not in _FRAMING_TYPES
        ):
            off = end
            continue
        yield h, body
        off = end


def binlog_file_to_packets(
    data: bytes,
    *,
    lsn_base: int = 0,
    verify_checksum: bool = False,
    on_torn_tail: str = "raise",
    ignore_server_ids: frozenset[int] | set[int] = frozenset(),
    return_origins: bool = False,
):
    """One file's bytes → ``[(type_code, body, lsn)]`` ready for
    ``packets_to_changelog``: lsn = ``lsn_base + end_log_pos``, the exact
    ``BinlogPosition.as_lsn`` encoding, so positions from different files
    interleave in true log order when ``lsn_base = file_no * ROTATE_EVERY``.

    ``return_origins``: also return ``{lsn: header server_id}`` — the
    origin of every event, keyed by the same lsn the changelog rows carry,
    so callers can stamp per-row provenance without re-walking the file.
    """
    out = []
    origins: dict[int, int] = {}
    off = 4
    for h, body in iter_binlog_events(
        data,
        verify_checksum=verify_checksum,
        on_torn_tail=on_torn_tail,
        ignore_server_ids=ignore_server_ids,
    ):
        off += h.event_length
        pos = h.next_position or off
        out.append((h.type_code, body, lsn_base + pos))
        origins[lsn_base + pos] = h.server_id
    if return_origins:
        return out, origins
    return out


def read_binlog_files(
    spark,
    path,
    schema_name: str,
    table_name: str,
    column_names: list[str],
    result_schema: str,
    *,
    rotate_every: int = ROTATE_EVERY,
    verify_checksum: bool = True,
    on_torn_tail: str = "raise",
    ignore_server_ids: frozenset[int] | set[int] = frozenset(),
    emit_origin: bool = False,
):
    """Distributed decode of a directory/glob of on-disk binlog files.

    ``spark.read.format("binaryFile")`` lists the files; each decode task
    handles whole files (events are variable-length — a file cannot be
    split mid-stream; parallelism = file count, which is how servers
    rotate anyway: one file per ``max_binlog_size``). Each emitted row's
    ``source_lsn`` is ``file_no * rotate_every + end_log_pos`` — globally
    ordered across files without any cross-file coordination, so
    last-image-wins reconciliation downstream needs no shuffle beyond its
    usual key exchange.

    ``result_schema`` is the output DDL string ("op string, ...,
    source_lsn long"); its column names must match ``column_names`` plus
    op/source_lsn (the decode emits exactly those).

    ``path`` may also be an already-loaded DataFrame carrying ``path`` and
    ``content`` columns (e.g. one micro-batch of a streaming binaryFile
    source — see ``streaming/binlog_tail.py``).

    ``ignore_server_ids`` drops events ORIGINATING from those servers
    (circular-replication loop prevention — a relay preserves the origin
    id, so a server tails its peers with its own id in the set and its
    changes cannot echo back). ``emit_origin`` appends an ``_origin`` int
    column (the header server_id of the event that carried each row) so a
    relay can preserve provenance when re-exporting; ``result_schema``
    must then include ``_origin int``.
    """
    from pyspark.sql import DataFrame as _DF

    if "source_lsn" in column_names:
        # the decode appends the FILE-position lsn under that name; a
        # payload column shadowing it would silently duplicate the label
        raise ValueError(
            "column_names must not contain 'source_lsn' — name the "
            "payload's own lsn column differently (e.g. 'lsn')"
        )
    if isinstance(path, _DF):
        files = path.select("path", "content")
    else:
        files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches):
        from .binlog_packets import packets_to_changelog

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                base = file_number(rec["path"]) * rotate_every
                packets, origins = binlog_file_to_packets(
                    bytes(rec["content"]),
                    lsn_base=base,
                    verify_checksum=verify_checksum,
                    on_torn_tail=on_torn_tail,
                    ignore_server_ids=ignore_server_ids,
                    return_origins=True,
                )
                rows = packets_to_changelog(
                    packets, schema_name, table_name, column_names
                )
                cols = ["op", *column_names, "source_lsn"]
                if emit_origin:
                    rows["_origin"] = (
                        rows["source_lsn"].map(origins).astype("int64")
                    )
                    cols.append("_origin")
                yield rows[cols]

    return files.mapInPandas(decode, schema=result_schema)


# ------------------------------------------------------ GTID file pruning
def read_file_head(path: str, *, max_events: int = 4) -> dict:
    """Read ONLY a binlog file's head (magic + FDE + the PREVIOUS_GTIDS
    every GTID-mode server writes right after it) — a few hundred bytes,
    no body decode. Returns ``{"server_version", "checksum_length",
    "previous_gtids": {sid: [(start, end)]} | None}``."""
    from .binlog_packets import (
        PREVIOUS_GTIDS_EVENT,
        parse_previous_gtids,
    )

    with open(path, "rb") as f:
        data = f.read(65536)
    out = {"server_version": None, "checksum_length": 0, "previous_gtids": None}
    for i, (h, body) in enumerate(
        iter_binlog_events(data, on_torn_tail="truncate")
    ):
        if h.type_code == FORMAT_DESCRIPTION_EVENT:
            out["server_version"], out["checksum_length"] = (
                parse_format_description(body)
            )
        elif h.type_code == PREVIOUS_GTIDS_EVENT:
            tail = out["checksum_length"]
            out["previous_gtids"] = parse_previous_gtids(
                body[:-tail] if tail else body
            ).intervals
            break
        if i + 1 >= max_events:
            break
    return out


def parse_gtid_set_string(s: str) -> dict[str, list[tuple[int, int]]]:
    """``sid:1-5:7,sid2:1-3`` (the SHOW MASTER STATUS / PreviousGtids
    printed form) → {sid: [(start, end)] inclusive}."""
    out: dict[str, list[tuple[int, int]]] = {}
    for part in filter(None, (p.strip() for p in s.split(","))):
        sid, *spans = part.split(":")
        ivs = []
        for sp in spans:
            a, _, b = sp.partition("-")
            ivs.append((int(a), int(b) if b else int(a)))
        out[sid] = sorted(ivs)
    return out


def _merge_intervals(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    merged: list[list[int]] = []
    for a, b in sorted(ivs):
        if merged and a <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return [(a, b) for a, b in merged]


def gtid_set_covers(
    executed: dict[str, list[tuple[int, int]]],
    sub: dict[str, list[tuple[int, int]]],
) -> bool:
    """True iff every transaction in ``sub`` is in ``executed``."""
    for sid, ivs in sub.items():
        have = _merge_intervals(executed.get(sid, []))
        for a, b in ivs:
            if not any(ha <= a and b <= hb for ha, hb in have):
                return False
    return True


def prune_binlog_files(
    paths: list[str],
    executed: dict[str, list[tuple[int, int]]] | str,
) -> tuple[list[str], list[str]]:
    """GTID-based backfill pruning (``mysqlbinlog --exclude-gtids``'
    whole-file logic; the reference has no analog — its cursor is a
    single (file, position), state/AgentState.java:14-17): file *i*
    contains exactly the transactions in PREV(i+1) − PREV(i), so file
    *i* can be SKIPPED — never opened beyond its head — iff the NEXT
    file's PREVIOUS_GTIDS is covered by the executed set. The last file
    has no successor head to bound it and is always kept, as is any file
    around a non-GTID head (conservative). O(files) head reads driver-
    side, a few hundred bytes each; on a year-long archive a resume
    touches only the tail it actually needs.

    Returns ``(skipped, kept)`` in file order."""
    if isinstance(executed, str):
        executed = parse_gtid_set_string(executed)
    ordered = sorted(paths, key=file_number)
    heads = [read_file_head(p) for p in ordered]
    skipped, kept = [], []
    for i, p in enumerate(ordered):
        nxt = heads[i + 1]["previous_gtids"] if i + 1 < len(ordered) else None
        if nxt is not None and gtid_set_covers(executed, nxt):
            skipped.append(p)
        else:
            kept.append(p)
    return skipped, kept


def encode_previous_gtids(
    intervals: dict[str, list[tuple[int, int]]]
) -> bytes:
    """Write-side inverse of ``parse_previous_gtids`` (fixtures/export):
    inclusive intervals → wire body (end-exclusive)."""
    out = len(intervals).to_bytes(8, "little")
    for sid in sorted(intervals):
        out += bytes.fromhex(sid.replace("-", ""))
        ivs = intervals[sid]
        out += len(ivs).to_bytes(8, "little")
        for a, b in ivs:
            out += a.to_bytes(8, "little") + (b + 1).to_bytes(8, "little")
    return out


# --------------------------------------------------------------- write side
def encode_binlog_file(
    events,
    *,
    server_version: str = "8.0.36-engine",
    checksum: bool = True,
    server_id: int = 1,
    timestamp: int = 0,
    next_file: str | None = None,
) -> bytes:
    """The write-side inverse (fixtures + binlog-format export): frame
    ``(type_code, body)`` events into one on-disk binlog file — magic, a
    FORMAT_DESCRIPTION first (alg byte + its own CRC, the >=5.6.1 tail
    ``parse_format_description`` reads at body[-5]), correct end_log_pos
    chaining, per-event CRC32 when ``checksum``, and an optional trailing
    ROTATE naming ``next_file`` (how real files hand off to their
    successor).
    """
    out = bytearray(BINLOG_MAGIC)

    def emit(type_code: int, body: bytes, sid: int | None = None) -> None:
        tail = 4 if checksum else 0
        size = 19 + len(body) + tail
        header = struct.pack(
            "<IBIIIH", timestamp, type_code,
            server_id if sid is None else sid,
            size, len(out) + size, 0,
        )
        out.extend(header)
        out.extend(body)
        if checksum:
            out.extend(
                zlib.crc32(header + body).to_bytes(4, "little")
            )

    # FDE: binlog_version(2) + server_version(50 NUL-padded) + create_ts(4)
    # + common_header_length(1) + per-type post-header lengths (one byte per
    # known type; zeros are fine — nothing here consumes them) + alg byte.
    sv = server_version.encode("latin1")[:50]
    fde = (
        (4).to_bytes(2, "little")
        + sv + b"\x00" * (50 - len(sv))
        + timestamp.to_bytes(4, "little")
        + bytes([19])
        + bytes(40)
        + bytes([CHECKSUM_CRC32 if checksum else 0])
    )
    # the FDE always carries the 4-byte checksum field after the alg byte
    # (zeros when alg=NONE) so body[-5] is the alg byte either way
    if checksum:
        emit(FORMAT_DESCRIPTION_EVENT, fde)
    else:
        size = 19 + len(fde) + 4
        header = struct.pack(
            "<IBIIIH", timestamp, FORMAT_DESCRIPTION_EVENT, server_id,
            size, len(out) + size, 0,
        )
        out.extend(header + fde + bytes(4))
    for ev in events:
        # (type, body) or (type, body, origin_server_id) — a relay stamps
        # each event with the id of the server it ORIGINATED from, which is
        # what makes downstream loop filtering possible
        emit(*ev)
    if next_file is not None:
        emit(ROTATE_EVENT, (4).to_bytes(8, "little") + next_file.encode())
    return bytes(out)
