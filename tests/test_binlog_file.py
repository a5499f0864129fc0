"""On-disk binlog FILE framing + distributed file-parallel decode.

The reference reads events only off a replication socket
(source/binlog/client/EventReader.java); the on-disk file format (magic
0xFE 'b' 'i' 'n' + FDE + events, public per the MySQL internals manual)
is covered here: framing round-trip, CRC verification, torn-tail
recovery, end_log_pos chain validation, and the distributed
binaryFile→mapInPandas read path converging to the sequential replay.
"""

import datetime as dt
import os
from decimal import Decimal

import pytest

from mysql_secure_agent_spark.sources.binlog_file import (
    BINLOG_MAGIC,
    ROTATE_EVERY,
    binlog_file_to_packets,
    encode_binlog_file,
    file_number,
    iter_binlog_events,
    read_binlog_files,
)
from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_DELETE_ROWS,
    EXT_WRITE_ROWS,
    FORMAT_DESCRIPTION_EVENT,
    ROTATE_EVENT,
    TABLE_MAP_EVENT,
    XID_EVENT,
    packets_to_changelog,
)

from test_binlog_packets import _row, _rows_body, _synthetic_table_map

COLS = ["id", "name", "amount", "day"]


def _events(ids, op=EXT_WRITE_ROWS):
    evs = [(TABLE_MAP_EVENT, _synthetic_table_map())]
    for i in ids:
        evs.append(
            (op, _rows_body([_row(i, f"n{i}", Decimal(f"{i}.25"), dt.date(2026, 1, 2))]))
        )
    evs.append((XID_EVENT, (1).to_bytes(8, "little")))
    return evs


def test_magic_and_roundtrip_with_crc():
    data = encode_binlog_file(_events([1, 2, 3]), checksum=True)
    assert data[:4] == BINLOG_MAGIC
    got = list(iter_binlog_events(data, verify_checksum=True))
    # FDE + TABLE_MAP + 3 writes + XID
    assert [h.type_code for h, _ in got] == [
        FORMAT_DESCRIPTION_EVENT, TABLE_MAP_EVENT,
        EXT_WRITE_ROWS, EXT_WRITE_ROWS, EXT_WRITE_ROWS, XID_EVENT,
    ]
    rows = packets_to_changelog(
        binlog_file_to_packets(data, verify_checksum=True), "s", "t", COLS
    )
    assert list(rows["id"]) == [1, 2, 3]
    # lsn = end_log_pos of the carrying event: strictly increasing, > 4
    assert rows["source_lsn"].is_monotonic_increasing
    assert (rows["source_lsn"] > 4).all()


def test_roundtrip_without_checksum():
    data = encode_binlog_file(_events([9]), checksum=False)
    rows = packets_to_changelog(binlog_file_to_packets(data), "s", "t", COLS)
    assert list(rows["id"]) == [9]


def test_bad_magic_rejected():
    data = b"PK\x03\x04" + encode_binlog_file(_events([1]))[4:]
    with pytest.raises(ValueError, match="magic"):
        list(iter_binlog_events(data))


def test_corrupt_crc_detected_only_when_verifying():
    data = bytearray(encode_binlog_file(_events([1, 2])))
    data[-1] ^= 0xFF  # flip a bit in the last event's CRC
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        list(iter_binlog_events(bytes(data), verify_checksum=True))
    # without verification the event still frames (the socket path's
    # strip-only behavior, BinlogClient.java:242)
    assert len(list(iter_binlog_events(bytes(data)))) == 5


def test_torn_tail_raise_and_truncate():
    data = encode_binlog_file(_events([1, 2]))
    torn = data[:-5]  # cut into the final event
    with pytest.raises(ValueError, match="torn"):
        list(iter_binlog_events(torn))
    kept = list(iter_binlog_events(torn, on_torn_tail="truncate"))
    # the torn XID is dropped; everything before it survives intact
    assert [h.type_code for h, _ in kept][-1] == EXT_WRITE_ROWS
    assert len(kept) == len(list(iter_binlog_events(data))) - 1


def test_first_event_must_be_fde():
    data = encode_binlog_file(_events([1]))
    # strip the FDE (its size is in the header at offset 4+9)
    fde_size = int.from_bytes(data[4 + 9 : 4 + 13], "little")
    with pytest.raises(ValueError, match="FORMAT_DESCRIPTION"):
        list(iter_binlog_events(data[:4] + data[4 + fde_size :]))


def test_end_log_pos_chain_validated():
    data = bytearray(encode_binlog_file(_events([1])))
    # corrupt the FDE header's next_position field (offset 4+13, 4 bytes)
    data[4 + 13 : 4 + 17] = (999999).to_bytes(4, "little")
    with pytest.raises(ValueError, match="chain broken"):
        list(iter_binlog_events(bytes(data)))


def test_rotate_tail_names_successor():
    data = encode_binlog_file(_events([1]), next_file="mysql-bin.000002")
    h, body = list(iter_binlog_events(data))[-1]
    assert h.type_code == ROTATE_EVENT
    assert body[8:-4] == b"mysql-bin.000002"


def test_file_number():
    assert file_number("/x/mysql-bin.000007") == 7
    with pytest.raises(ValueError):
        file_number("/x/notabinlog")


def test_distributed_read_matches_sequential_replay(spark, tmp_path):
    # 3 rotated files; file 2 deletes a key from file 1 — the merged view
    # must honor cross-file lsn order purely from (file_no, end_log_pos)
    d = tmp_path / "binlogs"
    d.mkdir()
    all_packets = []
    specs = [
        (1, _events([1, 2, 3])),
        (
            2,
            [
                (TABLE_MAP_EVENT, _synthetic_table_map()),
                (EXT_DELETE_ROWS, _rows_body(
                    [_row(2, "n2", Decimal("2.25"), dt.date(2026, 1, 2))])),
                (EXT_WRITE_ROWS, _rows_body(
                    [_row(4, "n4", Decimal("4.25"), dt.date(2026, 1, 2))])),
                (XID_EVENT, (1).to_bytes(8, "little")),
            ],
        ),
        (3, _events([5, 1])),
    ]
    for no, evs in specs:
        data = encode_binlog_file(evs, next_file=f"mysql-bin.{no + 1:06d}")
        (d / f"mysql-bin.{no:06d}").write_bytes(data)
        all_packets += binlog_file_to_packets(data, lsn_base=no * ROTATE_EVERY)
    seq = packets_to_changelog(all_packets, "s", "t", COLS)

    df = read_binlog_files(
        spark,
        os.path.join(str(d), "mysql-bin.*"),
        "s",
        "t",
        COLS,
        "op string, id int, name string, amount decimal(8,2), day date, "
        "source_lsn long",
    )
    got = df.orderBy("source_lsn").toPandas()
    assert list(got["op"]) == list(seq["op"])
    assert list(got["id"]) == list(seq["id"])
    assert list(got["source_lsn"]) == list(seq["source_lsn"])
    # last-image-wins over the file-derived lsn: key 2 deleted, key 1 re-upserted
    import pandas as pd

    live = (
        got.sort_values("source_lsn").groupby("id").last().reset_index()
    )
    live = live[live["op"] != "D"]
    assert sorted(live["id"]) == [1, 3, 4, 5]


def test_explicit_positions_must_be_monotone():
    data = encode_binlog_file(_events([1]))
    pkts = binlog_file_to_packets(data)
    bad = pkts + [(pkts[-1][0], pkts[-1][1], 5)]  # position goes backwards
    with pytest.raises(ValueError, match="non-decreasing"):
        packets_to_changelog(bad, "s", "t", COLS)


# --------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=12),
    checksum=st.booleans(),
)
def test_framing_roundtrip_any_bodies(bodies, checksum):
    # framing is type-agnostic: arbitrary bodies under arbitrary checksum
    # config must walk back out byte-identical, in order
    events = [(0x23, b) for b in bodies]  # IGNORABLE: parser-neutral type
    data = encode_binlog_file(events, checksum=checksum)
    got = list(iter_binlog_events(data, verify_checksum=checksum))
    assert got[0][0].type_code == FORMAT_DESCRIPTION_EVENT
    tail = 4 if checksum else 0
    outs = [b[: len(b) - tail] if tail else b for _, b in got[1:]]
    assert outs == bodies


@settings(max_examples=60, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=100), min_size=1, max_size=8),
    cut=st.integers(min_value=1, max_value=50),
)
def test_any_truncation_is_detected_or_cleanly_dropped(bodies, cut):
    data = encode_binlog_file([(0x23, b) for b in bodies])
    cut = min(cut, len(data) - 5)
    torn = data[:cut + 5]  # keep at least the magic + 1 byte
    try:
        kept = list(iter_binlog_events(torn, on_torn_tail="truncate"))
    except ValueError:
        return  # mid-FDE cut or chain break: loud refusal is also correct
    # whatever survives must be a strict prefix of the original event walk
    orig = list(iter_binlog_events(data))
    assert len(kept) <= len(orig)
    for (h1, b1), (h2, b2) in zip(kept, orig):
        assert h1.type_code == h2.type_code and b1 == b2


@settings(max_examples=40, deadline=None)
@given(
    flip=st.integers(min_value=0, max_value=10_000),
    bodies=st.lists(st.binary(min_size=1, max_size=80), min_size=1, max_size=6),
)
def test_any_single_bitflip_caught_by_crc_or_framing(flip, bodies):
    data = bytearray(encode_binlog_file([(0x23, b) for b in bodies]))
    flip = 4 + (flip % (len(data) - 4))  # never the magic (tested separately)
    data[flip] ^= 0x01
    try:
        got = list(iter_binlog_events(bytes(data), verify_checksum=True))
    except ValueError:
        return  # caught: CRC mismatch, chain break, or bad frame
    # a flip inside the FDE's server-version padding can genuinely escape
    # the CRC? no: CRC covers header+body of every event incl. the FDE —
    # reaching here means the walk succeeded, which must not happen
    raise AssertionError(f"bit flip at {flip} escaped verification: {got}")


# ------------------------------------------------------ GTID file pruning
from mysql_secure_agent_spark.sources.binlog_file import (
    encode_previous_gtids,
    gtid_set_covers,
    parse_gtid_set_string,
    prune_binlog_files,
    read_file_head,
)
from mysql_secure_agent_spark.sources.binlog_packets import (
    PREVIOUS_GTIDS_EVENT,
    parse_previous_gtids,
)

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _gtid_file(tmp_path, no, prev_upto, ids):
    """File `no`: PREVIOUS_GTIDS says [1, prev_upto] already executed."""
    prev = {SID: [(1, prev_upto)]} if prev_upto else {}
    evs = [(PREVIOUS_GTIDS_EVENT, encode_previous_gtids(prev))] + _events(ids)
    p = tmp_path / f"mysql-bin.{no:06d}"
    p.write_bytes(encode_binlog_file(evs, next_file=f"mysql-bin.{no+1:06d}"))
    return str(p)


def test_previous_gtids_roundtrip_and_head_read(tmp_path):
    ivs = {SID: [(1, 5), (7, 7)]}
    assert parse_previous_gtids(encode_previous_gtids(ivs)).intervals == ivs
    p = _gtid_file(tmp_path, 1, 5, [1])
    head = read_file_head(p)
    assert head["previous_gtids"] == {SID: [(1, 5)]}
    assert head["checksum_length"] == 4


def test_gtid_set_covers():
    ex = parse_gtid_set_string(f"{SID}:1-5:7-9")
    assert gtid_set_covers(ex, {SID: [(1, 5)]})
    assert gtid_set_covers(ex, {SID: [(2, 4), (8, 9)]})
    assert not gtid_set_covers(ex, {SID: [(5, 7)]})  # 6 missing
    assert not gtid_set_covers(ex, {"other-sid": [(1, 1)]})
    # adjacent intervals merge: 1-3 + 4-5 covers 2-5
    assert gtid_set_covers({SID: [(1, 3), (4, 5)]}, {SID: [(2, 5)]})


def test_prune_skips_fully_executed_files(tmp_path):
    # file i holds txns (PREV(i), PREV(i+1)]: 1-10, 11-20, 21-30
    paths = [
        _gtid_file(tmp_path, 1, 0, [1]),
        _gtid_file(tmp_path, 2, 10, [2]),
        _gtid_file(tmp_path, 3, 20, [3]),
    ]
    skipped, kept = prune_binlog_files(paths, f"{SID}:1-10")
    assert [file_number(p) for p in skipped] == [1]
    assert [file_number(p) for p in kept] == [2, 3]
    # everything executed: only the unbounded last file survives
    skipped, kept = prune_binlog_files(paths, f"{SID}:1-30")
    assert [file_number(p) for p in skipped] == [1, 2]
    assert [file_number(p) for p in kept] == [3]
    # nothing executed: keep all
    skipped, kept = prune_binlog_files(paths, "")
    assert skipped == [] and len(kept) == 3


def test_prune_conservative_without_gtid_heads(tmp_path):
    # non-GTID files (no PREVIOUS_GTIDS): never skipped
    p1 = tmp_path / "mysql-bin.000001"
    p1.write_bytes(encode_binlog_file(_events([1])))
    p2 = tmp_path / "mysql-bin.000002"
    p2.write_bytes(encode_binlog_file(_events([2])))
    skipped, kept = prune_binlog_files([str(p1), str(p2)], f"{SID}:1-99")
    assert skipped == [] and len(kept) == 2


def test_pruned_backfill_composes_with_distributed_read(spark, tmp_path):
    """Archive resume: prune fully-executed files by GTID head, decode only
    the kept tail distributed, merge — final state equals the full replay
    (the skipped files' rows were already applied; last-image-wins absorbs
    the boundary file's overlap)."""
    d = tmp_path / "archive"
    d.mkdir()
    # three files of writes: ids 1-3, 4-6, 7-9; PREV chains 0 / 3 / 6 txns
    for no, (prev, ids) in enumerate(
        [(0, [1, 2, 3]), (3, [4, 5, 6]), (6, [7, 8, 9])], start=1
    ):
        pg = {SID: [(1, prev)]} if prev else {}
        evs = [(PREVIOUS_GTIDS_EVENT, encode_previous_gtids(pg))] + _events(ids)
        (d / f"mysql-bin.{no:06d}").write_bytes(
            encode_binlog_file(evs, next_file=f"mysql-bin.{no+1:06d}")
        )
    paths = [str(d / f"mysql-bin.{i:06d}") for i in (1, 2, 3)]
    skipped, kept = prune_binlog_files(paths, f"{SID}:1-3")
    assert [file_number(p) for p in skipped] == [1]

    import pandas as pd

    from mysql_secure_agent_spark.sources.binlog_file import ROTATE_EVERY

    got = (
        read_binlog_files(
            spark,
            kept,
            "s",
            "t",
            COLS,
            "op string, id int, name string, amount decimal(8,2), day date, "
            "source_lsn long",
        )
        .orderBy("source_lsn")
        .toPandas()
    )
    assert list(got["id"]) == [4, 5, 6, 7, 8, 9]  # file 1 never decoded
