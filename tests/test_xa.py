"""XA two-phase transactions, INCIDENT gap events, STOP (S8 surface).

MySQL flushes an XA transaction's row events to the binlog at ``XA
PREPARE``; the COMMIT/ROLLBACK decision arrives later as a top-level QUERY
event, possibly after unrelated transactions. The reference enumerates
XA_PREPARE / INCIDENT / STOP (``EventType.java:46,159,199``) but keeps only
EXT_*_ROWS in its client loop (``BinlogClient.java:191-195``) — it applies
XA rows at prepare time and so would replicate data a later ``XA ROLLBACK``
never committed, and it keeps applying past an INCIDENT gap. Our
buffer-at-prepare / emit-at-terminal handling and the loud gap error exceed
the reference.
"""

import struct

import pytest
from test_binlog_packets import _row, _rows_body, _synthetic_table_map

from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_WRITE_ROWS,
    INCIDENT_EVENT,
    QUERY_EVENT,
    STOP_EVENT,
    TABLE_MAP_EVENT,
    XA_PREPARE_EVENT,
    BinlogGapError,
    parse_event_body,
    parse_incident,
    parse_xa_prepare,
    parse_xa_statement,
    packets_to_changelog,
)

import datetime as dt
from decimal import Decimal

COLS = ["id", "name", "amt", "d"]


def _query(sql: str, schema: str = "s") -> bytes:
    sb = schema.encode()
    return (
        struct.pack("<IIBHH", 0, 0, len(sb), 0, 0) + sb + b"\x00" + sql.encode()
    )


def _xa_prepare_body(gtrid: bytes, bqual: bytes = b"", format_id: int = 1,
                     one_phase: bool = False) -> bytes:
    return (
        bytes([1 if one_phase else 0])
        + format_id.to_bytes(4, "little")
        + len(gtrid).to_bytes(4, "little")
        + len(bqual).to_bytes(4, "little")
        + gtrid
        + bqual
    )


def _incident_body(msg: str, itype: int = 1) -> bytes:
    mb = msg.encode()
    return itype.to_bytes(2, "little") + bytes([len(mb)]) + mb


def _insert(i: int, name: str) -> tuple[int, bytes]:
    return (
        EXT_WRITE_ROWS,
        _rows_body([_row(i, name, Decimal("1.00"), dt.date(2026, 1, 1))]),
    )


TM = (TABLE_MAP_EVENT, _synthetic_table_map())


def test_parse_xa_prepare_golden():
    xp = parse_xa_prepare(_xa_prepare_body(b"gt1", b"bq1", format_id=7))
    assert not xp.one_phase
    assert xp.xid_key() == (7, b"gt1", b"bq1")
    assert parse_xa_prepare(_xa_prepare_body(b"g", one_phase=True)).one_phase


def test_parse_xa_statement_forms():
    # the binlog's hex form, with bqual and formatID
    assert parse_xa_statement("XA START X'676731',X'6271',5") == (
        "START", (5, b"gg1", b"bq"), False,
    )
    # quoted form, defaults bqual='' formatID=1
    assert parse_xa_statement("xa commit 'trn-9'") == (
        "COMMIT", (1, b"trn-9", b""), False,
    )
    verb, xid, one = parse_xa_statement("XA COMMIT X'61' ONE PHASE")
    assert verb == "COMMIT" and xid == (1, b"a", b"") and one
    assert parse_xa_statement("XA ROLLBACK X'61'")[0] == "ROLLBACK"
    assert parse_xa_statement("XA END X'61'")[0] == "END"
    assert parse_xa_statement("BEGIN") is None
    assert parse_xa_statement("CREATE TABLE xa_log (i INT)") is None


def test_parse_incident():
    inc = parse_incident(_incident_body("LOST_EVENTS"))
    assert inc.incident_type == 1 and inc.message == "LOST_EVENTS"


def test_xa_rows_held_until_commit_terminal():
    """Rows of a prepared XA txn surface only when XA COMMIT arrives —
    interleaved ordinary transactions are unaffected."""
    xa_block = [
        (QUERY_EVENT, _query("XA START X'676731'")),
        TM,
        _insert(1, "xa-row"),
        (XA_PREPARE_EVENT, _xa_prepare_body(b"gg1")),
    ]
    interleaved = [TM, _insert(2, "plain")]  # XA_PREPARE cleared the map cache
    commit = [(QUERY_EVENT, _query("XA COMMIT X'676731'"))]

    # without the terminal: in-doubt, NOT emitted
    held = packets_to_changelog(xa_block + interleaved, "s", "t", COLS)
    assert held["name"].tolist() == ["plain"]

    done = packets_to_changelog(xa_block + interleaved + commit, "s", "t", COLS)
    assert sorted(done["name"].tolist()) == ["plain", "xa-row"]
    # released rows keep the lsn of the packet that carried them (prepare-
    # order == commit-order per key: the branch held its row locks)
    xa_lsn = done.loc[done["name"] == "xa-row", "source_lsn"].iloc[0]
    plain_lsn = done.loc[done["name"] == "plain", "source_lsn"].iloc[0]
    assert xa_lsn < plain_lsn


def test_xa_rollback_discards_buffered_rows():
    pk = [
        (QUERY_EVENT, _query("XA START X'72')")),
        TM,
        _insert(1, "doomed"),
        (XA_PREPARE_EVENT, _xa_prepare_body(b"r")),
        TM,
        _insert(2, "kept"),
        (QUERY_EVENT, _query("XA ROLLBACK X'72'")),
    ]
    df = packets_to_changelog(pk, "s", "t", COLS)
    assert df["name"].tolist() == ["kept"]


def test_xa_one_phase_commits_at_prepare_event():
    pk = [
        (QUERY_EVENT, _query("XA START X'6F70'")),
        TM,
        _insert(1, "onephase"),
        (XA_PREPARE_EVENT, _xa_prepare_body(b"op", one_phase=True)),
    ]
    df = packets_to_changelog(pk, "s", "t", COLS)
    assert df["name"].tolist() == ["onephase"]


def test_xa_statement_prepare_and_one_phase_commit_stmt():
    """Statement-form terminals: XA PREPARE as SQL, and XA COMMIT ... ONE
    PHASE closing a still-open (unprepared) transaction."""
    pk = [
        (QUERY_EVENT, _query("XA START 'a'")),
        TM,
        _insert(1, "a-row"),
        (QUERY_EVENT, _query("XA END 'a'")),
        (QUERY_EVENT, _query("XA PREPARE 'a'")),
        (QUERY_EVENT, _query("XA COMMIT 'a'")),
        (QUERY_EVENT, _query("XA START 'b'")),
        TM,
        _insert(2, "b-row"),
        (QUERY_EVENT, _query("XA END 'b'")),
        (QUERY_EVENT, _query("XA COMMIT 'b' ONE PHASE")),
    ]
    df = packets_to_changelog(pk, "s", "t", COLS)
    assert sorted(df["name"].tolist()) == ["a-row", "b-row"]


def test_incident_raises_gap_error_by_default():
    pk = [TM, _insert(1, "pre"), (INCIDENT_EVENT, _incident_body("LOST_EVENTS"))]
    with pytest.raises(BinlogGapError, match="LOST_EVENTS"):
        packets_to_changelog(pk, "s", "t", COLS)
    # forensic replay mode continues past the gap marker
    df = packets_to_changelog(
        pk + [_insert(2, "post")], "s", "t", COLS, on_incident="skip"
    )
    assert df["name"].tolist() == ["pre", "post"]


def test_stop_event_ignored():
    pk = [TM, _insert(1, "x"), (STOP_EVENT, b""), TM, _insert(2, "y")]
    df = packets_to_changelog(pk, "s", "t", COLS)
    assert df["name"].tolist() == ["x", "y"]


def test_stop_and_incident_route_via_parse_event_body():
    maps = {}
    from mysql_secure_agent_spark.sources.binlog_packets import Incident, Stop

    assert isinstance(parse_event_body(b"", STOP_EVENT, maps), Stop)
    got = parse_event_body(_incident_body("m"), INCIDENT_EVENT, maps)
    assert isinstance(got, Incident) and got.message == "m"


def test_xa_inside_transaction_payload_container():
    """A compressed (container-wrapped) XA transaction behaves identically
    to its uncompressed form: inner QUERY/XA_PREPARE events route through
    the same state machine, so commit releases and rollback discards."""
    from test_binlog_packets import _inner_event, _payload_event

    from mysql_secure_agent_spark.sources.binlog_packets import (
        TRANSACTION_PAYLOAD_EVENT,
    )

    def xa_container(name: str, gtrid: bytes, rollback: bool) -> list:
        hexid = gtrid.hex()
        ib = _inner_event(QUERY_EVENT, _query(f"XA START X'{hexid}'"))
        ib += _inner_event(TABLE_MAP_EVENT, _synthetic_table_map())
        ib += _inner_event(*_insert(1 if rollback else 2, name))
        ib += _inner_event(XA_PREPARE_EVENT, _xa_prepare_body(gtrid))
        verb = "ROLLBACK" if rollback else "COMMIT"
        term = _inner_event(QUERY_EVENT, _query(f"XA {verb} X'{hexid}'"))
        return [
            (TRANSACTION_PAYLOAD_EVENT, _payload_event(ib)),
            (TRANSACTION_PAYLOAD_EVENT, _payload_event(term)),
        ]

    pk = xa_container("dropped", b"r1", rollback=True) + xa_container(
        "landed", b"c1", rollback=False
    )
    df = packets_to_changelog(pk, "s", "t", COLS)
    assert df["name"].tolist() == ["landed"]


def test_incident_inside_container_raises():
    from test_binlog_packets import _inner_event, _payload_event

    from mysql_secure_agent_spark.sources.binlog_packets import (
        TRANSACTION_PAYLOAD_EVENT,
    )

    ib = _inner_event(INCIDENT_EVENT, _incident_body("LOST_EVENTS"))
    with pytest.raises(BinlogGapError):
        packets_to_changelog(
            [(TRANSACTION_PAYLOAD_EVENT, _payload_event(ib))], "s", "t", COLS
        )
