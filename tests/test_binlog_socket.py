"""Replication-socket client conformance, driven by a fixture server over
a socketpair (no mysqld exists in this environment — the fixture speaks
the public MySQL client/server protocol and serves binlog files built by
``encode_binlog_file``, so the stream bytes are exactly what a server
ships: handshake v10, mysql_native_password auth, COM_QUERY text results,
COM_BINLOG_DUMP, 0x00-marked CRC32-checksummed events, rotation).

Covers the reference's socket-path semantics (Greeting.java:29-57,
BinlogChannel.java:43-236, BinlogClient.java:86-228): auth scramble,
checksum negotiation, head-position query, event-loop position tracking,
timeout/disconnect reconnect-and-resume from the latest position, and the
spool bridge whose on-disk segments are byte-identical to the server's
own binlog files.
"""

import datetime as dt
import os
import socket
import struct
import threading
import zlib
from decimal import Decimal

import pytest

from mysql_secure_agent_spark.sources.binlog_file import (
    encode_binlog_file,
    iter_binlog_events,
)
from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_WRITE_ROWS,
    FORMAT_DESCRIPTION_EVENT,
    ROTATE_EVENT,
    TABLE_MAP_EVENT,
    XID_EVENT,
    packets_to_changelog,
)
from mysql_secure_agent_spark.sources.binlog_socket import (
    BinlogSocketClient,
    PacketChannel,
    ServerError,
    native_password_scramble,
)

from test_binlog_packets import _row, _rows_body, _synthetic_table_map

COLS = ["id", "name", "amount", "day"]
SCRAMBLE = b"0123456789abcdefghij"  # 20 bytes, ASCII-safe


def _events(ids):
    evs = [(TABLE_MAP_EVENT, _synthetic_table_map())]
    for i in ids:
        evs.append(
            (
                EXT_WRITE_ROWS,
                _rows_body(
                    [_row(i, f"n{i}", Decimal(f"{i}.25"), dt.date(2026, 1, 2))]
                ),
            )
        )
    evs.append((XID_EVENT, (1).to_bytes(8, "little")))
    return evs


def _raw_events(data: bytes):
    """(offset, raw_header_bytes, body_with_checksum) per event of a
    binlog file, byte-faithful re-framing."""
    out = []
    off = 4
    for h, body in iter_binlog_events(data):
        header = struct.pack(
            "<IBIIIH",
            h.timestamp,
            h.type_code,
            h.server_id,
            h.event_length,
            h.next_position,
            h.flags,
        )
        out.append((off, header, body))
        off += h.event_length
    return out


class FakeMySQLServer(threading.Thread):
    """One connection's worth of server: handshake, auth check, the query
    surface the client uses, and a binlog dump of ``files`` (ordered dict
    name → file bytes). ``drop_after`` closes the socket after that many
    streamed event packets — the reconnect fixture."""

    def __init__(
        self,
        sock,
        files: dict[str, bytes],
        *,
        password: str = "secret",
        head: tuple[str, int] = ("mysql-bin.000001", 4),
        drop_after: int | None = None,
    ):
        super().__init__(daemon=True)
        self.ch = PacketChannel(sock)
        self.files = files
        self.password = password
        self.head = head
        self.drop_after = drop_after
        self.error: Exception | None = None

    # ------------------------------------------------------------ protocol
    def _greeting(self) -> None:
        payload = (
            bytes([10])
            + b"8.0.36-fixture\x00"
            + (7).to_bytes(4, "little")
            + SCRAMBLE[:8]
            + b"\x00"
            + (0xFFFF).to_bytes(2, "little")
            + bytes([45])
            + (2).to_bytes(2, "little")
            + bytes(13)
            + SCRAMBLE[8:]
            + b"\x00"
            + b"mysql_native_password\x00"
        )
        self.ch.write_packet(payload, 0)
        resp = self.ch.read_packet()
        # HandshakeResponse41: caps(4) maxpkt(4) collation(1) zeros(23)
        # user NUL, token len+token
        user_end = resp.index(0, 32)
        tlen = resp[user_end + 1]
        token = resp[user_end + 2 : user_end + 2 + tlen]
        expected = native_password_scramble(self.password, SCRAMBLE)
        if token != expected:
            self.ch.write_packet(
                b"\xff" + (1045).to_bytes(2, "little") + b"#28000"
                b"Access denied", 2,
            )
            raise PermissionError("bad scramble token")
        self.ch.write_packet(b"\x00\x00\x00\x02\x00\x00\x00", 2)

    def _send_rows(self, rows: list[tuple[str, ...]], n_cols: int) -> None:
        self.ch.write_packet(bytes([n_cols]), 1)
        for _ in range(n_cols):
            self.ch.write_packet(b"\x03def", 0)
        self.ch.write_packet(b"\xfe\x00\x00\x02\x00", 0)
        for row in rows:
            out = b""
            for v in row:
                b = v.encode()
                out += bytes([len(b)]) + b
            self.ch.write_packet(out, 0)
        self.ch.write_packet(b"\xfe\x00\x00\x02\x00", 0)

    def _serve_query(self, sql: str) -> None:
        s = sql.lower().strip()
        if s.startswith("set "):
            self.ch.write_packet(b"\x00\x00\x00\x02\x00\x00\x00", 1)
        elif "binlog_checksum" in s:
            self._send_rows([("binlog_checksum", "CRC32")], 2)
        elif "@@server_id" in s:
            self._send_rows([("123",)], 1)
        elif "master status" in s:
            self._send_rows([(self.head[0], str(self.head[1]))], 2)
        else:
            raise AssertionError(f"fixture has no answer for {sql!r}")

    def _serve_dump(self, payload: bytes) -> None:
        if self.drop_after == 0:
            # pathological server: dies before any stream progress — the
            # client's reconnect budget must exhaust instead of spinning
            self.ch.close()
            return
        pos, _flags, _sid = struct.unpack("<IHI", payload[1:11])
        fname = payload[11:].decode()
        # artificial start rotate (timestamp 0) + requested file from pos,
        # then every successor file in order
        body = int(pos).to_bytes(8, "little") + fname.encode()
        header = struct.pack(  # artificial: LOG_EVENT_ARTIFICIAL_F, pos 0
            "<IBIIIH", 0, ROTATE_EVENT, 1, 19 + len(body) + 4, 0, 0x20
        )
        art = header + body
        art += zlib.crc32(art).to_bytes(4, "little")
        self.ch.write_packet(b"\x00" + art, 1)
        names = list(self.files)
        served = 0
        for name in names[names.index(fname):]:
            start = pos if name == fname else 4
            for off, rh, rbody in _raw_events(self.files[name]):
                if rh[4] != FORMAT_DESCRIPTION_EVENT and off < start:
                    continue
                self.ch.write_packet(b"\x00" + rh + rbody, 0)
                served += 1
                if self.drop_after is not None and served >= self.drop_after:
                    self.ch.close()
                    return
        self.ch.write_packet(b"\xfe\x00\x00\x02\x00", 0)

    def run(self) -> None:
        try:
            self._greeting()
            while True:
                pkt = self.ch.read_packet()
                if not pkt:
                    return
                if pkt[0] == 0x03:
                    self._serve_query(pkt[1:].decode())
                elif pkt[0] == 0x12:
                    self._serve_dump(pkt)
                    return
                else:
                    raise AssertionError(f"unexpected command {pkt[0]:#x}")
        except (PermissionError, EOFError, OSError):
            pass
        except Exception as e:  # surface fixture bugs to the test
            self.error = e
        finally:
            self.ch.close()


def _factory(files, **server_kw):
    """connect_factory spawning a fresh fixture server per connection."""
    servers = []

    def connect():
        a, b = socket.socketpair()
        srv = FakeMySQLServer(b, files, **server_kw)
        srv.start()
        servers.append(srv)
        return a

    return connect, servers


@pytest.fixture()
def two_files():
    f1 = encode_binlog_file(
        _events([1, 2, 3]), checksum=True, next_file="mysql-bin.000002"
    )
    f2 = encode_binlog_file(_events([4, 5]), checksum=True)
    return {"mysql-bin.000001": f1, "mysql-bin.000002": f2}


def test_auth_scramble_accepted_and_rejected(two_files):
    connect, _ = _factory(two_files)
    good = BinlogSocketClient(connect, "repl", "secret")
    good.connect().close()
    bad = BinlogSocketClient(connect, "repl", "wrong")
    with pytest.raises(ServerError, match="Access denied"):
        bad.connect()


def test_current_position_clamped(two_files):
    connect, _ = _factory(two_files, head=("mysql-bin.000002", 0))
    c = BinlogSocketClient(connect, "repl", "secret")
    assert c.current_position() == ("mysql-bin.000002", 4)


def test_dump_decodes_across_rotation(two_files):
    connect, servers = _factory(two_files)
    c = BinlogSocketClient(connect, "repl", "secret")
    packets = [
        (t, body) for t, _h, body in c.events("mysql-bin.000001")
    ]
    assert c.checksum_length == 4  # negotiated CRC32
    rows = packets_to_changelog(
        packets, "s", "t", COLS, checksum_length=c.checksum_length
    )
    assert list(rows["id"]) == [1, 2, 3, 4, 5]
    # final position: inside the successor file, past its magic
    assert c.position[0] == "mysql-bin.000002"
    assert c.position[1] > 4
    assert all(s.error is None for s in servers)


def test_reconnect_resumes_without_duplicates(two_files):
    # every connection drops after 3 streamed packets; the client must
    # resume from its tracked position and deliver each event ONCE
    connect, servers = _factory(two_files, drop_after=3)
    c = BinlogSocketClient(connect, "repl", "secret")
    packets = [(t, b) for t, _h, b in c.events("mysql-bin.000001")]
    rows = packets_to_changelog(
        packets, "s", "t", COLS, checksum_length=c.checksum_length
    )
    assert list(rows["id"]) == [1, 2, 3, 4, 5]
    assert len(servers) > 1  # reconnects actually happened
    assert all(s.error is None for s in servers)


def test_reconnect_budget_exhausts(two_files):
    connect, _ = _factory(two_files, drop_after=0)
    c = BinlogSocketClient(connect, "repl", "secret")
    with pytest.raises(Exception, match="stream lost|closed"):
        list(c.events("mysql-bin.000001", max_reconnects=2))


def test_spool_segments_byte_identical(two_files, tmp_path):
    connect, servers = _factory(two_files)
    c = BinlogSocketClient(connect, "repl", "secret")
    out = str(tmp_path / "spool")
    paths = c.spool(out, "mysql-bin.000001")
    assert [os.path.basename(p) for p in paths] == list(two_files)
    for p in paths:
        with open(p, "rb") as f:
            assert f.read() == two_files[os.path.basename(p)]
    assert all(s.error is None for s in servers)


def test_spooled_segments_feed_directory_tail(two_files, tmp_path, spark):
    """End-to-end bridge: socket → spool → the existing DISTRIBUTED
    directory-tail ingest (binaryFile stream, CRC verified, bucketed
    merge) — the socket path terminates in the same lake table as every
    other transport."""
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.streaming.binlog_tail import (
        BinlogDirectoryTail,
    )
    from pyspark.sql import types as T

    connect, _ = _factory(two_files)
    c = BinlogSocketClient(connect, "repl", "secret")
    log_dir = str(tmp_path / "spool")
    c.spool(log_dir, "mysql-bin.000001")

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DecimalType(10, 2)),
            T.StructField("day", T.DateType()),
        ]
    )
    tbl = LakeTable.create(
        str(tmp_path / "tbl"), schema, ["id"], n_buckets=4, overwrite=True
    )
    tail = BinlogDirectoryTail(tbl, log_dir, "s", "t", verify_checksum=True)
    tail.run(spark, str(tmp_path / "ck"))
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == {1, 2, 3, 4, 5}
