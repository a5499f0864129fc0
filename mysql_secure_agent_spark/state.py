"""Agent state (checkpoint) model — SURVEY §1.1 AgentState/TableState parity.

The reference checkpoints ``AgentState {binlogPosition, Map<TableRef,
TableState>}`` with ``TableState {lastSyncedPrimaryKey, finishedImport}`` as a
JSON file written to the bucket after each data flush
(``state/AgentState.java:14-17``, ``state/TableState.java:9-12``,
``output/BucketOutput.java:127-138``; JSON shape in
``test/.../DeserializeSpec.java:54-75``).

In the Spark engine the *streaming* position lives in the Structured
Streaming checkpoint; this module carries the pieces Spark does not:
the resumable-backfill cursor per table (keyset position, S2) and the
import-finished flag for the snapshot→stream handoff (T7). Written with the
same write-data-then-state ordering discipline (atomic ``os.replace``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class BinlogPosition:
    # BinlogPosition {file, position} — source/BinlogPosition.java:6-18
    file: str = ""
    position: int = 0

    def as_lsn(self, rotate_every: int = 1_000_000) -> int:
        """Monotone single-integer encoding of (file, pos) (T4)."""
        try:
            file_no = int(self.file.rsplit(".", 1)[1])
        except (IndexError, ValueError):
            file_no = 0
        return file_no * rotate_every + self.position


@dataclass
class GtidSet:
    """Per-source applied watermark — the MySQL ``gtid_executed`` analog for
    multi-source (sharded) ingest: N upstream shards each with an independent
    binlog/lsn sequence feeding ONE lake table. ``sources`` maps source id →
    highest applied per-source lsn. Events at or below the watermark are
    already applied and get filtered before any shuffle on resume/replay.

    The reference tracks a single (file, pos) because it tails one server
    (``state/AgentState.java:14-17``); a sharded fleet needs one watermark
    per source — exactly what MySQL encodes as a GTID set
    (``server_uuid:1-N`` per source). String form mirrors that shape:
    ``"s0:1-123,s1:1-45"``.
    """

    sources: dict[str, int] = field(default_factory=dict)

    def covers(self, source: str, lsn: int) -> bool:
        return lsn <= self.sources.get(source, -1)

    def advance(self, source: str, lsn: int) -> None:
        if lsn > self.sources.get(source, -1):
            self.sources[source] = int(lsn)

    def merge(self, other: "GtidSet") -> None:
        for s, l in other.sources.items():
            self.advance(s, l)

    def to_string(self) -> str:
        return ",".join(f"{s}:1-{l}" for s, l in sorted(self.sources.items()))

    @staticmethod
    def from_string(s: str) -> "GtidSet":
        out = GtidSet()
        for part in filter(None, (p.strip() for p in s.split(","))):
            src, rng = part.rsplit(":", 1)
            out.sources[src] = int(rng.split("-")[-1])
        return out

    def save(self, path: str) -> None:
        """Atomic write; caller persists AFTER the data commit it covers
        (write-data-then-state, ``BucketOutput.java:127-138``)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"gtid_executed": self.to_string()}))
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "GtidSet":
        if not os.path.exists(path):
            return GtidSet()
        with open(path) as f:
            return GtidSet.from_string(json.load(f).get("gtid_executed", ""))


@dataclass
class TableState:
    # TableState {lastSyncedPrimaryKey, finishedImport} — state/TableState.java:9-12
    last_synced_primary_key: dict[str, object] | None = None
    finished_import: bool = False


@dataclass
class AgentState:
    binlog_position: BinlogPosition = field(default_factory=BinlogPosition)
    tables: dict[str, TableState] = field(default_factory=dict)

    # ---------------------------------------------------------------- serde
    def to_json(self) -> str:
        return json.dumps(
            {
                "binlog_position": {
                    "file": self.binlog_position.file,
                    "position": self.binlog_position.position,
                },
                "tables": {
                    k: {
                        "last_synced_primary_key": t.last_synced_primary_key,
                        "finished_import": t.finished_import,
                    }
                    for k, t in self.tables.items()
                },
            },
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "AgentState":
        d = json.loads(s)
        bp = d.get("binlog_position", {})
        return AgentState(
            binlog_position=BinlogPosition(
                file=bp.get("file", ""), position=bp.get("position", 0)
            ),
            tables={
                k: TableState(
                    last_synced_primary_key=t.get("last_synced_primary_key"),
                    finished_import=t.get("finished_import", False),
                )
                for k, t in d.get("tables", {}).items()
            },
        )

    # ------------------------------------------------------------ persistence
    def save(self, path: str) -> None:
        """Atomic write (data-first-then-state discipline is the caller's:
        persist state only after the data it covers is committed,
        BucketOutput.java:127-138)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.to_json())
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "AgentState":
        with open(path) as f:
            return AgentState.from_json(f.read())
