"""Cross-table transaction-consistency groups (atomic multi-table publish).

One binlog transaction routinely spans tables — its XID covers every rows
event since the last commit regardless of table (the reference applies them
on one thread in log order, so its sink is trivially transaction-consistent:
``Updater.java:148-186``, one ``BucketOutput`` flush per cycle). The Spark
demux (`streaming/demux.py`) merges each routed table INDEPENDENTLY: a crash
— or just a reader racing the loop — between table A's commit and table B's
exposes a TORN transaction (A has the txn's rows, B does not yet).

``TransactionGroup`` restores the reference's consistency contract on a
distributed sink with per-table commit logs, using the classic two-phase
pattern over the lake's existing write-audit-publish primitives:

1. **Prepare** — every routed table merges with ``wap_id`` set: all cluster
   work (dedup shuffle, normalize, bucketed write) runs now, but each result
   is a STAGED commit invisible to readers.
2. **Decide** — one atomic marker (`groups/<gid>.intent.json`, tmp+rename)
   records the member set. Before this marker exists the group is
   uncommitted (crash ⇒ staged deltas are aborted); after it exists the
   group MUST complete (crash ⇒ recovery re-drives the publishes — they are
   idempotent: a publish that finds its batch_id applied degrades to skip).
3. **Publish** — each member's staged commit swings its table head; the
   per-table versions are then sealed in `groups/<gid>.done.json`, which IS
   the consistent snapshot: ``read_consistent`` resolves each table at its
   last-done version, so no reader that opts in can ever observe a torn
   group, even while step 3 is mid-flight.

Driver work is O(1) per group (markers + publishes are metadata-only); all
data movement happened in the staged merges, which are the same single-pass
bucket-aligned jobs a plain merge runs. At 10^10 events the coordinator adds
two tiny JSON writes per micro-batch — nothing on the data path.

The group directory assumes this coordinator is the tables' only writer
(same single-writer model as the streaming pipeline's checkpoint).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

_GID_SAFE = re.compile(r"[^A-Za-z0-9._-]")


def _gid(batch_id: str | int) -> str:
    """Filename-safe, lexicographically monotone group id. Integer batch ids
    (streaming epochs) zero-pad so string order == numeric order."""
    s = str(batch_id)
    if s.isdigit():
        return s.zfill(12)
    return _GID_SAFE.sub("-", s)


class TransactionGroup:
    """Atomic cross-table publication for one consistency group of tables.

    ``tables``: {table_ref: LakeTable} — the group. ``coord_dir`` holds the
    group commit log (intent/done markers) and must live with the pipeline
    checkpoint (same durability domain).
    """

    def __init__(self, tables: dict[str, LakeTable], coord_dir: str):
        self.tables = dict(tables)
        self.coord_dir = coord_dir
        self._groups_dir = os.path.join(coord_dir, "groups")
        os.makedirs(self._groups_dir, exist_ok=True)
        self._ensure_baseline()

    # ------------------------------------------------------------- markers
    def _intent_path(self, gid: str) -> str:
        return os.path.join(self._groups_dir, f"{gid}.intent.json")

    def _done_path(self, gid: str) -> str:
        return os.path.join(self._groups_dir, f"{gid}.done.json")

    @staticmethod
    def _write_atomic(path: str, payload: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(payload, indent=1, sort_keys=True))
        os.replace(tmp, path)

    def _ensure_baseline(self) -> None:
        """Pin the pre-group table versions so read_consistent has a snapshot
        even before the first group completes (and while it is mid-publish)."""
        path = os.path.join(self.coord_dir, "baseline.json")
        if not os.path.exists(path):
            self._write_atomic(
                path,
                {"versions": {r: t.current_version() for r, t in self.tables.items()}},
            )

    def _list(self, suffix: str) -> list[str]:
        return sorted(
            n[: -len(suffix)]
            for n in os.listdir(self._groups_dir)
            if n.endswith(suffix)
        )

    # ------------------------------------------------------------ commit
    def commit_batch(
        self,
        spark: SparkSession,
        routed: dict[str, DataFrame],
        batch_id: str | int,
        merge_kwargs: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Apply one transaction group: stage every routed table's merge,
        atomically decide, publish all, seal the consistent snapshot.

        Idempotent and crash-resumable at every boundary: replaying a done
        group skips; replaying a decided-but-unpublished group completes it;
        replaying an undecided group aborts the orphaned stages and redoes
        the merges (their cluster work was never visible).
        """
        self.recover()
        gid = _gid(batch_id)
        batch_id = str(batch_id)
        if os.path.exists(self._done_path(gid)):
            return {"skipped": True, "gid": gid}

        wap_id = f"txg-{gid}"
        if not os.path.exists(self._intent_path(gid)):
            members: dict[str, dict[str, Any]] = {}
            for ref, df in routed.items():
                if ref not in self.tables:
                    raise KeyError(f"routed table {ref!r} is not in the group")
                r = self.tables[ref].merge(
                    spark,
                    df,
                    batch_id=f"{batch_id}.{ref}",
                    wap_id=wap_id,
                    **(merge_kwargs or {}),
                )
                members[ref] = {
                    "batch_id": f"{batch_id}.{ref}",
                    # merge() returns skipped when the batch_id is already
                    # applied — possible only if a prior NON-group path
                    # committed it; the member is then already published.
                    "staged": not r.get("skipped", False),
                }
            self._write_atomic(
                self._intent_path(gid),
                {"gid": gid, "batch_id": batch_id, "wap_id": wap_id,
                 "members": members},
            )
        return self._settle(gid)

    def _settle(self, gid: str) -> dict[str, Any]:
        """Drive a decided group to done: publish every member's staged
        commit (idempotent), then seal per-table versions for ALL tables in
        the group — non-members pin at their current version."""
        with open(self._intent_path(gid)) as f:
            intent = json.load(f)
        wap_id = intent["wap_id"]
        versions: dict[str, int] = {}
        published: dict[str, Any] = {}
        for ref, m in intent["members"].items():
            table = self.tables[ref]
            try:
                r = table.publish_staged(wap_id)
                published[ref] = r
                if not r.get("skipped"):
                    versions[ref] = r["version"]
            except FileNotFoundError:
                # staged file gone ⇒ a prior settle already published it
                pass
            if ref not in versions:
                head = table.commit_at(resolve=False)
                v = head.applied_batches.get(m["batch_id"])
                versions[ref] = int(v) if v is not None else head.version
        for ref, table in self.tables.items():
            versions.setdefault(ref, table.current_version())
        self._write_atomic(
            self._done_path(gid),
            {"gid": gid, "batch_id": intent["batch_id"], "versions": versions},
        )
        return {"skipped": False, "gid": gid, "versions": versions,
                "published": published}

    # ----------------------------------------------------------- recovery
    def recover(self) -> dict[str, Any]:
        """Settle every decided-but-unsealed group (redo) and abort every
        staged group delta that never reached a decision (undo). Call on
        restart; commit_batch calls it automatically."""
        settled = []
        for gid in self._list(".intent.json"):
            if not os.path.exists(self._done_path(gid)):
                self._settle(gid)
                settled.append(gid)
        decided = {f"txg-{g}" for g in self._list(".intent.json")}
        aborted = 0
        for table in self.tables.values():
            for wid in table.staged_ids():
                if wid.startswith("txg-") and wid not in decided:
                    aborted += table.abort_staged(wid)
        return {"settled": settled, "aborted_files": aborted}

    # ------------------------------------------------------ consistent read
    def consistent_versions(self) -> dict[str, int]:
        """Per-table versions of the latest SEALED group — the newest
        snapshot guaranteed transaction-consistent across the group."""
        done = self._list(".done.json")
        if done:
            with open(self._done_path(done[-1])) as f:
                return {r: int(v) for r, v in json.load(f)["versions"].items()}
        with open(os.path.join(self.coord_dir, "baseline.json")) as f:
            return {r: int(v) for r, v in json.load(f)["versions"].items()}

    def read_consistent(self, spark: SparkSession, ref: str) -> DataFrame:
        """Read one table pinned to the group's consistent snapshot. Reads
        of different tables under the same snapshot never mix a half-applied
        transaction group, even while a publish is mid-flight."""
        return self.tables[ref].read(spark, version=self.consistent_versions()[ref])
