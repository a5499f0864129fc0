"""Continuous lake→lake replication: tail a LakeTable's commit log.

``read_changes`` makes the lake a replication SOURCE for one window; this
module turns it into a continuously-drained one — the lake-side analog of
the reference's binlog tail loop (``BinlogClient.java`` events loop →
``Updater.update``), with the COMMIT LOG as the binlog and the version
number as the log position:

  reference binlog tail                      ChangefeedTailer
  -----------------------------------       ------------------------------
  server pushes events after DUMP            poll() compares head version
  binlogPosition in AgentState               cursor JSON (version, persisted
                                             AFTER the handler succeeds)
  reconnect replays from saved pos           re-poll re-reads the same
                                             window; deterministic batch id
                                             makes the downstream merge skip
  purged binlog → error 1236                 expired/rewritten window raises
                                             (resync is a policy decision)

Delivery is at-least-once with exactly-once EFFECT downstream: the handler
receives the window's net changes plus a deterministic ``batch_id``
(``cf.<name>.<from>-<to>``) — a merge keyed on it is skipped on replay by
the applied-batch high-water mark, and even a WIDER replay window (crash
before the cursor write, new commits before the retry) converges because
re-applied older images lose to last-image-wins.

Each poll is O(delta) cluster work (listing-pruned to the window's files)
and O(1) driver work (two commit-JSON loads) — a tailer on a 10^10-row
table costs only the micro-batches it hasn't seen.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeTable

__all__ = ["ChangefeedTailer"]


class ChangefeedTailer:
    def __init__(self, source: LakeTable, cursor_path: str, name: str = "cf"):
        self.source = source
        self.cursor_path = cursor_path
        self.name = name

    # ------------------------------------------------------------- cursor
    def cursor(self) -> int:
        if not os.path.exists(self.cursor_path):
            return 0
        with open(self.cursor_path) as f:
            return int(json.load(f)["version"])

    def _save_cursor(self, version: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "name": self.name}, f)
        os.replace(tmp, self.cursor_path)

    # --------------------------------------------------------------- poll
    def poll(
        self,
        spark: SparkSession,
        handler: Callable[[DataFrame, str, tuple[int, int]], Any],
    ) -> int:
        """One poll: if the source head moved past the cursor, hand the
        window's net changes to ``handler(df, batch_id, (from_v, to_v))``,
        then persist the cursor (handler-first — at-least-once). Returns the
        number of versions advanced (0 = idle)."""
        since = self.cursor()
        head = self.source.commit_at(resolve=False).version
        if head <= since:
            return 0
        changes = self.source.read_changes(
            spark, since_lsn=0, since_version=since, version=head
        )
        batch_id = f"cf.{self.name}.{since}-{head}"
        handler(changes, batch_id, (since, head))
        self._save_cursor(head)
        return head - since

    def run_to_idle(
        self,
        spark: SparkSession,
        handler: Callable[[DataFrame, str, tuple[int, int]], Any],
        poll_interval_s: float = 0.0,
        max_polls: int | None = None,
    ) -> int:
        """Poll until the source head stops moving (or ``max_polls``).
        Returns total versions advanced."""
        total, polls = 0, 0
        while max_polls is None or polls < max_polls:
            n = self.poll(spark, handler)
            polls += 1
            total += n
            if n == 0:
                break
            if poll_interval_s:
                time.sleep(poll_interval_s)
        return total

    # -------------------------------------------------------- replication
    def replicate_to(self, dest: LakeTable) -> Callable[[DataFrame, str, tuple], Any]:
        """Handler that merges each window into ``dest`` — lake-to-lake
        continuous replication. The deterministic batch id gives replayed
        windows the exactly-once effect."""

        def handle(df: DataFrame, batch_id: str, window: tuple[int, int]):
            spark = df.sparkSession
            return dest.merge(spark, df, batch_id)

        return handle

    def replicate_to_binlog(
        self,
        out_dir: str,
        schema_name: str,
        table_name: str,
        specs,
    ) -> Callable[[DataFrame, str, tuple], Any]:
        """Handler that exports each window as ONE binlog file — the lake
        acting as a binlog SERVER for downstream MySQL-ecosystem consumers
        (this repo's own ``read_binlog_files``/``BinlogDirectoryTail``
        included). File number = the window's head version, so file order
        is commit order and a crash between export and cursor save simply
        re-renders the SAME window to the SAME file name with byte-
        identical content (the encode is deterministic) — at-least-once
        delivery, idempotent files. Ordering: windows are version-ordered
        and each window carries per-key NET images, so a key's images
        across files are in commit order — file-position lsns are per-key
        monotone and last-image-wins reconciliation is correct on either
        the file-position or a payload lsn."""
        from ..sinks.binlog_export import write_binlog_changelog

        def handle(df: DataFrame, batch_id: str, window: tuple[int, int]):
            return write_binlog_changelog(
                df,
                out_dir,
                schema_name,
                table_name,
                specs,
                n_files=1,
                base_file_no=window[1],
            )

        return handle

    def replicate_to_debezium(
        self,
        out_dir: str,
        key_cols: list[str],
        value_cols: list[str],
        **dbz_kwargs,
    ) -> "Callable[[DataFrame, str, tuple], Any]":
        """Handler that exports each window as Debezium records under
        ``<out_dir>/w<headversion>/`` — the lake publishing its change
        stream in the PUBLIC CDC envelope for Kafka-ecosystem consumers.
        Window-keyed directories make the export idempotent the same way
        the binlog files are: a crash between export and cursor save
        re-renders the SAME window to the SAME directory (deterministic
        contents, overwrite mode). The changefeed carries net per-key
        images with op U/D, which map to Debezium u/d (+ tombstones)."""
        import os as _os

        from ..sinks.debezium import write_debezium

        def handle(df: DataFrame, batch_id: str, window: tuple[int, int]):
            write_debezium(
                df,
                _os.path.join(out_dir, f"w{window[1]:08d}"),
                key_cols,
                value_cols,
                **dbz_kwargs,
            )
            return {"window": window}

        return handle
