"""Continuous tail of a binlog FILE directory → exactly-once lake merges.

The deployment the socket can't serve: a server (or `mysqlbinlog --raw`
archiver, or object-store replicator) keeps DROPPING rotated
``mysql-bin.NNNNNN`` files into a directory; this tails the directory as a
Structured Streaming source and merges each micro-batch exactly-once. The
reference's only ingress is a live DUMP socket (client/EventReader.java) —
it cannot resume from archived files at all, and a socket tail is
inherently serial; here every discovered file decodes in parallel
(variable-length events forbid intra-file splits; per-FILE parallelism is
the format's correct unit) and the merge fans out cluster-wide.

Exactly-once composition, both layers idempotent:
* the file source's checkpoint pins which files belong to which epoch —
  a restart replays the same files under the same epoch;
* the replayed epoch's merge is skipped by the table's batch-id ledger
  (ids namespaced per checkpoint incarnation, the
  ``streaming/pipeline.py`` discipline — two tails of different
  directories into one table cannot collide).

Ordering needs no coordination: each row's lsn is
``file_no * rotate_every + end_log_pos`` (``BinlogPosition.as_lsn``), so
last-image-wins reconciliation is correct no matter how files land in
epochs or how epochs interleave across restarts.

Files must land COMPLETE (write to a temp name, then rename — what
``sinks/binlog_export`` and every sane archiver do): the file source
snapshots a file once. The server's ACTIVE file (still being appended)
should be excluded from the drop directory until rotated; a torn final
event in a crashed drop raises loudly at decode rather than mis-framing.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

from pyspark.sql import SparkSession

from ..lake.table import LakeTable
from ..sources.binlog_file import ROTATE_EVERY, read_binlog_files


class BinlogDirectoryTail:
    def __init__(
        self,
        table: LakeTable,
        log_dir: str,
        schema_name: str,
        table_name: str,
        *,
        rotate_every: int = ROTATE_EVERY,
        verify_checksum: bool = True,
        max_files_per_trigger: int | None = None,
        batch_id_prefix: str | None = None,
    ):
        self.table = table
        self.log_dir = log_dir
        self.schema_name = schema_name
        self.table_name = table_name
        self.rotate_every = rotate_every
        self.verify_checksum = verify_checksum
        self.max_files_per_trigger = max_files_per_trigger
        if batch_id_prefix is None:
            # namespace epochs by the tailed directory (feed identity): a
            # fresh checkpoint over the SAME directory re-reads the same
            # files under the same ids — replays dedupe instead of double-
            # applying; a different directory can never collide
            batch_id_prefix = (
                "blt" + hashlib.sha1(os.path.abspath(log_dir).encode()).hexdigest()[:8]
            )
        self.batch_id_prefix = batch_id_prefix
        self.last_metrics: list[dict[str, Any]] = []

    # ------------------------------------------------------------------ run
    def run(self, spark: SparkSession, checkpoint_dir: str) -> list[dict]:
        """Drain everything currently in the directory (Trigger.AvailableNow)
        and return per-epoch merge metrics. Re-invoke anytime: the file-
        source checkpoint skips already-ingested files; an empty increment
        commits nothing."""
        commit = self.table.commit_at(resolve=False)
        cols = [n for n, _ in commit.schema]
        result_schema = (
            "op string, "
            + ", ".join(f"{n} {t}" for n, t in commit.schema)
            + ", source_lsn long"
        )
        reader = (
            spark.readStream.format("binaryFile")
            # binaryFile's schema is fixed, but streaming sources refuse
            # inference — state it explicitly
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("pathGlobFilter", "mysql-bin.*")
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        files = reader.load(self.log_dir)
        metrics: list[dict[str, Any]] = []

        def handle(batch_df, epoch_id: int) -> None:
            # batch id is CONTENT-ADDRESSED to the file set, not the epoch:
            # a fresh checkpoint over a directory that has since grown
            # re-batches files under different epoch numbers — an epoch id
            # would either skip unseen files or double-count; the file-set
            # id makes exact replays skip cheaply, while a re-GROUPING
            # reapplies its files idempotently (same lsns, last-image-wins
            # — the merge is value-idempotent, so regrouping cannot corrupt)
            names = sorted(
                os.path.basename(r.path)
                for r in batch_df.select("path").collect()
            )
            if not names:
                return
            fid = hashlib.sha1(",".join(names).encode()).hexdigest()[:16]
            decoded = read_binlog_files(
                batch_df.sparkSession,
                batch_df,
                self.schema_name,
                self.table_name,
                cols,
                result_schema,
                rotate_every=self.rotate_every,
                verify_checksum=self.verify_checksum,
            )
            m = self.table.merge(
                batch_df.sparkSession,
                decoded,
                f"{self.batch_id_prefix}-{fid}",
            )
            m["files"] = names
            metrics.append(m)

        q = (
            files.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        self.last_metrics = metrics
        return metrics
