"""Dead-letter sink: quarantine for malformed change events.

The reference's RowParser throws on bytes it cannot frame
(``parser/shyiko/RowParser.java:165-166`` ``IOException("Unsupported
type")``) — one poisoned event kills the whole agent and nothing records
WHICH event it was. At 10^10 events/day a stream that halts on every wire
hiccup is unrunnable; the production pattern (Kafka Connect DLQs, Delta
Live Tables expectations) is validate → route → continue:

* the Arrow decode stage validates every row structurally first
  (``functions/decode.py::decode_payload_block(quarantine=True)``) — same
  header math as the decode itself, zero extra passes over payload bytes;
* valid rows continue into dedup/merge untouched;
* invalid rows land here: append-only Parquet under ``dlq_dir``, one
  directory per (sub-)batch id, carrying the ORIGINAL payload bytes, the
  log position, a machine-readable reason code, and the batch id.

Exactly-once: the batch id is in the directory name and each write
OVERWRITES its own directory, so a replayed micro-batch (crash between
merge-commit and DLQ write, or a full checkpoint replay) rewrites the same
rows in place instead of duplicating them — idempotence by path, the same
contract the lake's applied-batch ledger gives merges.

Scale: the DLQ write is gated on an Observation count piggybacked on the
merge job itself (``streaming/pipeline.py``), so a clean batch pays ZERO
extra jobs — the common case at 100 TB. Only a batch that actually carries
poison pays one extra (small, errors-only) job to materialize it.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DLQ_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("source_lsn", T.LongType(), True),
        T.StructField("binlog_file", T.StringType(), True),
        T.StructField("binlog_pos", T.LongType(), True),
        T.StructField("reason", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("batch_id", T.StringType(), True),
    ]
)


class DeadLetterSink:
    def __init__(self, dlq_dir: str):
        self.dlq_dir = dlq_dir

    def _batch_path(self, batch_id: str) -> str:
        # hash the id: batch ids may contain '.' sub-batch suffixes or other
        # path-hostile characters; the readable id still travels in the rows
        h = hashlib.sha1(str(batch_id).encode()).hexdigest()[:16]
        return os.path.join(self.dlq_dir, f"batch={h}")

    def write(self, flagged: DataFrame, batch_id: str) -> None:
        """Write one batch's invalid rows (``_error`` non-null). Overwrite
        of the batch's own directory → replay-idempotent."""
        out = flagged.filter(F.col("_error").isNotNull()).select(
            "op",
            "source_lsn",
            "binlog_file",
            "binlog_pos",
            F.col("_error").alias("reason"),
            F.col("_raw").alias("payload"),
            F.lit(str(batch_id)).alias("batch_id"),
        )
        out.write.mode("overwrite").parquet(self._batch_path(batch_id))

    def read(self, spark: SparkSession) -> DataFrame:
        """All quarantined events across batches (empty frame if none)."""
        if not os.path.isdir(self.dlq_dir):
            return spark.createDataFrame([], DLQ_SCHEMA)
        paths = [
            os.path.join(self.dlq_dir, d)
            for d in os.listdir(self.dlq_dir)
            if d.startswith("batch=")
        ]
        if not paths:
            return spark.createDataFrame([], DLQ_SCHEMA)
        return spark.read.schema(DLQ_SCHEMA).parquet(*paths)
