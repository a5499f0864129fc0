"""Fixed schemas for the transcript CDC data model.

The reference is dynamically schema'd (every value a Java String,
``source/Row.java:10``, schema re-inferred per cycle from information_schema,
``source/TableDefinitions.java:22-38``). We replace that with explicit typed
StructTypes plus an explicit schema-evolution path (DDL events).

Primary key = (conv_id, turn_idx) — the reference keys every upsert/delete by
the table PK (``output/ColumnDefinition.java:10-11``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Target table: multi-turn conversation transcripts (BASELINE.json input_hint)
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

PRIMARY_KEY = ["conv_id", "turn_idx"]

# Change feed: one row per row-image, flattening SourceEvent
# {tableRef, binlogPosition, event, oldRows, newRows} (source/SourceEvent.java:8-29).
# op: I/U/D maps SourceEventType INSERT/UPDATE/DELETE (SourceEventType.java:6-11).
# source_lsn: strictly monotone total order (BinlogPosition analog,
# source/BinlogPosition.java:6-18); (binlog_file, binlog_pos) <-> source_lsn.
CHANGELOG_FIELDS = [
    T.StructField("op", T.StringType(), False),
    *TRANSCRIPT_FIELDS,
    T.StructField("source_lsn", T.LongType(), False),
    T.StructField("binlog_file", T.StringType(), False),
    T.StructField("binlog_pos", T.LongType(), False),
]
CHANGELOG_SCHEMA = T.StructType(CHANGELOG_FIELDS)

# DDL events (explicit schema-evolution stream; the reference instead detects
# arity mismatch and re-polls information_schema, Updater.java:188-217)
DDL_SCHEMA = T.StructType(
    [
        T.StructField("source_lsn", T.LongType(), False),
        T.StructField("action", T.StringType(), False),  # ADD_COLUMN | MODIFY_COLUMN
        T.StructField("column_name", T.StringType(), False),
        T.StructField("column_type", T.StringType(), False),  # Spark DDL type string
    ]
)

# Raw (encoded) feed: binlog-wire-shaped rows whose payload is a binary row
# image (parser/shyiko/RowParser.java analog); decoded by an Arrow pandas UDF.
RAW_CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("source_lsn", T.LongType(), False),
        T.StructField("binlog_file", T.StringType(), False),
        T.StructField("binlog_pos", T.LongType(), False),
    ]
)

PAYLOAD_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
