"""Multi-table changelog demultiplexing — SURVEY §2.2 P2.

The reference syncs many tables through one binlog stream, routing each
row-event by its TableRef and filtering by config selection
(``Updater.java:169-182``; include/exclude ``config/Config.java:67-79``).
The Spark analog: one change feed carrying a ``table_ref`` column fans out
inside a single ``foreachBatch`` to one LakeTable per selected table.

The routing filter runs once per target on the SAME cached micro-batch (no
re-scan per table), and each target's merge keeps its own batch-id
high-water mark, so a retried micro-batch re-merges only the targets that
had not committed (per-table exactly-once effect).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark.sql import types as T

from ..config import Config
from ..lake.table import LakeTable
from ..schemas import CHANGELOG_FIELDS

# NB: built from the field list — StructType.add would MUTATE the shared
# CHANGELOG_SCHEMA in place.
MULTI_CHANGELOG_SCHEMA = T.StructType(
    [*CHANGELOG_FIELDS, T.StructField("table_ref", T.StringType(), False)]
)


class MultiTablePipeline:
    """Route a multi-table feed into per-table LakeTables.

    ``tables``: {table_ref: LakeTable}. ``config`` applies the reference's
    schema/table selection semantics to decide which refs sync at all.

    ``coord_dir`` switches on ATOMIC mode: every micro-batch applies as a
    transaction-consistency group (`lake/txn_group.py`) — per-table merges
    stage invisibly, then publish under one group decision, so a binlog
    transaction spanning tables is never readable half-applied (the
    reference's single-threaded sink gives this for free,
    ``Updater.java:148-186``; a distributed sink must coordinate).
    """

    def __init__(
        self,
        tables: dict[str, LakeTable],
        feed_dir: str,
        config: Config | None = None,
        coord_dir: str | None = None,
    ):
        self.feed_dir = feed_dir
        self.config = config or Config()
        self.tables = {
            ref: t for ref, t in tables.items() if self._selected(ref)
        }
        self.txn_group = None
        if coord_dir is not None:
            from ..lake.txn_group import TransactionGroup

            self.txn_group = TransactionGroup(self.tables, coord_dir)

    def _selected(self, table_ref: str) -> bool:
        schema, _, name = table_ref.partition(".")
        return self.config.table_selected(schema, name)

    def apply_batch(
        self, spark: SparkSession, batch_df: DataFrame, batch_id: str | int
    ) -> dict[str, Any]:
        batch_df = batch_df.cache()  # one materialization, N routed merges
        try:
            routed = {
                ref: batch_df.filter(F.col("table_ref") == ref).drop("table_ref")
                for ref in self.tables
            }
            if self.txn_group is not None:
                return self.txn_group.commit_batch(spark, routed, batch_id)
            return {
                ref: self.tables[ref].merge(spark, df, f"{batch_id}.{ref}")
                for ref, df in routed.items()
            }
        finally:
            batch_df.unpersist()

    def run_stream(
        self, spark: SparkSession, checkpoint_dir: str, max_files_per_trigger: int = 4
    ):
        stream = (
            spark.readStream.schema(MULTI_CHANGELOG_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(os.path.join(self.feed_dir, "data"))
        )

        def handle(bdf: DataFrame, epoch_id: int) -> None:
            self.apply_batch(spark, bdf, epoch_id)

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            if q.isActive:
                q.stop()
        return q
