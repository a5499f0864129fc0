"""Resumable initial-snapshot import — SURVEY §2.1 S1/S2, §2.8 T7.

The reference imports tables one keyset page at a time, persisting the
last-synced PK after each flushed page so a crash resumes mid-table
(``Updater.java:82-122`` syncPageFromTable; cursor update at :103-108;
``state/TableState.java`` lastSyncedPrimaryKey). A plain Spark backfill is
ONE distributed batch read — pages are unnecessary for throughput — but the
*resumability contract* still matters for 100 TB sources where a backfill
runs for hours: this module pages a snapshot through the same LakeTable
merge core, committing the cursor (AgentState) after each page's data commit
(data-first-then-state, ``BucketOutput.java:127-138``).

Each page is a distributed scan+sort+limit (Catalyst pushes the keyset
predicate into the parquet scan); page ids are deterministic so a replayed
page is skipped by the batch high-water mark (exactly-once effect).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lake.table import LakeTable
from .operators.keyset import keyset_after
from .state import AgentState, TableState


def import_snapshot(
    spark: SparkSession,
    source_df: DataFrame,
    table: LakeTable,
    state_path: str,
    table_key: str = "main.transcripts",
    page_size: int = 100_000,
    max_pages: int | None = None,
    lsn_col: str = "source_lsn",
) -> dict[str, Any]:
    """Page ``source_df`` (a snapshot: one row per key, with an ``lsn_col``
    or constant position) into ``table``. Resumes from ``state_path`` if it
    exists. Returns {pages, rows, finished}.

    ``max_pages`` limits work per call (crash-injection in tests / paced
    backfill alongside a live stream, T7).
    """
    key_cols = table.commit_at(resolve=False).key_cols
    state = AgentState.load(state_path) if os.path.exists(state_path) else AgentState()
    tstate = state.tables.get(table_key, TableState())
    if tstate.finished_import:
        return {"pages": 0, "rows": 0, "finished": True}

    pages = rows = 0
    while max_pages is None or pages < max_pages:
        df = source_df
        cursor = tstate.last_synced_primary_key
        if cursor is not None:
            df = df.filter(keyset_after(key_cols, [cursor[c] for c in key_cols]))
        page = df.orderBy(*key_cols).limit(page_size)
        # The page NEVER passes through the driver (at the reference's own
        # PAGE_SIZE of 10M rows a collect() would be a driver OOM): it is
        # cached on the executors, merged distributed, and the driver fetches
        # only k scalars — the page row count and the max key (next cursor).
        page = page.persist()
        try:
            head = page.agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.struct(*key_cols)).alias("mx"),
            ).first()
            n, mx = head["n"], head["mx"]
            if n == 0:
                tstate.finished_import = True
                state.tables[table_key] = tstate
                state.save(state_path)
                break
            page_df = page
            if lsn_col not in page_df.columns:
                page_df = page_df.withColumn(lsn_col, F.lit(0).cast("long"))
            if "op" not in page_df.columns:
                page_df = page_df.withColumn("op", F.lit("I"))
            batch_id = f"import.{table_key}.{_cursor_tag(cursor)}"
            table.merge(spark, page_df, batch_id)
        finally:
            page.unpersist()
        tstate.last_synced_primary_key = {c: mx[c] for c in key_cols}
        state.tables[table_key] = tstate
        state.save(state_path)  # data committed above, THEN state
        pages += 1
        rows += n
        if n < page_size:
            tstate.finished_import = True
            state.tables[table_key] = tstate
            state.save(state_path)
            break
    return {"pages": pages, "rows": rows, "finished": tstate.finished_import}


def _cursor_tag(cursor: dict | None) -> str:
    if not cursor:
        return "start"
    return "_".join(str(v) for v in cursor.values())
