"""Interleaved snapshot backfill — chunked select WHILE the change stream
keeps applying (the DBLog watermark algorithm).

The reference runs its initial import to completion BEFORE it tails the
binlog (``ImportOnly.java:19-60``; ``Updater.java:82-122`` pages the table,
then the steady-state loop starts) — during a multi-hour 100 TB backfill the
change stream is frozen and replication lag grows unboundedly. The public
DBLog design (Andreadis & Gruener, "DBLog: A Watermark Based Change-Data-
Capture Framework", Netflix 2019) removes that: snapshot CHUNKS interleave
with log consumption, and a low/high watermark pair brackets each chunk
select so concurrent changes supersede the chunk's stale rows.

The Spark re-expression, per chunk:

1. drain the feed (availableNow pass through the shared merge core) — the
   table now holds every event with ``lsn <= lw`` where lw = feed head;
2. keyset-page the next chunk out of the live source (state-at-select is
   some point >= lw);
3. drain again → hw = new feed head. Events in ``(lw, hw]`` arrived during
   the select, so for their keys the chunk row is AMBIGUOUS (pre- or
   post-event state) — those chunk rows are DROPPED (broadcast anti-join;
   the authoritative log image has already been merged);
4. the surviving chunk rows merge as inserts at ``lsn = lw``: the lake's
   last-image-wins resolution then guarantees any later stream event
   (``lsn > lw``) supersedes the chunk row, while the chunk fills keys the
   stream never touches. A key deleted at ``lsn <= lw`` is simply absent
   from the source, so the tombstone stands — nothing can resurrect.

Chunk merges are idempotent (deterministic cursor-derived batch_id) and the
cursor commits AFTER the data (data-first-then-state, the reference's own
crash contract, ``BucketOutput.java:127-138``) — a crash anywhere resumes
without loss or double-apply. Watermarks are read from parquet FOOTER
statistics (pure metadata; no scan of the feed), and the window-key read is
row-group-pruned to ``(lw, hw]``.

Scale note: do not compact the table mid-backfill — a full-bucket rewrite
drops tombstones, and a tombstone with ``lsn in (lw_of_a_pending_chunk, ∞)``
is exactly the evidence last-image-wins needs to keep a chunk row dead.
(`LakeTable.compact` after ``finished`` is fine.)
"""

from __future__ import annotations

import os
from typing import Any, Callable

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

from .lake.table import LakeTable
from .operators.keyset import keyset_after
from .state import AgentState, TableState

__all__ = ["feed_head_lsn", "import_snapshot_interleaved"]


def feed_head_lsn(feed_data_dir: str, lsn_col: str = "source_lsn") -> int:
    """Max ``lsn_col`` across the feed's parquet files, from footer
    statistics only — the log-head probe (S6) as pure metadata, no job."""
    head = 0
    if not os.path.isdir(feed_data_dir):
        return head
    for name in os.listdir(feed_data_dir):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(feed_data_dir, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if lsn_col not in idx:
            continue
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx[lsn_col]).statistics
            if stats is not None and stats.has_min_max:
                head = max(head, int(stats.max))
    return head


def import_snapshot_interleaved(
    spark: SparkSession,
    source_read: Callable[[SparkSession], DataFrame],
    table: LakeTable,
    feed_dir: str,
    drain: Callable[[SparkSession], Any],
    state_path: str,
    page_size: int = 100_000,
    max_chunks: int | None = None,
    lsn_col: str = "source_lsn",
    table_key: str = "interleaved.main",
) -> dict[str, Any]:
    """Backfill ``table`` from the live source via ``source_read`` while
    ``drain`` keeps applying the change feed under ``feed_dir``.

    ``source_read(spark)`` must return the source's CURRENT snapshot (one
    row per key — a JDBC read of the source table; in tests, a replay of the
    feed prefix delivered so far). ``drain(spark)`` must apply every
    currently-available feed event to ``table`` (e.g. a bound
    ``CdcPipeline.run_stream`` with a sticky checkpoint). Returns
    {chunks, rows, dropped, finished}.
    """
    data_dir = os.path.join(feed_dir, "data")
    key_cols = table.commit_at(resolve=False).key_cols
    state = AgentState.load(state_path) if os.path.exists(state_path) else AgentState()
    tstate = state.tables.get(table_key, TableState())
    if tstate.finished_import:
        drain(spark)
        return {"chunks": 0, "rows": 0, "dropped": 0, "finished": True}

    chunks = rows = dropped = 0
    while max_chunks is None or chunks < max_chunks:
        # 1. low watermark: everything <= lw is IN the table before we select
        drain(spark)
        lw = feed_head_lsn(data_dir, lsn_col)

        # 2. chunk select from the live source (state-at-select >= lw)
        cursor = tstate.last_synced_primary_key
        src = source_read(spark)
        if cursor is not None:
            src = src.filter(keyset_after(key_cols, [cursor[c] for c in key_cols]))
        page = src.orderBy(*key_cols).limit(page_size).persist()
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

            # 3. high watermark: drain what arrived during the select; keys
            # touched in (lw, hw] make the chunk row ambiguous — drop them,
            # the log image (already merged) is authoritative.
            drain(spark)
            hw = feed_head_lsn(data_dir, lsn_col)
            page_df = page
            if hw > lw:
                win_keys = (
                    spark.read.parquet(data_dir)
                    .filter((F.col(lsn_col) > lw) & (F.col(lsn_col) <= hw))
                    .select(*key_cols)
                    .distinct()
                )
                page_df = page.join(F.broadcast(win_keys), key_cols, "left_anti")

            # 4. surviving rows merge at lsn = lw: later stream events win by
            # last-image-wins; keys the stream never touches are filled.
            out = page_df.withColumn(lsn_col, F.lit(lw).cast("long"))
            if "op" not in out.columns:
                out = out.withColumn("op", F.lit("I"))
            batch_id = f"interleave.{table_key}.{_cursor_tag(cursor)}"
            res = table.merge(spark, out, batch_id)
            merged = res.get("rows_in", n) if isinstance(res, dict) else n
            dropped += max(0, n - merged)
        finally:
            page.unpersist()

        tstate.last_synced_primary_key = {c: mx[c] for c in key_cols}
        state.tables[table_key] = tstate
        state.save(state_path)  # data committed above, THEN the cursor
        chunks += 1
        rows += n
        if n < page_size:
            tstate.finished_import = True
            state.tables[table_key] = tstate
            state.save(state_path)
            break

    # the stream keeps flowing regardless of how the loop exited
    drain(spark)
    return {
        "chunks": chunks,
        "rows": rows,
        "dropped": dropped,
        "finished": tstate.finished_import,
    }


def _cursor_tag(cursor: dict | None) -> str:
    if not cursor:
        return "start"
    return "_".join(str(v) for v in cursor.values())
