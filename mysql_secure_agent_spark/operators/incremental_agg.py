"""Incremental aggregate-view maintenance over a LakeTable changefeed.

A downstream aggregate (per-conversation turn counts, token sums, per-user
rollups) must not be recomputed from 10^10 base rows every time a micro-batch
of 10^5 changes lands. This operator maintains it with **dirty-group partial
recompute**: the changefeed names exactly which keys changed in
``(since_lsn, to_lsn]`` (O(delta) read — file listing pruned by lsn range,
see ``LakeTable.read_changes``), the distinct GROUPS those keys belong to are
re-aggregated from the base table, and the results are MERGEd into the
aggregate table; groups whose rows all vanished become tombstones.

Why recompute-the-group instead of +/- delta math: pure delta maintenance
only works for self-maintainable aggregates (COUNT/SUM) and needs the
before-image of every update; group recompute handles MAX/MIN/COUNT DISTINCT
and anything else expressible as an aggregate, at the cost of re-reading the
dirty groups' rows — O(|dirty groups| × group size), never O(table). The
reference has no analog (its sink is an append-only changelog, the consumer
re-aggregates downstream); this is the engine-side materialization a
training-data pipeline wants ("conversations whose stats changed since my
last snapshot").

Scale shape: one changefeed read (listing-pruned), one distinct (partial
agg), one semi-join against the base (dirty side is small → broadcastable;
AQE decides), one groupBy (partial agg), one anti-join for vanished groups,
then the standard merge path. No collect, no window.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..lake.table import LakeTable


def refresh_aggregate(
    spark: SparkSession,
    base: LakeTable,
    agg_table: LakeTable,
    group_cols: list[str],
    agg_cols: list[Column],
    since_lsn: int,
    to_lsn: int,
    batch_id: str,
    dedup_strategy: str = "window",
) -> dict[str, Any]:
    """Fold the base table's changes in ``(since_lsn, to_lsn]`` into
    ``agg_table`` (keyed on ``group_cols``; value columns = the aliases of
    ``agg_cols``).

    ``agg_cols`` are aggregate expressions with explicit aliases, evaluated
    per dirty group over the CURRENT base state (so run the refresh after
    the merges whose lsn range it covers). Idempotent per ``batch_id`` via
    the merge ledger. Returns the merge metrics plus the dirty-group count.
    """
    delta = base.read_changes(spark, since_lsn, to_lsn)
    dirty = delta.select(*group_cols).distinct()
    state = base.read(spark)
    recomputed = (
        state.join(dirty, on=group_cols, how="left_semi")
        .groupBy(*group_cols)
        .agg(*agg_cols)
    )
    value_cols = [c for c in recomputed.columns if c not in group_cols]
    upserts = recomputed.select(
        F.lit("U").alias("op"),
        *group_cols,
        *value_cols,
        F.lit(to_lsn).cast("long").alias("source_lsn"),
    )
    # a dirty group with no surviving base rows was fully deleted → tombstone
    gone = dirty.join(recomputed, on=group_cols, how="left_anti").select(
        F.lit("D").alias("op"),
        *group_cols,
        *[F.lit(None).alias(c) for c in value_cols],
        F.lit(to_lsn).cast("long").alias("source_lsn"),
    )
    metrics = agg_table.merge(
        spark, upserts.unionByName(gone), batch_id, dedup_strategy=dedup_strategy
    )
    if not metrics.get("skipped"):
        metrics["incremental_refresh"] = {
            "since_lsn": since_lsn,
            "to_lsn": to_lsn,
        }
    return metrics
