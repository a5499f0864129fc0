"""Type-2 slowly-changing-dimension history over a keyed change stream.

The reference preserves *every* row image it ships — each INSERT/UPDATE/DELETE
event becomes one JSONL record in the bucket output (``Updater.java:148-186``,
``BucketOutput.java:86-125``), so the downstream warehouse holds the full
change history, not just the final state. This operator materializes that
history in the standard SCD-2 shape: one row per image with an explicit
validity interval ``[valid_from_lsn, valid_to_lsn)``, where the interval is
closed by the key's next event (an UPDATE supersedes, a DELETE terminates
without emitting a row of its own).

Semantics (per key, ordered by ``order_col``, which is globally unique):

* ``I``/``U`` event -> one history row; ``valid_from_lsn`` = its lsn,
  ``valid_to_lsn`` = the lsn of the key's next event (NULL if none yet).
* ``D`` event -> emits no history row, but its lsn closes the previous
  image's interval (so ``valid_to_lsn`` set + ``is_current`` false).
* ``is_current`` = the interval is open (NULL ``valid_to_lsn``) — i.e. the
  image is the key's live state. A key whose last event is ``D`` has no
  current row, matching ``LakeTable.read``'s tombstone semantics.

Physical plan: ONE shuffle — ``lead(lsn) OVER (PARTITION BY key ORDER BY
lsn)``. History construction is inherently per-key-ordered, so the window
partitioning is the minimal data movement; a hot key (Zipf conv_id) places
that key's images on one reducer, which is bounded by the key's own history
length (a conversation's edit count), not the table size. No self-join, no
second pass: the DELETE closing rule falls out of ``lead`` because the
delete event participates in the window and is filtered *after* it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "source_lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Changelog -> type-2 history rows with validity intervals.

    ``df`` must carry ``key_cols``, ``op_col`` (I/U/D), ``order_col`` (a
    globally-unique total order, e.g. the binlog lsn) and arbitrary payload
    columns. Output = input columns minus ``op_col``, plus
    ``valid_from_lsn`` / ``valid_to_lsn`` / ``is_current``.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    payload = [c for c in df.columns if c not in (*key_cols, op_col, order_col)]
    out = (
        df.withColumn("_next_lsn", F.lead(order_col).over(w))
        .filter(F.col(op_col) != F.lit(delete_op))
        .select(
            *key_cols,
            *payload,
            F.col(order_col).alias("valid_from_lsn"),
            F.col("_next_lsn").alias("valid_to_lsn"),
            F.col("_next_lsn").isNull().alias("is_current"),
        )
    )
    return out


def scd2_as_of(history: DataFrame, lsn: int) -> DataFrame:
    """Point-in-time state from an SCD-2 history: images valid at ``lsn``
    (interval contains it). A pure filter — no shuffle — so time-travel
    over the materialized history is a scan, not a replay."""
    return history.filter(
        (F.col("valid_from_lsn") <= F.lit(lsn))
        & (F.col("valid_to_lsn").isNull() | (F.col("valid_to_lsn") > F.lit(lsn)))
    ).drop("is_current")
