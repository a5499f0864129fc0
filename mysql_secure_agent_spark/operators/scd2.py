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


# --------------------------------------------------------------------------
# Incrementally-maintained SCD-2 history in the lake.
#
# ``scd2_history`` above is a batch rebuild — O(full feed) per refresh. A CDC
# daemon wants the history table maintained per micro-batch: each batch
# appends its own I/U images as new interval rows AND closes the previous
# open interval of every key it touches. Both effects land in ONE
# ``LakeTable.merge`` (idempotent per batch_id), so crash/replay safety is
# inherited from the lake's exactly-once ledger.
#
# History-table layout: key = src keys + ``valid_from_lsn`` (each interval
# row is individually addressable — closing it is an upsert of the same
# logical row with ``valid_to_lsn`` set), but BUCKETED by the src keys alone,
# so all intervals of one key co-locate and the close step's base read prunes
# to the touched buckets at the listing level (same O(touched-buckets)
# contract as ``merge_partial``). The merge's own last-image-wins resolves
# open-vs-closed versions of an interval because the closing upsert carries
# the closing event's lsn as its ``source_lsn`` (> the opening lsn).
#
# Ordering contract: batches must arrive in lsn order per key ACROSS batches
# (within a batch any order is fine — ``lead`` sorts). Interval closing is a
# patch on prior state and does not commute, the same caveat as
# binlog_row_image=MINIMAL (``LakeTable.merge_partial``); a binlog feed
# satisfies it by construction.
# --------------------------------------------------------------------------

VALID_FROM = "valid_from_lsn"
VALID_TO = "valid_to_lsn"


def create_history_table(
    path: str,
    src_schema,
    src_key_cols: list[str],
    n_buckets: int = 16,
    overwrite: bool = False,
):
    """Create the SCD-2 history ``LakeTable`` for a source schema: source
    columns + validity interval, keyed by (src keys, valid_from_lsn) and
    bucketed by the src keys alone (interval locality per key)."""
    from pyspark.sql import types as T

    from ..lake.table import LakeTable

    fields = [T.StructField(f.name, f.dataType, True) for f in src_schema.fields]
    fields.append(T.StructField(VALID_FROM, T.LongType(), False))
    fields.append(T.StructField(VALID_TO, T.LongType(), True))
    return LakeTable.create(
        path,
        T.StructType(fields),
        key_cols=[*src_key_cols, VALID_FROM],
        n_buckets=n_buckets,
        bucket_cols=list(src_key_cols),
        overwrite=overwrite,
    )


def merge_history(
    spark,
    history,
    batch_df: DataFrame,
    batch_id: str | int,
    order_col: str = "source_lsn",
    op_col: str = "op",
    delete_op: str = "D",
    transform=None,
) -> dict:
    """Apply one changelog micro-batch to an SCD-2 history ``LakeTable``.

    Cost shape per batch of K touched keys: one window over the BATCH (lead
    per key — the batch is micro, never the table), one O(B)-int collect of
    touched bucket ids, one base read pruned to those buckets for the open
    intervals being closed, one standard bucket-aligned merge. Nothing scans
    the full history.

    ``transform`` (optional DataFrame -> DataFrame) runs on the batch images
    before interval construction — the hook for the pipeline's
    normalize/anonymize stage, so history rows match the main table's stored
    form.
    """
    from pyspark.sql import Window as W

    batch_id = str(batch_id)
    commit = history.commit_at(resolve=False)
    if commit.is_applied(batch_id):
        return {"skipped": True, "batch_id": batch_id}

    src_keys = [c for c in commit.key_cols if c != VALID_FROM]
    payload = [
        c
        for c, _ in commit.schema
        if c not in (*src_keys, VALID_FROM, VALID_TO)
    ]
    types = dict(commit.schema)
    projected = batch_df.select(
        F.col(op_col).alias("_op"),
        *[
            (F.col(c) if c in batch_df.columns else F.lit(None))
            .cast(types[c])
            .alias(c)
            for c in (*src_keys, *payload)
        ],
        F.col(order_col).cast("long").alias("_lsn"),
    )
    if transform is not None:
        projected = transform(projected)

    w = W.partitionBy(*src_keys).orderBy(F.col("_lsn").asc())
    new_rows = (
        projected.withColumn("_next", F.lead("_lsn").over(w))
        .filter(F.col("_op") != F.lit(delete_op))
        .select(
            F.lit("U").alias("op"),
            *src_keys,
            *payload,
            F.col("_lsn").alias(VALID_FROM),
            F.col("_next").alias(VALID_TO),
            # merge orders row versions by source_lsn: a row born open and
            # closed later must lose to its closing upsert, so the version
            # stamp is the last event lsn the row reflects.
            F.coalesce("_next", "_lsn").alias("source_lsn"),
        )
    )

    # The key's FIRST event in this batch closes its previous open interval.
    firsts = projected.groupBy(*src_keys).agg(F.min("_lsn").alias("_close_lsn"))
    firsts = firsts.persist()
    try:
        touched = [
            r[0]
            for r in firsts.select(history._bucket_expr(commit).alias("_b"))
            .distinct()
            .collect()
        ]
        base = history.read(spark, buckets=touched)
        closes = (
            base.filter(F.col(VALID_TO).isNull())
            # no broadcast hint: the touched-key set is usually tiny (AQE
            # broadcasts it at runtime) but a backfill batch may not be —
            # never force table-scale state through the driver.
            .join(firsts, src_keys, "inner")
            .select(
                F.lit("U").alias("op"),
                *src_keys,
                *payload,
                F.col(VALID_FROM),
                F.col("_close_lsn").alias(VALID_TO),
                F.col("_close_lsn").alias("source_lsn"),
            )
        )
        metrics = history.merge(
            spark, new_rows.unionByName(closes), batch_id
        )
    finally:
        firsts.unpersist()
    if not metrics.get("skipped"):
        metrics["history_buckets_pruned_read"] = sorted(int(b) for b in touched)
    return metrics


def read_history(spark, history) -> DataFrame:
    """Reconciled SCD-2 history rows with the derived ``is_current`` flag —
    the same shape ``scd2_history`` produces in one batch."""
    return history.read(spark).withColumn(
        "is_current", F.col(VALID_TO).isNull()
    )
