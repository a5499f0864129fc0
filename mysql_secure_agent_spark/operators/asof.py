"""As-of join: match each left row to the latest right row at-or-before it.

The classic CDC / point-in-time enrichment operator (e.g. attach the state a
dimension had when the event happened). Spark has no ASOF JOIN; the naive
re-expressions are a range join (O(n·m) candidate pairs per key before the
per-row argmax) or a correlated subquery per left row — both collapse at
scale. This implementation is the union+window trick used by time-series
engines:

    tag left rows (carry no payload) and right rows (carry payload),
    union them, and take, per key, a running ``last(payload, ignorenulls)``
    over rows ordered by the as-of time — each left row then reads the
    payload of the nearest preceding right row.

Cost: ONE shuffle of |L|+|R| rows on the join key and a linear scan per
partition — the same asymptotics as a regular hash join, with no candidate
blow-up. At 100 TB the shuffle partitions by key exactly like any keyed agg;
a pathologically hot key concentrates its rows (same as every window
operator) — pre-shard such keys or bound the right side's time range.

Tie semantics (left time == right time): ``strict=False`` (default) matches
the right row (ASOF >=); ``strict=True`` does not (ASOF >). Implemented
purely by the within-tie sort order of the tagged union — no extra pass.

The reference has no joins at all (it is a single-table changelog agent);
this operator serves the transcript-lake consumer side: e.g. join each
tool-call turn to the latest config/schema snapshot at or before its ts
(``tableDefinition`` events in the reference's changelog are exactly such a
slowly-changing right side, ``output/Event.java:14-43``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with the
    greatest ``right_on`` <= ``left_on`` (``<`` when ``strict``) within the
    same ``on`` key group. Left rows with no preceding right row get nulls
    (LEFT OUTER semantics). Output columns: all left columns + value_cols.

    ``left_on`` / ``right_on`` must be mutually comparable (same type). A
    right value column that collides with a left column name must be
    renamed by the caller first (raises otherwise).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_on}
    ]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(f"value_cols collide with left columns: {clash}")

    # Tag order inside a time tie decides inclusive vs strict:
    #   inclusive: right(0) sorts before left(1) -> the frame up to the
    #     current row already contains the tied right payload;
    #   strict: left(0) before right(1) -> the tied right row is after the
    #     left row and outside its frame.
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lcols = left.columns

    # The payload travels as ONE struct, not per-column: filling each value
    # column independently with last(ignorenulls) would back-fill a column
    # that is genuinely NULL in the matched right row from an *older* right
    # row, producing an output row stitched from different right rows. A
    # struct literal over the right row is non-null even when every field
    # is null, so last(struct, ignorenulls) always lands on the single
    # nearest right row and its exact (possibly null) field values.
    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    tagged_l = left.select(
        *lcols,
        F.col(left_on).alias("__asof_t"),
        F.lit(l_tag).alias("__asof_tag"),
        F.lit(None).cast(payload_type).alias("__asof_payload"),
    )
    # a NULL right_on can satisfy neither 'right_on <= left_on' nor the
    # strict variant — but Spark's ascending sort is NULLS FIRST, so such a
    # row would land at the partition head and fabricate a match for every
    # early left row; drop it from the join domain entirely
    right = right.filter(F.col(right_on).isNotNull())
    tagged_r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in on
            else F.col(c)
            for c in lcols
        ],
        F.col(right_on).alias("__asof_t"),
        F.lit(r_tag).alias("__asof_tag"),
        F.struct(*value_cols).alias("__asof_payload"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # One window, frame ending just before the current row when strict
    # (the current row is the left row itself; tied right rows sort after
    # it), at the current row otherwise.
    end = -1 if strict else 0
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_t"), F.col("__asof_tag"))
        .rowsBetween(Window.unboundedPreceding, end)
    )
    filled = unioned.select(
        *lcols,
        F.col("__asof_tag"),
        F.last("__asof_payload", ignorenulls=True).over(w).alias("__asof_payload"),
    )
    return (
        filled.filter(F.col("__asof_tag") == F.lit(l_tag))
        .select(
            *lcols,
            *[F.col(f"__asof_payload.{c}").alias(c) for c in value_cols],
        )
    )
