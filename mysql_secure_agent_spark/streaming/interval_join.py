"""Watermarked stream-stream interval join (event correlation).

Correlates two keyed change streams within an event-time window — the
"did a purchase follow this click within 30 minutes?" / "which tool result
answered this tool call?" primitive. Batch and streaming share ONE
definition (the equality key + time-range predicate); the batch run is the
oracle for the stream.

Spark's stream-stream inner join buffers both sides in state; the join is
only FEASIBLE at 10^10-event scale because the watermark plus the time-range
condition lets the state store evict a row once no future match can exist
(max-event-time − watermark passes its window). Without the range bound the
state grows without limit — which is why ``interval_join`` REQUIRES an upper
bound instead of defaulting to an open interval. The shuffle is one exchange
per side on the equality key (hash join co-partitioning), so hot keys skew
exactly like a merge shuffle — salt upstream if one key dominates.

The reference has no join at all (a binlog is a single totally-ordered
stream, ``Updater.java:148-186``); this operator is lake-consumer surface a
transcript pipeline needs (turn ↔ tool-event correlation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    upper: str = "30 minutes",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Inner-join rows of ``left`` with ``right`` rows of the same key whose
    event time falls in ``[left.ts, left.ts + upper]``.

    Output columns are ``l_*``/``r_*`` prefixed (both sides keep every
    column; the key is emitted once, unprefixed). Works identically on
    batch frames (watermark ignored) and streaming frames, where
    ``watermark_delay`` must be set: it bounds BOTH buffers — a left row is
    held for (delay + upper) past the watermark, a right row for (delay) —
    and declares the late-data contract (events older than the watermark
    are dropped, the same one-sided trade as the windowed rollup).
    """
    if not key_cols:
        raise ValueError("interval_join requires at least one equality key")
    if left.isStreaming or right.isStreaming:
        if watermark_delay is None:
            raise ValueError(
                "streaming interval_join requires watermark_delay: without "
                "it the join state store can never evict a buffered row"
            )
        left = left.withWatermark(ts_col, watermark_delay)
        right = right.withWatermark(ts_col, watermark_delay)
    l = left.select(
        *[F.col(c).alias(c if c in key_cols else f"l_{c}") for c in left.columns]
    )
    r = right.select(
        *[
            F.col(c).alias(f"_rk_{c}" if c in key_cols else f"r_{c}")
            for c in right.columns
        ]
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    cond = (
        cond
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l.join(r, cond, "inner").drop(*[f"_rk_{k}" for k in key_cols])
