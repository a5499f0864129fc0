"""Event-time windowed aggregation with watermarked late-data handling.

The lake-consumer rollup: events/turns bucketed into tumbling event-time
windows (per-hour activity per type, training-data arrival curves). Batch
and streaming share ONE definition — ``F.window`` over the event-time
column — so the batch result is the oracle for the stream:

* batch: a plain groupBy(window(ts), keys) — Catalyst folds the window
  struct into a single projection, one shuffle on (window, keys);
* streaming: the same expression after ``withWatermark(ts, delay)``. The
  watermark bounds state (windows older than max-event-time − delay are
  finalized and evicted) and defines late-data semantics: an event older
  than the watermark is DROPPED rather than reopening its window — the
  deterministic trade the reference never faces (its single thread applies
  strictly in log order; a distributed ingest must declare how long it
  waits for stragglers).

Append-mode emits each window once, when the watermark passes its end —
exactly-once per window into any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tumbling_rollup",
    "tumbling_rollup_stream",
    "windowed_distinct_registers",
    "windowed_distinct_registers_stream",
    "windowed_distinct",
    "windowed_cms_registers",
    "windowed_cms_registers_stream",
]


def tumbling_rollup(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (tumbling window, keys): event count + value sum. Output
    flattens the window struct to window_start/window_end columns."""
    keys = key_cols if key_cols is not None else ["event_type"]
    agg_cols = [F.count(F.lit(1)).alias("n_events")]
    if "value" in df.columns:
        agg_cols.append(F.sum("value").alias("sum_value"))
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *keys)
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            *(["sum_value"] if "value" in df.columns else []),
        )
    )


def tumbling_rollup_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming twin: identical rollup over a readStream DataFrame, with a
    watermark bounding state and dropping late events. Write with
    ``outputMode("append")``: each window emits once, after the watermark
    passes its end."""
    return tumbling_rollup(
        events.withWatermark(ts_col, watermark_delay),
        window_duration=window_duration,
        ts_col=ts_col,
        key_cols=key_cols,
    )


# ------------------------------------------------- windowed distinct (HLL)
def windowed_distinct_registers(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    p: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """Distinct-count REGISTERS per (tumbling window, keys) — the shared
    batch/stream definition for "distinct users per hour per segment".

    A streaming ``count(distinct)`` needs state proportional to the
    distinct VALUES per open window — unbounded under a hot window. The
    HLL register form (``operators/sketches``) is a plain max aggregation,
    so Structured Streaming accepts it natively and the state per open
    window is AT MOST m = 2^p register rows per key group, no matter how
    many billions of users flow through. Max is also the HLL merge, so
    late batches, shard unions, and stream restarts all fold losslessly.

    Output: window_start/window_end + keys + reg_idx + rho. Streaming
    emits FINAL register rows once the watermark passes the window
    (append mode); the estimate is a stateless O(m)-per-window fold over
    the emitted rows (``windowed_distinct`` / ``hll_estimate``) — chaining
    it INTO the streaming query would be a second stateful aggregation,
    which append-mode streaming does not compose."""
    from ..operators.sketches import hll_registers

    keys = key_cols if key_cols is not None else ["event_type"]
    regs = hll_registers(
        df.select(F.window(F.col(ts_col), window_duration).alias("w"), *keys,
                  value_col),
        ["w", *keys],
        value_col,
        p=p,
        hash_fn=hash_fn,
    )
    return regs.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        "reg_idx",
        "rho",
    )


def windowed_distinct_registers_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    p: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """Streaming twin: identical registers over a readStream DataFrame;
    the watermark bounds open-window state and drops late events (same
    semantics as ``tumbling_rollup_stream``)."""
    return windowed_distinct_registers(
        events.withWatermark(ts_col, watermark_delay),
        window_duration=window_duration,
        ts_col=ts_col,
        key_cols=key_cols,
        value_col=value_col,
        p=p,
        hash_fn=hash_fn,
    )


def windowed_cms_registers(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Heavy-hitter (count-min) counters per (tumbling window, keys) — the
    streaming "who is hot this hour" sketch. Same shape argument as the
    HLL twin above: the counters are a plain SUM aggregation, so streaming
    accepts it natively and open-window state is capped at d·w counter
    rows per key group no matter how many distinct values flow; append
    mode emits final counters at watermark close, and
    ``operators.sketches.cms_estimate`` point-queries the sink (with
    window columns in ``group_cols``). Counter merge across restarts,
    shards, and late batches is the sum itself."""
    from ..operators.sketches import cms_rows

    keys = key_cols if key_cols is not None else ["event_type"]
    regs = cms_rows(
        df.select(F.window(F.col(ts_col), window_duration).alias("w"), *keys,
                  value_col),
        ["w", *keys],
        value_col,
        d=d,
        w=w,
    )
    return regs.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        "cm_row",
        "cm_idx",
        "cnt",
    )


def windowed_cms_registers_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Streaming twin: identical counters over a readStream DataFrame."""
    return windowed_cms_registers(
        events.withWatermark(ts_col, watermark_delay),
        window_duration=window_duration,
        ts_col=ts_col,
        key_cols=key_cols,
        value_col=value_col,
        d=d,
        w=w,
    )


def windowed_distinct(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "user_id",
    p: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """Registers → approx distinct per (window, keys). Batch convenience
    AND the estimator to run over a streamed register sink."""
    from ..operators.sketches import hll_estimate

    keys = key_cols if key_cols is not None else ["event_type"]
    regs = windowed_distinct_registers(
        df, window_duration, ts_col, keys, value_col, p, hash_fn
    )
    return hll_estimate(
        regs, ["window_start", "window_end", *keys], p=p
    ).withColumnRenamed("approx", "approx_distinct")
