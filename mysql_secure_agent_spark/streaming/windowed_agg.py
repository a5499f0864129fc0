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

__all__ = ["tumbling_rollup", "tumbling_rollup_stream"]


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
