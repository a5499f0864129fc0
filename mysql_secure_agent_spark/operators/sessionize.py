"""Gap-based sessionization — batch (windowed) and streaming (stateful).

Turns an event/turn stream into sessions: consecutive activity per key with
no gap larger than ``gap_seconds`` belongs to one session. For transcripts
this is the conversation-activity operator (a conversation that pauses for
an hour and resumes is two training contexts); for the events table it is
classic clickstream sessionization.

Two implementations with the same semantics:

* ``sessionize`` (batch): one keyed window — ``lag(ts)`` marks session
  starts, a running sum numbers them, a groupBy aggregates bounds/counts.
  Two stages over one shuffle on the key (the window and the groupBy share
  the hash partitioning, so Catalyst plans a single exchange). Fully
  SQL-expressible → oracle-gated.
* ``sessionize_stream`` (streaming): ``applyInPandasWithState`` keeps one
  open session per key in GroupState; a batch's events extend it or close
  it (gap exceeded → the closed session is EMITTED and a new one opens).
  Closed sessions stream out in append mode; the tail session per key
  stays open in state (a real deployment closes it via state timeout).
  This is the Structured Streaming shape the reference's single-threaded
  loop cannot express: per-key state partitioned across executors,
  checkpointed with the query.

The streaming variant processes batches in event order WITHIN a key
(events are sorted per group before folding) and merges the open-session
state into that timeline as an interval, so out-of-order arrivals *within
the watermark* are handled: an earlier event lowers session_start (or
splits into its own session when gap-separated before the open one). The
one append-mode limitation is final emission: an arrival later than a
session already closed by a previous batch starts a new session rather
than reopening the emitted one — same contract as our lsn-segmented feed
(per-key-order across batches, ``Updater.java:148-186``).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

__all__ = ["sessionize", "sessionize_stream", "SESSION_SCHEMA"]


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per (key, session): session_idx (0-based per key, in time
    order), session_start/session_end, n_events."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps refuse a direct double cast; routing through `timestamp`
    # is a no-op for tz-aware inputs and fixes the session tz for NTZ —
    # differences (all we use) are identical either way.
    secs = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    is_new = F.when(
        prev.isNull() | (secs(F.col(ts_col)) - secs(prev) > gap_seconds),
        1,
    ).otherwise(0)
    numbered = df.withColumn(
        "_sess",
        F.sum(is_new).over(
            Window.partitionBy(key_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        numbered.groupBy(F.col(key_col), F.col("_sess").alias("session_idx"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = "start double, end double, n bigint"


def _fold_sessions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
    gap_seconds: int,
    use_timeout: bool,
) -> Iterator[pd.DataFrame]:
    """Fold a batch of one key's events into the open-session state; yield
    sessions closed by this batch (gap exceeded, or watermark timeout)."""
    (user_id,) = key
    closed: list[tuple] = []

    if use_timeout and state.hasTimedOut:
        # watermark passed end + gap: no on-time event can extend this
        # session anymore — flush it and drop the state
        if state.exists:
            start, end, n = state.get
            closed.append((user_id, start, end, n))
        state.remove()
    else:
        # Fold the open-session state as an INTERVAL into the batch's sorted
        # timeline instead of only appending after it. An on-time but
        # out-of-order event (tsec < open start — watermark mode explicitly
        # admits these) then correctly LOWERS session_start, and an event
        # gap-separated *before* the open session splits into its own
        # session rather than being silently absorbed. Residual semantics
        # (inherent to append-mode emission): a session closed by this
        # batch is final — an even-later arrival that would have belonged
        # to it starts a new session instead of reopening it.
        items: list[tuple] = []  # (start, end, n) intervals, points are n=1
        if state.exists:
            items.append(tuple(state.get))
        for pdf in pdfs:
            # TRUE epoch seconds, shipped as a numeric column by
            # sessionize_stream: Arrow hands pandas tz-NAIVE timestamps in
            # the SESSION timezone, so Timestamp.timestamp() here would be
            # off by the tz offset — and setTimeoutTimestamp compares
            # against the true-epoch watermark (a west-of-UTC session tz
            # would set timeouts below the watermark and kill the query)
            for tsec in pdf["_epoch"]:
                tsec = float(tsec)
                items.append((tsec, tsec, 1))
        items.sort(key=lambda it: (it[0], it[1]))

        start = end = None
        n = 0
        for s, e, cnt in items:
            if start is None:
                start, end, n = s, e, cnt
            elif s - end > gap_seconds:
                closed.append((user_id, start, end, n))
                start, end, n = s, e, cnt
            else:
                end = max(end, e)
                n += cnt
        if start is None:
            state.remove()
        else:
            state.update((start, end, n))
            if use_timeout:
                # fire when the watermark proves the gap has elapsed
                state.setTimeoutTimestamp(int((end + gap_seconds) * 1000) + 1)

    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        # tz-AWARE UTC out: Arrow converts aware timestamps by instant;
        # naive ones would be reinterpreted in the session timezone
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s", utc=True)
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s", utc=True)
        yield out


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Stateful streaming sessionization over a stream with (user_id, ts).

    Append-mode output of CLOSED sessions; one open session per key lives in
    GroupState (checkpointed, partitioned by key across executors). Apply to
    a ``readStream`` DataFrame and write with ``outputMode("append")``.

    With ``watermark_delay`` set (e.g. ``"10 minutes"``), tail sessions
    CLOSE THEMSELVES: the state registers an event-time timeout at
    ``session_end + gap``, and when the watermark passes it the session is
    emitted and evicted — the full sessionization contract, bounded state
    included. Without it, the tail session per key stays open forever (the
    caller owns draining)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_timeout = watermark_delay is not None

    def fold(key, pdfs, state):
        return _fold_sessions(key, pdfs, state, gap_seconds, use_timeout)

    # _epoch = true epoch seconds (cast is tz-independent) — the fold works
    # in true epochs so event-time timeouts line up with the watermark under
    # ANY spark.sql.session.timeZone, not just UTC
    src = events.select(
        "user_id", "ts", F.col("ts").cast("double").alias("_epoch")
    )
    if use_timeout:
        src = src.withWatermark("ts", watermark_delay)
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
