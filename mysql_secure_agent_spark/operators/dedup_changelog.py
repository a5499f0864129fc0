"""Last-image-wins reduction over a keyed change stream (SURVEY §2.4 A3).

The reference applies events strictly in binlog order on a single thread, so
the last image per primary key wins implicitly (``Updater.java:148-186``;
position monotone ``BinlogClient.java:254-264``). Under Spark parallelism that
total order must be re-established explicitly: keep, per key, the row with the
maximum ``source_lsn``.

Two physical strategies, identical results (lsn is globally unique):

* ``window`` — ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC) = 1``.
  The north-star formulation. Shuffles every row image to its key's reducer.
* ``max_by`` — ``groupBy(key).agg(max_by(struct(payload), lsn))``. Partial
  aggregation: each map task pre-reduces to one row per key before the
  shuffle, so a hot key (Zipf-skewed conv_id) costs one row per map partition
  instead of its full image count. This is the strategy that survives
  10^10 events with skew; it is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def last_image_wins(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "source_lsn",
    strategy: str = "max_by",
) -> DataFrame:
    """Reduce to the max-``order_col`` row per ``key_cols`` group."""
    if strategy == "window":
        w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "max_by":
        # max(struct(lsn, payload...)) rather than max_by(...): struct
        # comparison is lexicographic and lsn (globally unique) leads, so the
        # result is identical — but Catalyst compiles max() to a declarative
        # partial_max/max pair (map-side combine), whereas max_by on a wide
        # struct falls back to a sort-based aggregate. Verified in
        # tests/test_operators.py::test_max_by_plan_has_partial_aggregation.
        payload = [c for c in df.columns if c not in key_cols]
        ordered = [order_col] + [c for c in payload if c != order_col]
        agg = df.groupBy(*key_cols).agg(
            F.max(F.struct(*ordered)).alias("_last")
        )
        return agg.select(*key_cols, *[F.col(f"_last.{c}").alias(c) for c in payload])
    raise ValueError(f"unknown strategy {strategy!r}")
