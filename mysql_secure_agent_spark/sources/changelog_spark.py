"""Distributed (Spark-native) deterministic changelog generator.

The pandas generator (``sources/changelog.py``) is the *oracle-grade* fixture
source for tests; this one generates the same *shape* of feed — Zipf-skewed
conv_id, per-key op-sequence validity (first image I, delete followed by
re-insert), monotone source_lsn with rotation epochs — entirely with Spark
expressions, so a 10^8+-event bench feed is produced in parallel instead of
through a single pandas process. Everything derives from ``xxhash64(lsn,
seed)`` — fully deterministic, no rand().

Op-sequence rule (closed form of the reference's single-threaded semantics,
cf. changelog.py's fixpoint loop): within a key ordered by lsn, with
``raw_d`` the per-image delete draw and ``eff_d = raw_d AND NOT first``:

    op = I  if first image of key OR previous image had eff_d
         D  elif raw_d
         U  otherwise

which guarantees: first image is an insert, no two consecutive deletes, and
the image after a delete is a re-insert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _u(col, seed: int):
    """Deterministic uniform in (0,1) from the log position."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1 << 20)) + 0.5) / float(1 << 20)


def changelog_df(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    max_turns: int = 64,
    zipf_s: float = 1.2,
    delete_frac: float = 0.08,
    rotate_every: int | None = None,
    seed: int = 42,
    base_ts: str = "2026-01-01",
    partitions: int | None = None,
    strict_ops: bool = True,
) -> DataFrame:
    """``strict_ops=False`` assigns ops purely by hash (no per-key window
    pass): the first image of a key may then be U/D, which the engine treats
    as upsert/no-op — still a valid CDC stream, generated with zero shuffles
    (used for very large bench feeds)."""
    rotate_every = rotate_every or max(n_events // 4, 1)
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    lsn = F.col("id")
    df = spark.range(1, n_events + 1, 1, partitions)

    # Zipf over conversation ranks via the exact continuous inverse CDF:
    # r = (1 + u·(C^(1-s) − 1))^(1/(1-s)), clamped to [1, C].
    u = _u(lsn, seed)
    c = float(n_convs)
    one_minus_s = 1.0 - zipf_s
    rank = F.pow(F.lit(1.0) + u * (c**one_minus_s - 1.0), F.lit(1.0 / one_minus_s))
    conv = F.least(F.greatest(F.floor(rank), F.lit(1)), F.lit(n_convs)) - 1

    turn_budget = 4 + F.pmod(F.xxhash64(conv, F.lit(seed + 1)), F.lit(max_turns - 3))
    turn = F.pmod(F.xxhash64(lsn, F.lit(seed + 2)), turn_budget).cast("int")
    raw_d = _u(lsn, seed + 3) < delete_frac

    df = df.select(
        lsn.alias("source_lsn"),
        F.concat(F.lit("c"), F.lpad(conv.cast("string"), 8, "0")).alias("conv_id"),
        turn.alias("turn_idx"),
        raw_d.alias("_raw_d"),
    )

    if strict_ops:
        w = W.partitionBy("conv_id", "turn_idx").orderBy("source_lsn")
        first = F.row_number().over(w) == 1
        eff_d = F.col("_raw_d") & ~first
        prev_eff_d = F.coalesce(F.lag(eff_d).over(w), F.lit(False))
        op = (
            F.when(first | prev_eff_d, "I")
            .when(F.col("_raw_d"), "D")
            .otherwise("U")
        )
    else:
        u_op = _u(F.col("source_lsn"), seed + 9)
        op = (
            F.when(F.col("_raw_d"), "D")
            .when(u_op < 0.3, "I")
            .otherwise("U")
        )
    df = df.withColumn("op", op).drop("_raw_d")

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(F.xxhash64("conv_id", F.col("turn_idx").cast("long")), F.lit(4)) + 1).cast("int"),
    )
    tool_arr = F.array(
        F.lit("search"), F.lit("calculator"), F.lit("python"), F.lit("browser"), F.lit(None).cast("string")
    )
    tool = F.element_at(tool_arr, (F.pmod(F.xxhash64("source_lsn", F.lit(seed + 4)), F.lit(5)) + 1).cast("int"))
    text = F.concat_ws(
        ":",
        F.concat(F.lit("turn "), F.col("conv_id")),
        F.col("turn_idx").cast("string"),
        F.col("source_lsn").cast("string"),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(base_ts), "yyyy-MM-dd") + F.col("source_lsn")
    )
    is_d = F.col("op") == "D"
    file_no = F.expr(f"source_lsn DIV {rotate_every}") + 1
    out = df.select(
        "op",
        "conv_id",
        "turn_idx",
        F.when(is_d, F.lit(None)).otherwise(role).alias("role"),
        F.when(is_d, F.lit(None)).otherwise(text).alias("text"),
        F.when(is_d, F.lit(None)).otherwise(tool).alias("tool"),
        F.when(is_d, F.lit(None).cast("timestamp")).otherwise(ts).alias("ts"),
        "source_lsn",
        F.format_string("mysql-bin.%06d", file_no).alias("binlog_file"),
        (F.pmod(F.col("source_lsn"), F.lit(rotate_every)) + 4).alias("binlog_pos"),
    )
    return out


def write_feed_spark(
    spark: SparkSession,
    feed_dir: str,
    n_events: int,
    n_convs: int,
    n_files: int = 64,
    **kwargs,
) -> None:
    """Materialize the feed as ``n_files`` lsn-ranged parquet files under
    ``feed_dir/data`` (log segments; streaming-source trigger boundaries)."""
    import os

    df = changelog_df(spark, n_events, n_convs, **kwargs)
    (
        df.repartitionByRange(n_files, "source_lsn")
        .write.mode("overwrite")
        .parquet(os.path.join(feed_dir, "data"))
    )
