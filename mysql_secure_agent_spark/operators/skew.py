"""Hot-key skew handling (SURVEY §4, north-star requirement).

A Zipf-skewed conv_id means one conversation can dominate a partition. For
*keyed* reductions the engine uses partial aggregation (``max_by`` dedup —
map-side combine bounds any key's shuffle cost at one row per map partition).
For *map-side* heavy stages (decode / normalize pandas UDFs) the fix is a
salted repartition: hash on (key, salt) so a hot key spreads over
``salt_buckets`` partitions while retaining partial locality.

AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``) is on as a
backstop for join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame,
    key_cols: list[str],
    n_partitions: int,
    salt_buckets: int = 8,
    lsn_col: str = "source_lsn",
) -> DataFrame:
    """Repartition on (keys, salt) where salt is derived deterministically
    from the log position (no rand() — keeps the plan replayable/resumable,
    which rand() would break on task retry).

    With no key columns there is nothing to keep local — partition on the
    log position itself (high cardinality ⇒ full spread). Hashing on the
    low-cardinality salt alone would cap parallelism at ``salt_buckets``."""
    if not key_cols:
        return df.repartition(n_partitions, F.col(lsn_col))
    salt = F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_buckets))
    return (
        df.withColumn("_salt", salt)
        .repartition(n_partitions, *key_cols, "_salt")
        .drop("_salt")
    )
