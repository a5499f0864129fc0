"""Strict-cast quarantine for stringly-typed change transports.

Every textual transport this engine ingests — the reference's JSONL
(positional strings, ``source/Row.java:10-22``), Debezium record dumps,
mysqldump archives — carries values that must be cast to the table's
types. Spark's ``cast`` turns an unparseable value into a silent NULL,
which a merge then happily writes over good data: the worst CDC failure
mode (corruption that looks like a legitimate NULL update). The raw
binary path already validates structurally before decode
(``functions/decode.py`` → DLQ); this is the same contract for the
relational path.

``split_invalid_casts`` partitions a changelog into rows whose every
value survives ``try_cast`` to the target schema and rows where some
non-NULL value would be silently nulled — each tagged with the offending
column list. One pass, pure Catalyst (``try_cast`` + boolean algebra);
the valid side keeps its ORIGINAL columns so the downstream merge's own
cast applies exactly as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _needs_check(src: T.DataType, dst: T.DataType) -> bool:
    # a widening/identical cast cannot fail; only lossy parses can
    # (string → anything, fractional → integral, decimal narrowing).
    if src == dst:
        return False
    if isinstance(src, T.StringType) and not isinstance(dst, T.StringType):
        return True
    if isinstance(src, (T.DoubleType, T.FloatType)) and isinstance(
        dst, (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.DecimalType)
    ):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return dst.precision - dst.scale < src.precision - src.scale
    return False


def split_invalid_casts(
    df: DataFrame,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(valid, invalid)``. A row is invalid iff any schema
    column present in ``df`` holds a non-NULL value whose ``try_cast`` to
    the target type is NULL. ``invalid`` carries the original row plus a
    ``_bad_cols`` array naming the offending columns (quarantine it —
    ``sinks/dead_letter`` or a plain parquet append); ``valid`` is the
    input row set unchanged (ready for the normal merge)."""
    src_types = dict(df.dtypes)
    checks = []
    for f in schema.fields:
        if f.name not in df.columns:
            continue
        src = df.schema[f.name].dataType
        if not _needs_check(src, f.dataType):
            continue
        bad = (
            F.col(f.name).isNotNull()
            & F.col(f.name).try_cast(f.dataType).isNull()
        )
        checks.append(F.when(bad, F.lit(f.name)))
    if not checks:
        return df, df.limit(0).withColumn(
            "_bad_cols", F.expr("CAST(array() AS array<string>)")
        )
    bad_cols = F.array_compact(F.array(*checks))
    tagged = df.withColumn("_bad_cols", bad_cols)
    return (
        tagged.filter(F.size("_bad_cols") == 0).drop("_bad_cols"),
        tagged.filter(F.size("_bad_cols") > 0),
    )
