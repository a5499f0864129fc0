"""Source/replica drift verification — the pt-table-checksum analog.

The reference pipeline has no way to PROVE the destination equals the
source after months of CDC (its contract is per-event delivery,
``output/Updater.java:148-186``); the MySQL ecosystem's answer is
pt-table-checksum: chunk the table deterministically, compute an
order-insensitive per-chunk checksum on both sides, compare chunk lists,
then re-read only drifted chunks row-by-row. This module is that design
re-expressed as Catalyst plans:

  * **Per-row hash**: 60-bit integer from ``md5`` over a canonical
    ``concat_ws`` of the columns (NULL → a sentinel that cannot collide
    with a real value's rendering). Pure JVM expressions — no UDF.
  * **Chunk id**: hash of the KEY columns mod ``n_chunks`` — deterministic
    and engine-portable, so a drifted row always lands in the same chunk
    on both sides and a chunk mismatch localizes the key space to re-read.
  * **Chunk checksum**: ``bit_xor`` of the row hashes + ``count(*)`` —
    XOR is commutative/associative, so the aggregation is one partial-agg
    shuffle of ``n_chunks`` rows per map partition regardless of table
    size (pt-table-checksum uses BIT_XOR of CRC32s for exactly this
    reason). XOR cancels identical row PAIRS — the count catches that
    case, and key columns are inside the hash so two identical full rows
    cannot exist on one side of a keyed table.
  * **Drill-down**: ``diff_keys`` re-reads ONLY the drifted chunks on both
    sides (a row filter that pushes into the scan) and full-outer-joins
    them on the key — emitting only_in_left / only_in_right / changed
    rows. At 10^10 rows the expensive exact join runs over the drifted
    fraction, not the table.

All hash math is engine-portable (md5 + hex-prefix-to-int + xor), so a
DuckDB/MySQL side can compute the same chunk list with plain SQL — the
entry query ``cdc_table_checksum`` gates this bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["row_hash", "chunk_id", "checksum_chunks", "diff_chunks", "diff_keys"]

# NULL sentinel: a 1-char control string no canonical rendering produces.
_NULL = "\x00"
_SEP = "\x01"


def _canon(cols: list[str], binary_cols: set[str] = frozenset()) -> F.Column:
    # binary columns render as hex: a string cast reinterprets the bytes as
    # UTF-8 and maps every invalid sequence to U+FFFD — distinct payloads
    # would checksum equal
    def one(c: str) -> F.Column:
        v = F.hex(F.col(c)) if c in binary_cols else F.col(c).cast("string")
        return F.coalesce(v, F.lit(_NULL))

    return F.concat_ws(_SEP, *[one(c) for c in cols])


def _binary_cols(df: DataFrame) -> set[str]:
    return {n for n, t in df.dtypes if t == "binary"}


def row_hash(cols: list[str], binary_cols: set[str] = frozenset()) -> F.Column:
    """60-bit positive integer hash of the row's canonical rendering.
    ``conv(substr(md5(s),1,15),16,10)`` — the same md5-prefix trick the
    repo's portable 32-bit hash uses (text_dedup._h32), widened to 15 hex
    digits so per-chunk XORs are effectively collision-free."""
    return F.conv(
        F.substring(F.md5(_canon(cols, binary_cols)), 1, 15), 16, 10
    ).cast("long")


def chunk_id(
    key_cols: list[str], n_chunks: int, binary_cols: set[str] = frozenset()
) -> F.Column:
    """Deterministic chunk for a key — hash(key) mod n_chunks, portable
    (NOT Spark's murmur3: the other side of the comparison is typically
    not Spark)."""
    return F.pmod(row_hash(key_cols, binary_cols), F.lit(n_chunks)).cast("int")


def checksum_chunks(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    n_chunks: int = 64,
) -> DataFrame:
    """(chunk, n_rows, xor_hash) per chunk — ONE pass, partial-agg shuffle
    of ≤ n_chunks rows per map partition. ``value_cols`` defaults to every
    non-key column; pre-canonicalize float columns yourself if the other
    side renders doubles differently (the entry query hashes integer
    micros for exactly that reason)."""
    value_cols = (
        [c for c in df.columns if c not in set(key_cols)]
        if value_cols is None
        else value_cols
    )
    b = _binary_cols(df)
    hashed = df.select(
        chunk_id(key_cols, n_chunks, b).alias("chunk"),
        row_hash(list(key_cols) + list(value_cols), b).alias("_rh"),
    )
    return hashed.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_rh)").alias("xor_hash"),
    )


def diff_chunks(left: DataFrame, right: DataFrame) -> DataFrame:
    """Chunks whose (n_rows, xor_hash) disagree between two checksum_chunks
    outputs — a full outer join of two ≤n_chunks-row frames (driver-cheap).
    Returns (chunk, n_rows_l, xor_l, n_rows_r, xor_r) with nulls where a
    side lacks the chunk entirely."""
    l = left.select(
        "chunk", F.col("n_rows").alias("n_rows_l"), F.col("xor_hash").alias("xor_l")
    )
    r = right.select(
        "chunk", F.col("n_rows").alias("n_rows_r"), F.col("xor_hash").alias("xor_r")
    )
    j = l.join(r, "chunk", "full_outer")
    return j.filter(
        ~(
            F.col("n_rows_l").eqNullSafe(F.col("n_rows_r"))
            & F.col("xor_l").eqNullSafe(F.col("xor_r"))
        )
    )


def diff_keys(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    chunks: list[int],
    value_cols: list[str] | None = None,
    n_chunks: int = 64,
) -> DataFrame:
    """Row-level drift inside the given chunks: each side is filtered to
    those chunks (predicate in the scan — only the drifted key space is
    re-read), then full-outer-joined on the key comparing full-row hashes.
    Output: key columns + status ∈ {only_in_left, only_in_right, changed}.
    """
    if not chunks:
        raise ValueError("chunks must be non-empty (use diff_chunks first)")
    value_cols_l = (
        [c for c in left.columns if c not in set(key_cols)]
        if value_cols is None
        else value_cols
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        b = _binary_cols(df)
        return (
            df.withColumn("_chunk", chunk_id(key_cols, n_chunks, b))
            .filter(F.col("_chunk").isin([int(c) for c in chunks]))
            .select(
                *key_cols,
                row_hash(list(key_cols) + list(value_cols_l), b).alias(
                    f"_rh_{tag}"
                ),
            )
        )

    j = side(left, "l").join(side(right, "r"), list(key_cols), "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("_rh_r").isNull(), F.lit("only_in_left"))
        .when(F.col("_rh_l").isNull(), F.lit("only_in_right"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    ).filter(~F.col("_rh_l").eqNullSafe(F.col("_rh_r")))
