"""Z-order (Morton) clustering for compaction — multi-dimension pruning.

A single-column sort gives tight per-file stats on THAT column only: a
key-sorted bucket prunes key ranges but smears ``ts`` across every file,
and vice versa. Interleaving the bits of several columns' normalized ranks
(the Morton curve) keeps files clustered in EVERY participating dimension
at once — each split file covers a small hyperrectangle, so its footer
min/max are tight for key scans AND time slices simultaneously. This is
Iceberg's ``rewriteDataFiles(zOrder(...))`` / Delta's ``ZORDER BY``
re-expressed as a pure Catalyst expression feeding the same
``sortWithinPartitions`` compaction already performs.

Mechanics, all JVM-side (no UDF):

  * each column maps to a 16-bit rank: ``(col - lo) / (hi - lo) * 65535``
    clamped to [0, 65535] — lo/hi come from parquet FOOTER stats of the
    files being rewritten (metadata-only, no extra Spark pass; bounds only
    shape clustering quality, never correctness, so conservative or stale
    bounds are harmless). NULLs rank 0.
  * ranks interleave bit-by-bit into one long (column 0 takes the highest
    bit position): a 16-iteration shift/or expression chain that
    whole-stage codegen flattens into straight-line JVM arithmetic.

Supported column types: integers, floats/doubles, timestamps and dates
(via epoch seconds). Strings are refused — a lexicographic rank needs a
value dictionary, which is a different (sampling) design.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

__all__ = ["zvalue", "ZBITS"]

ZBITS = 16  # bits of rank per column


def _numeric(col: str, ddl: str) -> F.Column:
    """The column as a double on an orderable numeric axis."""
    d = ddl.lower()
    if d in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col)).cast("double")
    if d == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if d in ("tinyint", "smallint", "int", "bigint", "float", "double") or d.startswith(
        "decimal"
    ):
        return F.col(col).cast("double")
    raise ValueError(f"zorder does not support column type {ddl!r} ({col})")


def _rank(col: str, ddl: str, lo: Any, hi: Any) -> F.Column:
    """16-bit rank of ``col`` within [lo, hi]; NULL → 0; degenerate or
    missing bounds → 0 (the column stops contributing, harmlessly)."""
    if lo is None or hi is None:
        return F.lit(0).cast("long")
    x = _numeric(col, ddl)
    lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    if float(hi) <= float(lo):
        return F.lit(0).cast("long")
    span = hi_c - lo_c
    r = F.floor((x - lo_c) / span * F.lit(float((1 << ZBITS) - 1)))
    r = F.least(F.greatest(r, F.lit(0)), F.lit((1 << ZBITS) - 1))
    return F.coalesce(r, F.lit(0)).cast("long")


def zvalue(
    cols: list[str],
    types: dict[str, str],
    bounds: dict[str, tuple[Any, Any]],
) -> F.Column:
    """Morton code of the given columns as one long Column. ``types`` maps
    column → Spark DDL type string (the table schema); ``bounds`` maps
    column → (lo, hi) on the numeric axis of ``_numeric`` (epoch micros for
    timestamps, days for dates, the value itself otherwise)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * ZBITS > 63:
        raise ValueError(
            f"zorder supports at most {63 // ZBITS} columns at {ZBITS}-bit "
            "ranks (the Morton code must fit a signed long)"
        )
    for c in cols:  # type validation regardless of bounds availability
        _numeric(c, types[c])
    ranks = [_rank(c, types[c], *bounds.get(c, (None, None))) for c in cols]
    n = len(ranks)
    z = F.lit(0).cast("long")
    for bit in range(ZBITS):
        for ci, r in enumerate(ranks):
            # bit `bit` of rank ci lands at interleaved position
            # (bit * n + (n - 1 - ci)) — column 0 most significant
            pos = bit * n + (n - 1 - ci)
            z = z + F.shiftleft(
                F.shiftright(r, bit).bitwiseAND(F.lit(1)), pos
            )
    return z
