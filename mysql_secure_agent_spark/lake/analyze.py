"""ANALYZE TABLE for the lake: column-level statistics over the reconciled
current state — row count, null count, distinct count, min/max — persisted
as a versioned sidecar for planners/operators to consult.

The manifests already carry PER-FILE pruning stats (key ranges, stats_cols
value ranges, lsn bounds — ``table.py``); what they cannot answer is
table-level cardinality questions: is this column a broadcast-able
dimension key? how selective is a predicate on it? how big would a dedup's
key space be? Warehouses answer with ANALYZE (MySQL's own
``ANALYZE TABLE`` feeds the optimizer the same way); this is the lake
analog, computed DISTRIBUTED over the reconciled state (never the raw
images — stats over stale duplicates would be wrong).

Scale note: ``approx=True`` (the 10^10-row path) uses
``approx_count_distinct`` — one pass, no Expand, HLL merge map-side.
``approx=False`` uses exact ``count_distinct`` (Catalyst Expand: one
shuffle carrying n_cols× rows) — the oracle-comparable configuration for
tests/entry queries. min/max are rendered as strings (numeric columns via
a fixed-scale decimal so the rendering is engine-portable).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .table import LakeTable


def _render(col: F.Column, dt: T.DataType) -> F.Column:
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        # fixed-scale decimal rendering: portable across engines, unlike
        # double→string (Spark prints 1.0E-4 where DuckDB prints 0.0001)
        return col.cast("decimal(28,6)").cast("string")
    return col.cast("string")


def analyze_table(
    table: LakeTable,
    spark: SparkSession,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Column statistics over the table's reconciled CURRENT state:
    one row per column — ``(col_name, n_rows, n_nulls, ndv, min_val,
    max_val)`` (min/max as portable strings, NULL for all-null columns).

    One job: a single global aggregate (plus Expand for exact ndv);
    ``persist`` writes ``_stats/v{version}.json`` keyed by the analyzed
    snapshot version so consumers can detect staleness.
    """
    commit = table.commit_at(resolve=False)
    schema_types = {n: t for n, t in commit.schema}
    cols = columns or [n for n, _ in commit.schema]
    missing = [c for c in cols if c not in schema_types]
    if missing:
        raise KeyError(f"no such columns: {missing}")
    state = table.read(spark)
    ndv = F.approx_count_distinct if approx else F.count_distinct
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = state.schema[c].dataType
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            ndv(F.col(c)).alias(f"_ndv_{c}"),
            _render(F.min(c), dt).alias(f"_min_{c}"),
            _render(F.max(c), dt).alias(f"_max_{c}"),
        ]
    row = state.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("ndv"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    out = row.select(F.explode(per_col).alias("s")).select("s.*")
    if persist:
        stats_rows = [r.asDict() for r in out.collect()]
        d = os.path.join(table.root, "_stats")
        os.makedirs(d, exist_ok=True)
        doc: dict[str, Any] = {
            "version": commit.version,
            "analyzed_at": time.time(),
            "approx": approx,
            "columns": stats_rows,
        }
        tmp = os.path.join(d, f"v{commit.version}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, os.path.join(d, f"v{commit.version}.json"))
        # rebuild the same DataFrame from the collected rows so the caller
        # does not recompute the aggregate on reuse
        return spark.createDataFrame(
            [
                (
                    r["col_name"],
                    r["n_rows"],
                    r["n_nulls"],
                    r["ndv"],
                    r["min_val"],
                    r["max_val"],
                )
                for r in stats_rows
            ],
            "col_name string, n_rows long, n_nulls long, ndv long, "
            "min_val string, max_val string",
        )
    return out


def read_stats(table: LakeTable, version: int | None = None) -> dict[str, Any]:
    """Newest persisted stats at or below ``version`` (default: any).
    Raises FileNotFoundError when the table was never analyzed."""
    d = os.path.join(table.root, "_stats")
    best: tuple[int, str] | None = None
    if os.path.isdir(d):
        for fn in os.listdir(d):
            if fn.startswith("v") and fn.endswith(".json"):
                v = int(fn[1:-5])
                if (version is None or v <= version) and (
                    best is None or v > best[0]
                ):
                    best = (v, fn)
    if best is None:
        raise FileNotFoundError(f"no persisted stats under {d}")
    with open(os.path.join(d, best[1])) as f:
        return json.load(f)
