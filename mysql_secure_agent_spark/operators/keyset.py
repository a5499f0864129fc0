"""Keyset (seek) pagination over a composite primary key — SURVEY §2.1 S2.

The reference pages snapshots with a lexicographic strict-greater-than
predicate over the ordered PK columns:

    (a > v1) OR (a = v1 AND b > v2) OR (a = v1 AND b = v2 AND c > v3) ...

(``ImportSourceTable.java:44-70``; exact SQL text tested in
``ImportSourceTableSpec.java:113-134``). In Spark a batch snapshot scan is
partition-parallel and needs no paging — but a *resumable backfill* still
wants the cursor: restart the import from the last synced PK
(``state/TableState.java:9-12`` lastSyncedPrimaryKey). The predicate is
declarative, so Catalyst pushes it into the parquet/Iceberg scan
(min/max pruning on the leading key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def keyset_after(key_cols: list[str], cursor: list) -> Column:
    """Build the lexicographic strict-> predicate (ImportSourceTable.java:44-70).

    ``cursor`` holds the last-synced values for each key column, in order.
    """
    if len(key_cols) != len(cursor):
        raise ValueError("cursor arity must match key columns")
    terms: list[Column] = []
    for i, kc in enumerate(key_cols):
        t = F.col(kc) > F.lit(cursor[i])
        for j in range(i):
            t = (F.col(key_cols[j]) == F.lit(cursor[j])) & t
        terms.append(t)
    pred = terms[0]
    for t in terms[1:]:
        pred = pred | t
    return pred


def page_after(
    df: DataFrame, key_cols: list[str], cursor: list | None, page_size: int
) -> DataFrame:
    """One snapshot page: WHERE keyset > cursor ORDER BY pk LIMIT n
    (ImportSourceTable.java:23-42; PAGE_SIZE loop Updater.java:96-121).
    ``cursor=None`` → first page."""
    out = df
    if cursor is not None:
        out = out.filter(keyset_after(key_cols, cursor))
    return out.orderBy(*key_cols).limit(page_size)


def snapshot_pages(df: DataFrame, key_cols: list[str], page_size: int):
    """Iterate the full snapshot page by page (Updater.java:56-69 import loop),
    yielding each page as a (cached) DataFrame.

    Driver-side loop over *pages* (not rows): each page is a distributed
    scan+sort+limit; the driver fetches only the row count and the max key
    (the next cursor) — never the page rows themselves, so page_size can be
    the reference's own 10M without driver memory entering the picture. Used
    only for resumable backfill — a plain backfill is one batch read.
    """
    cursor = None
    while True:
        page = page_after(df, key_cols, cursor, page_size).persist()
        head = page.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.struct(*key_cols)).alias("mx")
        ).first()
        n, mx = head["n"], head["mx"]
        if n == 0:
            page.unpersist()
            return
        yield page
        page.unpersist()
        cursor = [mx[c] for c in key_cols]
        if n < page_size:
            return
