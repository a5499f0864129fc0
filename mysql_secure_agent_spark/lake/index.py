"""Secondary index over a non-key column of a LakeTable, maintained O(delta).

The main table's point ``lookup`` is bucket-pruned only for the bucket key
(``table.py::lookup``); a predicate on any other column scans every bucket.
An OLTP source would CREATE INDEX — this is the lake analog: the index is
itself a small ``LakeTable`` of ``(indexed col, src key cols)`` rows, KEYED by
that whole tuple and BUCKETED by the indexed column alone, so

* ``lookup_index(value)`` prunes to 1/n_buckets of the *index* metadata (the
  usual driver-side Murmur3 bucket math), yielding the matching src keys;
* fetching the full rows then prunes the *main* table to exactly the buckets
  those keys hash to.

Maintenance rides the changefeed (``read_changes``): per refresh the index
applies one idempotent lake merge containing (a) upserts for the net new
``(value, key)`` pairs, (b) deletes for pairs whose value changed or whose
key was deleted. Old values are NOT in the changefeed (it carries the new
image), so the refresher time-travels: it reads the main table at the
version of the PREVIOUS refresh, pruned to the changed keys' buckets — an
O(touched-buckets) read, never O(table). This is the same
materialized-view-index shape as a DynamoDB GSI or a Postgres index build +
WAL apply: index writes are deferred, batched, and idempotent.

The refresh cursor ((last lsn, main version)) travels INSIDE the refresh's
batch id (``{seq}.idx{lsn}_{version}``), so it commits atomically with the
merge through the index table's applied-batch ledger — there is no window
where entries are applied but the cursor is stale (a sidecar cursor written
after the merge would lose changes that land between a crash and the retry:
the retry's changefeed read would span them, but the merge would be skipped
as already-applied). The numeric ``{seq}.`` prefix makes old refresh ids
fold into the ledger's high-water mark like streaming epochs, keeping commit
metadata O(1) in the number of refreshes; the newest id — the cursor — is
always kept verbatim.

Reference scope note: the reference agent has no secondary indexes (it ships
changes outward; indexing is the warehouse's job) — this exceeds it, because
this lake IS the warehouse here.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.dedup_changelog import last_image_wins
from .table import SYS_DELETED, SYS_LSN, LakeTable, _type_from_ddl


class SecondaryIndex:
    META = "_index.json"

    def __init__(self, root: str, main: LakeTable):
        self.root = root
        self.main = main
        with open(os.path.join(root, self.META)) as f:
            meta = json.load(f)
        self.col: str = meta["col"]
        self.table = LakeTable(root)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        root: str,
        main: LakeTable,
        col: str,
        n_buckets: int = 16,
        overwrite: bool = False,
    ) -> "SecondaryIndex":
        commit = main.commit_at(resolve=False)
        types = dict(commit.schema)
        if col not in types:
            raise KeyError(f"no column {col!r} in the main table schema")
        if col in commit.key_cols:
            raise ValueError(
                f"{col!r} is a key column — the main table already prunes on it"
            )
        fields = [T.StructField(col, _type_from_ddl(types[col]), True)] + [
            T.StructField(k, _type_from_ddl(types[k]), False)
            for k in commit.key_cols
        ]
        LakeTable.create(
            root,
            T.StructType(fields),
            key_cols=[col, *commit.key_cols],
            bucket_cols=[col],
            n_buckets=n_buckets,
            overwrite=overwrite,
        )
        meta = {"col": col}
        with open(os.path.join(root, cls.META), "w") as f:
            json.dump(meta, f)
        return cls(root, main)

    _ID_RE = re.compile(r"^(\d+)\.idx(-?\d+)_(\d+)$")

    def _cursor(self) -> dict[str, int]:
        """Recover (seq, lsn, version) from the index table's own applied
        ledger — the newest refresh id IS the cursor, committed atomically
        with its entries."""
        commit = self.table.commit_at(resolve=False)
        best = (-1, -1, 0)
        for bid in commit.applied_batches:
            m = self._ID_RE.match(bid)
            if m:
                t = (int(m.group(1)), int(m.group(2)), int(m.group(3)))
                if t[0] > best[0]:
                    best = t
        return {"seq": best[0], "cursor_lsn": best[1], "cursor_version": best[2]}

    # --------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> dict[str, Any]:
        """Catch the index up to the main table's current head.

        Cost: one changefeed read (listing-pruned to files above the cursor),
        one time-travel read of the main table pruned to the changed keys'
        buckets, one lake merge of O(changed keys) index entries.
        """
        cur = self._cursor()
        main_commit = self.main.commit_at(resolve=False)
        head_version = main_commit.version
        if head_version == cur["cursor_version"]:
            return {"skipped": True, "reason": "index already at main head"}
        if cur["cursor_version"] < self.main.version_floor():
            # the cursor's snapshot was expired (or this is a fresh index on
            # an already-expired table): the old-value time-travel read is
            # impossible — full backfill instead of wedging forever
            return self._rebuild(spark)
        keys = main_commit.key_cols

        # The delta is bounded by the COMMIT WINDOW (cursor_version, head],
        # pinned to the head snapshot — both bounds matter: a merge racing
        # this refresh must not slip events past the recorded cursor, and a
        # scalar lsn cursor would silently drop every lower-namespaced
        # shard's events once one higher-shard lsn had been seen (per-shard
        # lsn sequences are not globally ordered). If the window's history
        # was rewritten (compaction/rebucket), fall back to a full rebuild.
        try:
            changes = self.main.read_changes(
                spark,
                since_lsn=-1,
                since_version=cur["cursor_version"],
                version=head_version,
            )
        except ValueError:
            return self._rebuild(spark)
        changes = changes.persist()
        try:
            # old (value, key) pairs: main table AT THE CURSOR VERSION,
            # pruned to the changed keys' buckets, semi-joined to those keys.
            # Bucket ids are only meaningful under the layout of the version
            # being read — after a rebucket between cursor and head, fall
            # back to an unpruned time-travel read rather than miss files.
            old_commit = self.main.commit_at(cur["cursor_version"], resolve=False)
            same_layout = (
                old_commit.n_buckets == main_commit.n_buckets
                and old_commit.bucket_function == main_commit.bucket_function
                and old_commit.bucket_cols == main_commit.bucket_cols
            )
            # ONE scalar-agg job over the cached changes computes both the
            # touched-bucket set (collect_set is tiny: ≤ n_buckets ints) and
            # the new cursor lsn — previously two separate driver actions.
            aggs = [F.max("source_lsn").alias("_hi")]
            if same_layout:
                aggs.append(
                    F.collect_set(
                        self.main._bucket_expr(main_commit)
                    ).alias("_bs")
                )
            stats = changes.agg(*aggs).collect()[0]
            touched = (
                sorted(int(b) for b in stats["_bs"]) if same_layout else None
            )
            old = (
                self.main.read(
                    spark, version=cur["cursor_version"], buckets=touched
                )
                .select(*keys, F.col(self.col).alias("_old"))
                .join(changes.select(*keys), keys, "leftsemi")
            )
            # every `old` key is in `changes` (semi-join above) — a LEFT join
            # from the changes side loses nothing.
            paired = changes.select(
                "op", *keys, F.col(self.col).alias("_new"), "source_lsn"
            ).join(old, keys, "left")

            # delete the stale entry when the key vanished or its value moved;
            # NULL values are not indexed (lookup of NULL is unsupported).
            dels = paired.filter(
                F.col("_old").isNotNull()
                & (
                    (F.col("op") == "D")
                    | F.col("_new").isNull()
                    | (F.col("_new") != F.col("_old"))
                )
            ).select(
                F.lit("D").alias("op"),
                F.col("_old").alias(self.col),
                *keys,
                F.col("source_lsn"),
            )
            ups = paired.filter(
                (F.col("op") == "U") & F.col("_new").isNotNull()
            ).select(
                F.lit("U").alias("op"),
                F.col("_new").alias(self.col),
                *keys,
                F.col("source_lsn"),
            )
            entries = ups.unionByName(dels)
            # the batch id carries the POST-refresh cursor: it lands in the
            # ledger in the same atomic commit as the entries (see module
            # docstring), so _cursor() recovery can never lag the data.
            hi = stats["_hi"]
            to_lsn = int(hi) if hi is not None else cur["cursor_lsn"]
            batch_id = f"{cur['seq'] + 1}.idx{to_lsn}_{head_version}"
            metrics = self.table.merge(spark, entries, batch_id)
        except ValueError as e:
            # expire_versions can land CONCURRENTLY after the floor check
            # above — the cursor commit_at / time-travel read then raises
            # the expired-version error; recover through the same rebuild
            # path instead of crashing the refresh
            if "expired" in str(e):
                return self._rebuild(spark)
            raise
        finally:
            changes.unpersist()
        if touched is not None:
            metrics["index_buckets_pruned_read"] = sorted(int(b) for b in touched)
        return metrics

    def _rebuild(self, spark: SparkSession) -> dict[str, Any]:
        """Full backfill — the recovery path when the incremental cursor
        cannot be honored (cursor snapshot expired by ``expire_versions``,
        or the window's history rewritten by compaction/rebucket). The
        DynamoDB-GSI-backfill analog: recompute the full (value, key) set
        at head, delete index entries the head state no longer supports,
        upsert the rest — one idempotent merge whose batch id advances the
        cursor to head atomically.

        Lsn stamping is the subtle part (index rows resolve per key by
        ``source_lsn``, and shard-namespaced lsns are only ordered WITHIN a
        key's shard): upserts carry their main row's OWN lsn (consistent
        with every future event of that key); deletes of vanished pairs
        carry the stale entry's own lsn + 1 — strictly above the entry
        (so the delete wins) and no higher than the main-side event that
        removed the value (every future event of that key lands above it).
        A global-max stamp would instead let a huge higher-shard lsn
        permanently shadow a lower-shard key's future inserts.
        """
        cur = self._cursor()
        head_commit = self.main.commit_at()
        head_version = head_commit.version
        keys = head_commit.key_cols
        # snapshot cursor lsn from listing metadata (display/ordering only)
        to_lsn = max(
            (
                int(e["lsn_max"])
                for es in head_commit.files.values()
                for e in es
                if e.get("lsn_max") is not None
            ),
            default=max(cur["cursor_lsn"], 0),
        )
        raw = self.main._read_files(spark, head_commit)
        if raw is None:
            fresh = None
        else:
            state = last_image_wins(
                raw, key_cols=keys, order_col=SYS_LSN, strategy="max_by"
            ).filter(~F.col(SYS_DELETED))
            fresh = (
                state.filter(F.col(self.col).isNotNull())
                .select(
                    F.col(self.col),
                    *keys,
                    F.col(SYS_LSN).alias("source_lsn"),
                )
                .persist()
            )
        try:
            iraw = self.table._read_files(spark, self.table.commit_at())
            entries_parts = []
            if iraw is not None:
                existing = last_image_wins(
                    iraw,
                    key_cols=[self.col, *keys],
                    order_col=SYS_LSN,
                    strategy="max_by",
                ).filter(~F.col(SYS_DELETED))
                gone = existing.select(
                    self.col, *keys, F.col(SYS_LSN).alias("_elsn")
                )
                if fresh is not None:
                    gone = gone.join(
                        fresh.select(self.col, *keys), [self.col, *keys], "left_anti"
                    )
                entries_parts.append(
                    gone.select(
                        F.lit("D").alias("op"),
                        self.col,
                        *keys,
                        (F.col("_elsn") + 1).alias("source_lsn"),
                    )
                )
            if fresh is not None:
                entries_parts.append(
                    fresh.select(F.lit("U").alias("op"), self.col, *keys, "source_lsn")
                )
            if not entries_parts:
                return {"skipped": True, "reason": "empty main and index"}
            entries = entries_parts[0]
            for p in entries_parts[1:]:
                entries = entries.unionByName(p)
            batch_id = f"{cur['seq'] + 1}.idx{to_lsn}_{head_version}"
            metrics = self.table.merge(spark, entries, batch_id)
        finally:
            if fresh is not None:
                fresh.unpersist()
        metrics["rebuild"] = True
        return metrics

    # ---------------------------------------------------------------- lookup
    def lookup_keys(self, spark: SparkSession, value: Any) -> DataFrame:
        """src-key rows whose ``col`` equals ``value`` — touches 1/n_buckets
        of the index's metadata and files."""
        return self.table.lookup(spark, {self.col: value}).drop(self.col)

    def lookup_keys_range(
        self, spark: SparkSession, lo: Any = None, hi: Any = None
    ) -> DataFrame:
        """src-key rows whose ``col`` ∈ [lo, hi] (inclusive; None = open
        side). The indexed column is the index table's FIRST key column, so
        ``read(key_range=...)`` prunes at the listing level against the
        key stats sorted compaction recorded — a narrow range over a
        compacted 10^10-entry index opens only the files whose (col, ...)
        interval intersects, plus un-statted recent deltas."""
        return self.table.read(spark, key_range={self.col: (lo, hi)})

    def _fetch_matched(self, spark: SparkSession, matched: list) -> DataFrame:
        """Matched index rows → ONE main read pruned to their buckets →
        broadcast semi-join (the key list is small by construction)."""
        from .bucketing import bucket_for

        commit = self.main.commit_at(resolve=False)
        keys = commit.key_cols
        if not matched:
            return self.main.read(spark, buckets=[])
        types = dict(commit.schema)
        buckets = sorted(
            {
                bucket_for(
                    [r[c] for c in commit.bucket_cols],
                    [types[c] for c in commit.bucket_cols],
                    commit.n_buckets,
                )
                for r in matched
            }
        )
        keys_df = spark.createDataFrame(
            [tuple(r[c] for c in keys) for r in matched],
            T.StructType(
                [T.StructField(c, _type_from_ddl(types[c]), False) for c in keys]
            ),
        )
        base = self.main.read(spark, buckets=buckets)
        return base.join(F.broadcast(keys_df), keys, "leftsemi")

    def lookup(
        self, spark: SparkSession, value: Any, max_keys: int = 100_000
    ) -> DataFrame:
        """Full main-table rows whose ``col`` equals ``value``: index probe →
        matched keys → ONE main read pruned to those keys' buckets → join.

        The matched key set is collected driver-side to compute the bucket
        list (the same O(matches) trade as ``LakeTable.lookup``'s driver-side
        hash); ``max_keys`` guards against using a low-selectivity value as a
        full scan — raise the cap or scan the table if you mean that.
        """
        matched = self.lookup_keys(spark, value).limit(max_keys + 1).collect()
        if len(matched) > max_keys:
            raise ValueError(
                f"index lookup for {value!r} matched more than {max_keys} keys; "
                "raise max_keys or use a full read with a filter"
            )
        return self._fetch_matched(spark, matched).filter(
            F.col(self.col) == F.lit(value)
        )

    def range_lookup(
        self,
        spark: SparkSession,
        lo: Any = None,
        hi: Any = None,
        max_keys: int = 100_000,
    ) -> DataFrame:
        """Full main-table rows whose ``col`` ∈ [lo, hi]: the range probe
        over the index (listing-pruned on compacted index files), then the
        same bucket-pruned main fetch as ``lookup``. The final re-filter on
        the MAIN row's current ``col`` value makes stale index entries
        harmless between refreshes (same contract as ``lookup``)."""
        if lo is None and hi is None:
            raise ValueError("range_lookup needs at least one bound")
        matched = (
            self.lookup_keys_range(spark, lo, hi).limit(max_keys + 1).collect()
        )
        if len(matched) > max_keys:
            raise ValueError(
                f"index range [{lo!r}, {hi!r}] matched more than {max_keys} "
                "keys; raise max_keys or use a full read with a filter"
            )
        out = self._fetch_matched(spark, matched)
        if lo is not None:
            out = out.filter(F.col(self.col) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(self.col) <= F.lit(hi))
        return out
