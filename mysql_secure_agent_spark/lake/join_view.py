"""Incrementally-maintained JOIN view over two CDC-fed LakeTables.

The reference ships per-table changelogs and leaves joining to the
warehouse; here the lake IS the warehouse, and the classic warehouse ask
is a denormalized view kept current as BOTH sides change — e.g.
transcripts enriched with their conversation's user/dim attributes, at
10^10 rows, without ever recomputing the full join.

Shape: ``view = left LEFT JOIN right ON left.fk = right.key``, the view
keyed by the LEFT key (each left row owns exactly one view row — the
fact-to-dim n:1 join every enrichment pipeline runs). Maintenance is
*affected-key recompute*, the keyed-join IVM strategy production systems
use (a DynamoDB GSI / Materialize-style delta join degenerates to this
when the view key is the left key):

* keys touched by the LEFT changefeed are recomputed from the pinned
  head snapshots (their delete ships a view delete);
* keys whose RIGHT row changed are found by the reverse fk lookup and
  recomputed the same way — O(referencing rows), via an optional
  ``SecondaryIndex`` on the fk (bucket-pruned) or a semi-join scan
  fallback;
* one idempotent lake ``merge`` lands the recomputed rows; the refresh
  cursor (left version, right version) travels INSIDE the batch id, so
  cursor and data commit atomically through the view table's ledger —
  the same crash-safe cursor discipline as ``lake/index.py`` (see its
  module docstring for why a sidecar cursor is unsafe).

Lsn stamping: view rows resolve per key by ``source_lsn``, and a key can
be rewritten by a refresh that saw NO left-side change for it (its dim
row moved) — so raw left lsns cannot order view images. Refreshes are
serialized by the single maintainer, so the refresh SEQ is the ordering
domain: every row of refresh N carries lsn = N, strictly above refresh
N-1's images and below N+1's. Within one refresh each key appears once
(recompute is total per key, not differential).

Cost per refresh: two changefeed reads (listing-pruned to the commit
window), one pruned read of each head snapshot, one merge of O(affected
keys) rows. Nothing is O(|left|) unless the dim delta references
everything — the correct worst case.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import SparkSession, functions as F, types as T

from .table import LakeTable, _type_from_ddl


class JoinView:
    """Maintainer for ``left LEFT JOIN right`` keyed by the left key."""

    _ID_RE = re.compile(r"^(\d+)\.jv(\d+)_(\d+)$")

    def __init__(
        self,
        view: LakeTable,
        left: LakeTable,
        right: LakeTable,
        fk: str,
        right_cols: list[str] | None = None,
        fk_index=None,
    ):
        self.view = view
        self.left = left
        self.right = right
        self.fk = fk
        rc = right.commit_at(resolve=False)
        if len(rc.key_cols) != 1:
            raise ValueError(
                "right side must be keyed by a single column (n:1 dim join); "
                f"got {rc.key_cols}"
            )
        self.right_key = rc.key_cols[0]
        self.right_cols = right_cols or [
            c for c, _ in rc.schema if c != self.right_key
        ]
        self.fk_index = fk_index

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        root: str,
        left: LakeTable,
        right: LakeTable,
        fk: str,
        right_cols: list[str] | None = None,
        n_buckets: int | None = None,
        fk_index=None,
        overwrite: bool = False,
    ) -> "JoinView":
        lc = left.commit_at(resolve=False)
        rc = right.commit_at(resolve=False)
        ltypes, rtypes = dict(lc.schema), dict(rc.schema)
        if fk not in ltypes:
            raise KeyError(f"fk column {fk!r} not in the left schema")
        rkey = rc.key_cols[0]
        rcols = right_cols or [c for c, _ in rc.schema if c != rkey]
        bad = sorted(set(rcols) & set(ltypes))
        if bad:
            raise ValueError(
                f"right columns {bad} collide with left columns — "
                "pass right_cols with disjoint names"
            )
        fields = [
            T.StructField(c, _type_from_ddl(ltypes[c]), c not in lc.key_cols)
            for c, _ in lc.schema
        ] + [T.StructField(c, _type_from_ddl(rtypes[c]), True) for c in rcols]
        LakeTable.create(
            root,
            T.StructType(fields),
            key_cols=list(lc.key_cols),
            bucket_cols=list(lc.bucket_cols),
            n_buckets=n_buckets or lc.n_buckets,
            overwrite=overwrite,
        )
        return cls(LakeTable(root), left, right, fk, rcols, fk_index=fk_index)

    # ----------------------------------------------------------------- state
    def _cursor(self) -> dict[str, int]:
        """(seq, left version, right version) recovered from the view's own
        applied-batch ledger — the newest refresh id IS the cursor."""
        commit = self.view.commit_at(resolve=False)
        best = (-1, 0, 0)
        for bid in commit.applied_batches:
            m = self._ID_RE.match(bid)
            if m:
                t = (int(m.group(1)), int(m.group(2)), int(m.group(3)))
                if t[0] > best[0]:
                    best = t
        return {"seq": best[0], "left_version": best[1], "right_version": best[2]}

    # --------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> dict[str, Any]:
        """Catch the view up to both tables' current heads — one pass."""
        cur = self._cursor()
        lv = self.left.commit_at(resolve=False).version
        rv = self.right.commit_at(resolve=False).version
        if lv == cur["left_version"] and rv == cur["right_version"]:
            return {"skipped": True, "reason": "view already at both heads"}
        lkeys = list(self.view.commit_at(resolve=False).key_cols)

        # commit-window deltas pinned to the heads (same contract as
        # index.py: a racing merge cannot slip events past the cursor).
        # If either window's history was rewritten under the cursor
        # (compaction/rebucket/expiry), the incremental read raises —
        # recover with a full recompute: touched = every left-head key ∪
        # every current view key (so vanished keys still get deletes).
        left_head = self.left.read(spark, version=lv)
        try:
            dl = (
                self.left.read_changes(
                    spark, since_lsn=-1,
                    since_version=cur["left_version"], version=lv,
                )
                if lv != cur["left_version"]
                else None
            )
            dr = (
                self.right.read_changes(
                    spark, since_lsn=-1,
                    since_version=cur["right_version"], version=rv,
                )
                if rv != cur["right_version"]
                else None
            )
        except ValueError:
            return self._full_recompute(spark, cur, lv, rv, left_head, lkeys)
        # left keys whose view row may have changed:
        touched = None
        if dl is not None:
            touched = dl.select(*lkeys)
        if dr is not None:
            # "_jv_fk" sidesteps name collisions: fk, the right key, and the
            # index column are often all the same name
            dr_keys = dr.select(F.col(self.right_key).alias("_jv_fk")).distinct()
            if self.fk_index is not None:
                # reverse fk lookup through the secondary index: O(index
                # buckets of the changed fks), never a left-table scan.
                # The index may momentarily lag left's head — union the
                # left delta's keys (above) so lag cannot lose recomputes.
                self.fk_index.refresh(spark)
                idx = self.fk_index.table.read(spark)
                ref = (
                    idx.join(
                        dr_keys,
                        on=idx[self.fk_index.col] == dr_keys["_jv_fk"],
                        how="leftsemi",
                    ).select(*lkeys)
                )
            else:
                # fallback: semi-join scan of the left head (document the
                # cost: O(left) scan, pruned only by parquet column stats)
                ref = left_head.join(
                    dr_keys,
                    on=left_head[self.fk] == dr_keys["_jv_fk"],
                    how="leftsemi",
                ).select(*lkeys)
            touched = ref if touched is None else touched.unionByName(ref)
        touched = touched.distinct()
        return self._apply(spark, cur, lv, rv, left_head, lkeys, touched)

    def _full_recompute(self, spark, cur, lv, rv, left_head, lkeys):
        """Recovery path when the incremental window is gone: recompute
        every left-head key; view keys absent from the head get deletes."""
        touched = (
            left_head.select(*lkeys)
            .unionByName(self.view.read(spark).select(*lkeys))
            .distinct()
        )
        out = self._apply(spark, cur, lv, rv, left_head, lkeys, touched)
        out["rebuilt"] = True
        return out

    def _apply(self, spark, cur, lv, rv, left_head, lkeys, touched):
        # total recompute of the affected keys from the pinned heads; the
        # dim read is semi-join-pruned to the fks actually referenced
        lrows = left_head.join(touched, lkeys, "leftsemi")
        fks = lrows.select(F.col(self.fk).alias("_jv_fk")).distinct()
        right_head = self.right.read(spark, version=rv)
        rrows = right_head.join(
            fks, on=right_head[self.right_key] == fks["_jv_fk"], how="leftsemi"
        ).select(F.col(self.right_key).alias("_jv_rk"), *self.right_cols)
        joined = lrows.join(
            rrows, on=lrows[self.fk] == rrows["_jv_rk"], how="left"
        ).drop("_jv_rk")

        seq = cur["seq"] + 1
        ups = joined.select(
            F.lit("U").alias("op"), "*",
            F.lit(seq).cast("long").alias("source_lsn"),
        )
        # touched keys with no left-head row anymore = deleted left rows
        dels = touched.join(lrows.select(*lkeys), lkeys, "leftanti").select(
            F.lit("D").alias("op"), *lkeys,
            F.lit(seq).cast("long").alias("source_lsn"),
        )
        entries = ups.unionByName(dels, allowMissingColumns=True)
        batch_id = f"{seq}.jv{lv}_{rv}"
        metrics = self.view.merge(spark, entries, batch_id)
        metrics["left_version"], metrics["right_version"] = lv, rv
        return metrics
