"""Incremental aggregate-view maintenance (dirty-group partial recompute).

Invariant under test: after any sequence of (merge, refresh) steps, the
aggregate table equals the same aggregation computed from scratch over the
base table's current state — including groups that vanished (tombstoned),
appeared, or changed only via deletes.
"""

import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.operators.incremental_agg import refresh_aggregate

BASE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("score", T.LongType(), True),
    ]
)
AGG_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.LongType(), True),
        T.StructField("hi", T.LongType(), True),
    ]
)
def _aggs():
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum("score").alias("total"),
        F.max("score").alias("hi"),  # NOT self-maintainable — needs recompute
    ]


def _mk(tmp_path, name):
    base = LakeTable.create(
        str(tmp_path / f"{name}_base"), BASE_SCHEMA, ["user_id", "slot"], n_buckets=4
    )
    agg = LakeTable.create(
        str(tmp_path / f"{name}_agg"), AGG_SCHEMA, ["user_id"], n_buckets=4
    )
    return base, agg


def _cl(spark, rows):
    return spark.createDataFrame(
        rows, "op string, user_id long, slot int, score long, source_lsn long"
    )


def _direct(spark, base):
    return {
        r["user_id"]: (r["n"], r["total"], r["hi"])
        for r in base.read(spark).groupBy("user_id").agg(*_aggs()).collect()
    }


def _view(spark, agg):
    return {
        r["user_id"]: (r["n"], r["total"], r["hi"])
        for r in agg.read(spark).collect()
    }


def test_refresh_tracks_inserts_updates_deletes(spark, tmp_path):
    base, agg = _mk(tmp_path, "a")
    b0 = _cl(
        spark,
        [
            ("I", 1, 0, 10, 1),
            ("I", 1, 1, 20, 2),
            ("I", 2, 0, 5, 3),
        ],
    )
    base.merge(spark, b0, "b0")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 3, "r0")
    assert _view(spark, agg) == _direct(spark, base) == {1: (2, 30, 20), 2: (1, 5, 5)}

    # update lowers user 1's max (recompute-only case), delete kills user 2
    b1 = _cl(spark, [("U", 1, 1, 1, 4), ("D", 2, 0, None, 5)])
    base.merge(spark, b1, "b1")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 3, 5, "r1")
    assert _view(spark, agg) == _direct(spark, base) == {1: (2, 11, 10)}


def test_refresh_untouched_groups_not_rewritten(spark, tmp_path):
    """The refresh merge only carries DIRTY groups — O(delta), not O(view)."""
    base, agg = _mk(tmp_path, "b")
    base.merge(
        spark, _cl(spark, [("I", u, 0, u, u + 1) for u in range(10)]), "b0"
    )
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 11, "r0")
    base.merge(spark, _cl(spark, [("U", 3, 0, 99, 12)]), "b1")
    m = refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 11, 12, "r1")
    assert m["rows_in"] == 1  # only user 3 re-aggregated and merged
    assert _view(spark, agg) == _direct(spark, base)


def test_refresh_idempotent_batch_id(spark, tmp_path):
    base, agg = _mk(tmp_path, "c")
    base.merge(spark, _cl(spark, [("I", 1, 0, 10, 1)]), "b0")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 1, "r0")
    assert (
        refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 1, "r0")["skipped"]
        is True
    )


def test_group_resurrection_after_tombstone(spark, tmp_path):
    base, agg = _mk(tmp_path, "d")
    base.merge(spark, _cl(spark, [("I", 7, 0, 1, 1)]), "b0")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 1, "r0")
    base.merge(spark, _cl(spark, [("D", 7, 0, None, 2)]), "b1")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 1, 2, "r1")
    assert _view(spark, agg) == {}
    base.merge(spark, _cl(spark, [("I", 7, 3, 42, 3)]), "b2")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 2, 3, "r2")
    assert _view(spark, agg) == {7: (1, 42, 42)}


def test_refresh_nonkey_group_requires_prev_version(spark, tmp_path):
    base, _ = _mk(tmp_path, "nk0")
    agg = LakeTable.create(
        str(tmp_path / "nk0_v"),
        T.StructType(
            [
                T.StructField("score", T.LongType(), False),
                T.StructField("n", T.LongType(), True),
            ]
        ),
        ["score"],
        n_buckets=4,
    )
    base.merge(spark, _cl(spark, [("I", 1, 0, 10, 1)]), "b0")
    with pytest.raises(ValueError, match="prev_version"):
        refresh_aggregate(
            spark, base, agg, ["score"], [F.count(F.lit(1)).alias("n")], 0, 1, "r0"
        )


def test_refresh_nonkey_group_move_and_delete(spark, tmp_path):
    """A row's group value moves 10→99 and a 20-group row is deleted: both
    OLD groups must be recomputed/tombstoned, which only works because the
    refresher reads the changed keys' previous images at prev_version (the
    changefeed alone names only the NEW groups)."""
    base, _ = _mk(tmp_path, "nk1")
    agg = LakeTable.create(
        str(tmp_path / "nk1_v"),
        T.StructType(
            [
                T.StructField("score", T.LongType(), False),
                T.StructField("n", T.LongType(), True),
            ]
        ),
        ["score"],
        n_buckets=4,
    )
    naggs = [F.count(F.lit(1)).alias("n")]
    v_start = base.current_version()
    base.merge(
        spark,
        _cl(spark, [("I", 1, 0, 10, 1), ("I", 1, 1, 10, 2), ("I", 2, 0, 20, 3)]),
        "b0",
    )
    v0 = base.current_version()
    refresh_aggregate(
        spark, base, agg, ["score"], naggs, 0, 3, "r0", prev_version=v_start
    )
    assert {r["score"]: r["n"] for r in agg.read(spark).collect()} == {10: 2, 20: 1}

    base.merge(
        spark, _cl(spark, [("U", 1, 0, 99, 4), ("D", 2, 0, None, 5)]), "b1"
    )
    refresh_aggregate(
        spark, base, agg, ["score"], naggs, 3, 5, "r1", prev_version=v0
    )
    got = {r["score"]: r["n"] for r in agg.read(spark).collect()}
    direct = {
        r["score"]: r["n"]
        for r in base.read(spark).groupBy("score").agg(*naggs).collect()
    }
    assert got == direct == {10: 1, 99: 1}  # 20 tombstoned, 10 decremented


def test_refresh_bucket_pruned_when_group_is_bucket(spark, tmp_path):
    """bucket_cols ⊆ group_cols ⇒ the base re-read is pruned to the dirty
    groups' buckets at the listing level."""
    base = LakeTable.create(
        str(tmp_path / "bp_base"),
        BASE_SCHEMA,
        ["user_id", "slot"],
        n_buckets=8,
        bucket_cols=["user_id"],
    )
    agg = LakeTable.create(
        str(tmp_path / "bp_agg"), AGG_SCHEMA, ["user_id"], n_buckets=4
    )
    rows = [("I", u, s, u * 10 + s, u * 4 + s + 1) for u in range(1, 9) for s in range(3)]
    base.merge(spark, _cl(spark, rows), "b0")
    refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 0, 100, "r0")
    # touch one user only
    base.merge(spark, _cl(spark, [("U", 3, 0, 999, 200)]), "b1")
    m = refresh_aggregate(spark, base, agg, ["user_id"], _aggs(), 100, 200, "r1")
    pruned = m["incremental_refresh"]["base_buckets_pruned_read"]
    assert len(pruned) == 1  # one dirty user → one bucket read
    assert _view(spark, agg) == _direct(spark, base)
