"""Key-range scans with listing-level data skipping.

Sorted compaction splits each bucket into files covering contiguous key
intervals and records per-file key min/max (``key_stats``) in the manifest;
``read(key_range=...)`` prunes files from the LISTING before any footer
opens. Pruning is only sound for KEY columns (every image of a key —
including its tombstone — carries the same key value), which ``read``
enforces.

Invariants under merge-on-read: a pruned scan equals the unpruned scan
filtered; deltas merged AFTER compaction (no key stats) are never pruned,
so later updates and deletes of in-range keys are honored.
"""

import pytest
from pyspark.sql import types as T

from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("score", T.LongType(), True),
    ]
)
CL_DDL = "op string, user_id long, slot int, score long, source_lsn long"


def _mk(spark, tmp_path, n_users=400, n_buckets=4):
    tbl = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, ["user_id", "slot"], n_buckets=n_buckets
    )
    rows = [("I", u, s, u * 100 + s, u * 4 + s + 1) for u in range(n_users) for s in range(4)]
    tbl.merge(spark, spark.createDataFrame(rows, CL_DDL), "seed")
    return tbl


def _state(spark, tbl, **kw):
    return sorted(map(tuple, tbl.read(spark, **kw).collect()))


def test_key_range_equals_filtered_full_read(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.compact(spark, target_file_rows=50)
    lo, hi = 90, 170
    pruned = _state(spark, tbl, key_range={"user_id": (lo, hi)})
    full = [r for r in _state(spark, tbl) if lo <= r[0] <= hi]
    assert pruned == full and len(pruned) == (hi - lo + 1) * 4


def test_key_range_prunes_files_at_listing(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.compact(spark, target_file_rows=50)
    commit = tbl.commit_at()
    # key stats recorded on every compacted file
    entries = [e for es in commit.files.values() for e in es]
    assert entries and all("key_stats" in e for e in entries)
    # each bucket split into several range files
    assert len(entries) > commit.n_buckets
    all_paths = tbl.candidate_paths(commit)
    narrow = tbl.candidate_paths(commit, key_range={"user_id": (100, 110)})
    assert len(narrow) < len(all_paths)
    # open-ended ranges prune too
    tail = tbl.candidate_paths(commit, key_range={"user_id": (350, None)})
    assert len(tail) < len(all_paths)


def test_key_range_sees_post_compaction_update_and_delete(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.compact(spark, target_file_rows=50)
    base_lsn = 400 * 4 + 10
    tbl.merge(
        spark,
        spark.createDataFrame(
            [("U", 100, 0, 999999, base_lsn), ("D", 101, 0, None, base_lsn + 1)],
            CL_DDL,
        ),
        "post-compact",
    )
    got = {
        (r[0], r[1]): r[2]
        for r in tbl.read(spark, key_range={"user_id": (100, 101)}).collect()
    }
    assert got[(100, 0)] == 999999  # update in an un-statted delta survives
    assert (101, 0) not in got  # delete in an un-statted delta masks the base
    assert got[(100, 1)] == 100 * 100 + 1  # untouched row intact


def test_key_range_rejects_non_key_columns(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_users=8)
    with pytest.raises(ValueError, match="not key columns"):
        tbl.read(spark, key_range={"score": (0, 10)})


def test_key_range_on_uncompacted_table_is_correct_not_pruned(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    # merge deltas carry no per-file key stats → nothing pruned, still correct
    pruned = _state(spark, tbl, key_range={"user_id": (10, 20)})
    full = [r for r in _state(spark, tbl) if 10 <= r[0] <= 20]
    assert pruned == full
    commit = tbl.commit_at()
    assert len(tbl.candidate_paths(commit, key_range={"user_id": (10, 20)})) == len(
        tbl.candidate_paths(commit)
    )


def test_key_stats_survive_rebucket(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.rebucket(spark, 16)
    commit = tbl.commit_at()
    entries = [e for es in commit.files.values() for e in es]
    assert entries and all("key_stats" in e for e in entries)
    pruned = _state(spark, tbl, key_range={"user_id": (42, 42)})
    assert pruned == [(42, s, 4200 + s) for s in range(4)]
