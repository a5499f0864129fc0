"""Secondary index over a non-key column: O(delta) maintenance from the
changefeed, bucket-pruned lookups, stale-entry deletion, crash-retry
convergence."""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake import LakeTable
from mysql_secure_agent_spark.lake.index import SecondaryIndex

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("color", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

CL_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("k", T.LongType(), False),
        T.StructField("color", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("source_lsn", T.LongType(), False),
    ]
)

BATCH1 = [
    ("I", 1, "red", 10, 100),
    ("I", 2, "blue", 20, 101),
    ("I", 3, "red", 30, 102),
    ("I", 4, None, 40, 103),  # NULL values are not indexed
]

BATCH2 = [
    ("U", 1, "blue", 11, 200),  # red -> blue: stale red entry must go
    ("D", 3, None, None, 201),  # deleted key: its red entry must go
    ("I", 5, "red", 50, 202),  # new red key
    ("U", 2, "blue", 21, 203),  # same value: entry survives untouched
]


def _mk(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=8)
    idx = SecondaryIndex.create(str(tmp_path / "ix"), tbl, "color", n_buckets=8)
    return tbl, idx


def _index_pairs(spark, idx):
    return {
        (r.color, r.k) for r in idx.table.read(spark).collect()
    }


def test_refresh_and_lookup(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, spark.createDataFrame(BATCH1, CL_SCHEMA), "b1")
    m = idx.refresh(spark)
    assert not m.get("skipped")
    assert _index_pairs(spark, idx) == {("red", 1), ("blue", 2), ("red", 3)}
    rows = {(r.k, r.color, r.n) for r in idx.lookup(spark, "red").collect()}
    assert rows == {(1, "red", 10), (3, "red", 30)}
    # a second refresh with nothing new is a cheap skip
    assert idx.refresh(spark)["skipped"] is True


def test_stale_entries_deleted_on_value_change(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, spark.createDataFrame(BATCH1, CL_SCHEMA), "b1")
    idx.refresh(spark)
    tbl.merge(spark, spark.createDataFrame(BATCH2, CL_SCHEMA), "b2")
    idx.refresh(spark)
    assert _index_pairs(spark, idx) == {
        ("blue", 1),
        ("blue", 2),
        ("red", 5),
    }
    # lookups agree with a brute-force filter of the reconciled state
    for v in ("red", "blue"):
        got = {(r.k, r.color, r.n) for r in idx.lookup(spark, v).collect()}
        want = {
            (r.k, r.color, r.n)
            for r in tbl.read(spark).filter(F.col("color") == v).collect()
        }
        assert got == want, v


def test_cursor_is_atomic_with_merge_and_survives_reopen(spark, tmp_path):
    """The refresh cursor travels in the applied-batch ledger, committed
    atomically with the entries — a process crash/restart (reopen from
    disk) resumes from exactly the committed cursor, and there is no sidecar
    state whose loss could desync it."""
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, spark.createDataFrame(BATCH1, CL_SCHEMA), "b1")
    idx.refresh(spark)
    # the only sidecar content is the column name — no cursor to lose
    meta = json.load(open(os.path.join(idx.root, SecondaryIndex.META)))
    assert meta == {"col": "color"}
    # "restart": a fresh object recovers the cursor from the ledger
    idx2 = SecondaryIndex(idx.root, tbl)
    assert idx2._cursor()["cursor_lsn"] == 103
    tbl.merge(spark, spark.createDataFrame(BATCH2, CL_SCHEMA), "b2")
    idx2.refresh(spark)
    assert _index_pairs(spark, idx2) == {
        ("blue", 1),
        ("blue", 2),
        ("red", 5),
    }
    assert idx2._cursor()["cursor_lsn"] == 203


def test_lookup_guards(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, spark.createDataFrame(BATCH1, CL_SCHEMA), "b1")
    idx.refresh(spark)
    with pytest.raises(ValueError, match="matched more than"):
        idx.lookup(spark, "red", max_keys=1)
    assert idx.lookup(spark, "green").count() == 0  # absent value -> empty
    with pytest.raises(ValueError, match="key column"):
        SecondaryIndex.create(str(tmp_path / "bad"), tbl, "k")
    with pytest.raises(KeyError):
        SecondaryIndex.create(str(tmp_path / "bad2"), tbl, "nope")


def test_refresh_prunes_buckets(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, spark.createDataFrame(BATCH1, CL_SCHEMA), "b1")
    idx.refresh(spark)
    # touch ONE key; the time-travel read must prune to its bucket only
    one = [("U", 1, "green", 12, 300)]
    tbl.merge(spark, spark.createDataFrame(one, CL_SCHEMA), "b3")
    m = idx.refresh(spark)
    assert len(m["index_buckets_pruned_read"]) == 1
    assert _index_pairs(spark, idx) == {("green", 1), ("blue", 2), ("red", 3)}


def _cl(spark, rows):
    return spark.createDataFrame(rows, CL_SCHEMA)


def test_refresh_rebuilds_after_cursor_expiry(spark, tmp_path):
    """expire_versions can outrun the index cursor; refresh must fall back
    to a full rebuild (stale entries deleted, new state indexed) instead of
    wedging on the expired time-travel read."""
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, _cl(spark, BATCH1), "b1")
    idx.refresh(spark)
    tbl.merge(spark, _cl(spark, BATCH2), "b2")
    tbl.merge(spark, _cl(spark, [("U", 5, "green", 51, 300)]), "b3")
    tbl.expire_versions(keep_last=1)  # cursor's snapshot is gone

    m = idx.refresh(spark)
    assert m.get("rebuild") is True
    assert _index_pairs(spark, idx) == {
        ("blue", 1),
        ("blue", 2),
        ("green", 5),
    }
    # and the rebuilt cursor works incrementally again afterwards
    tbl.merge(spark, _cl(spark, [("U", 1, "red", 12, 400)]), "b4")
    m2 = idx.refresh(spark)
    assert not m2.get("rebuild")
    assert ("red", 1) in _index_pairs(spark, idx)
    assert ("blue", 1) not in _index_pairs(spark, idx)


def test_fresh_index_on_expired_table_backfills(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=8)
    tbl.merge(spark, _cl(spark, BATCH1), "b1")
    tbl.merge(spark, _cl(spark, BATCH2), "b2")
    tbl.expire_versions(keep_last=1)
    idx = SecondaryIndex.create(str(tmp_path / "ix"), tbl, "color", n_buckets=8)
    m = idx.refresh(spark)
    assert m.get("rebuild") is True
    assert _index_pairs(spark, idx) == {("blue", 1), ("blue", 2), ("red", 5)}


def test_multi_shard_namespaced_lsn_cursor_sound(spark, tmp_path):
    """A scalar lsn cursor would drop every lower-shard event after one
    higher-shard lsn had been seen; the commit-window cursor must not.
    Shard 1 uses namespaced lsns around 2^44, shard 0 uses tiny lsns."""
    HI = 1 << 44
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(
        spark,
        _cl(spark, [("I", 101, "red", 1, HI + 1), ("I", 102, "blue", 2, HI + 2)]),
        "s1-b1",
    )
    idx.refresh(spark)  # cursor has seen lsns ≈ 2^44
    # now shard 0 commits with SMALL lsns — below any scalar cursor
    tbl.merge(
        spark,
        _cl(spark, [("I", 1, "green", 3, 5), ("I", 2, "red", 4, 6)]),
        "s0-b1",
    )
    m = idx.refresh(spark)
    assert not m.get("skipped")
    pairs = _index_pairs(spark, idx)
    assert ("green", 1) in pairs and ("red", 2) in pairs  # shard-0 indexed
    # and a shard-0 value move is also seen (stale deletion across shards)
    tbl.merge(spark, _cl(spark, [("U", 1, "blue", 5, 7)]), "s0-b2")
    idx.refresh(spark)
    pairs = _index_pairs(spark, idx)
    assert ("blue", 1) in pairs and ("green", 1) not in pairs


def test_range_lookup(spark, tmp_path):
    """Range probe over the index: matches the filtered main state, prunes
    the index read after sorted compaction, and a stale entry (value moved
    out of range after the last refresh) is filtered by the main re-check."""
    from pyspark.sql import Row, functions as F, types as T

    from mysql_secure_agent_spark.lake.index import SecondaryIndex
    from mysql_secure_agent_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "m"), schema, ["k"], n_buckets=4)
    cl = spark.createDataFrame(
        [Row(op="I", k=k, v=k * 10, s=f"s{k}", source_lsn=k + 1) for k in range(40)],
        "op string, k long, v long, s string, source_lsn long",
    )
    tbl.merge(spark, cl, "b0")
    idx = SecondaryIndex.create(str(tmp_path / "i"), tbl, "v", n_buckets=4)
    idx.refresh(spark)
    got = {r["k"] for r in idx.range_lookup(spark, 100, 200).collect()}
    assert got == {k for k in range(40) if 100 <= k * 10 <= 200}
    # open sides
    assert {r["k"] for r in idx.range_lookup(spark, lo=350).collect()} == {35, 36, 37, 38, 39}
    with pytest.raises(ValueError, match="at least one bound"):
        idx.range_lookup(spark)

    # compaction sorts the index on (v, k): a narrow range must open fewer
    # index files than the table holds
    idx.table.compact(spark, target_file_rows=8)
    commit = idx.table.commit_at()
    total = sum(len(es) for es in commit.files.values())
    pruned = len(idx.table.candidate_paths(commit, key_range={"v": (100, 120)}))
    assert 0 < pruned < total, (pruned, total)
    got = {r["k"] for r in idx.range_lookup(spark, 100, 120).collect()}
    assert got == {10, 11, 12}

    # stale entry: k=12 moves out of range after the refresh — the main
    # re-filter drops it until the next refresh; k=5 moves INTO range but
    # is invisible until refreshed (documented freshness contract)
    tbl.merge(
        spark,
        spark.createDataFrame(
            [Row(op="U", k=12, v=999, s="moved", source_lsn=100),
             Row(op="U", k=5, v=110, s="entered", source_lsn=101)],
            "op string, k long, v long, s string, source_lsn long",
        ),
        "b1",
    )
    got = {r["k"] for r in idx.range_lookup(spark, 100, 120).collect()}
    assert got == {10, 11}
    idx.refresh(spark)
    got = {r["k"] for r in idx.range_lookup(spark, 100, 120).collect()}
    assert got == {5, 10, 11}
