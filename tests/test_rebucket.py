"""Online bucket-count migration (LakeTable.rebucket).

Invariants: one atomic commit re-describes the layout; table state is
byte-identical before/after; point lookups and subsequent merges use the
new bucket count transparently (both resolve it from the commit they read);
the changefeed floor rises like compaction's (history was collapsed).
"""

import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("score", T.LongType(), True),
    ]
)


def _mk(spark, tmp_path, n_buckets=4):
    tbl = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, ["user_id", "slot"], n_buckets=n_buckets
    )
    rows = [
        ("I" if i % 7 else "D", i % 40, i % 3, i * 10, i + 1) for i in range(200)
    ]
    tbl.merge(
        spark,
        spark.createDataFrame(
            rows, "op string, user_id long, slot int, score long, source_lsn long"
        ),
        "seed",
    )
    return tbl


def _state(spark, tbl):
    return sorted(map(tuple, tbl.read(spark).collect()))


@pytest.mark.parametrize("new_n", [16, 2])
def test_rebucket_preserves_state(spark, tmp_path, new_n):
    tbl = _mk(spark, tmp_path)
    before = _state(spark, tbl)
    m = tbl.rebucket(spark, new_n)
    assert m["skipped"] is False and m["to_n_buckets"] == new_n
    c = tbl.commit_at()
    assert c.n_buckets == new_n
    assert _state(spark, tbl) == before
    # every file lives under the new layout's bucket dirs
    assert all(int(b) < new_n for b in c.files)


def test_rebucket_lookup_uses_new_layout(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.rebucket(spark, 16)
    out = tbl.lookup(spark, {"user_id": 8, "slot": 2}).collect()
    assert len(out) == 1 and out[0]["score"] is not None


def test_rebucket_then_merge_continues(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.rebucket(spark, 8)
    tbl.merge(
        spark,
        spark.createDataFrame(
            [("U", 8, 2, 999, 1000), ("I", 777, 0, 1, 1001)],
            "op string, user_id long, slot int, score long, source_lsn long",
        ),
        "post-rebucket",
    )
    got = {
        (r["user_id"], r["slot"]): r["score"] for r in tbl.read(spark).collect()
    }
    assert got[(8, 2)] == 999 and got[(777, 0)] == 1
    assert tbl.lookup(spark, {"user_id": 777, "slot": 0}).count() == 1


def test_rebucket_raises_changefeed_floor(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.rebucket(spark, 8)
    with pytest.raises(ValueError, match="compacted history"):
        tbl.read_changes(spark, since_lsn=0)
    # a post-rebucket merge is still changefeed-visible from the floor
    floor = tbl.commit_at().changefeed_floor
    tbl.merge(
        spark,
        spark.createDataFrame(
            [("U", 1, 1, 5, floor + 1)],
            "op string, user_id long, slot int, score long, source_lsn long",
        ),
        "after",
    )
    changes = tbl.read_changes(spark, since_lsn=floor).collect()
    assert [(r["user_id"], r["slot"], r["op"]) for r in changes] == [(1, 1, "U")]


def test_rebucket_noop_and_validation(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    assert tbl.rebucket(spark, 4)["skipped"] is True
    with pytest.raises(ValueError):
        tbl.rebucket(spark, 0)


def test_rebucket_is_versioned_and_time_travel_reads_old_layout(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v0 = tbl.current_version()
    before = _state(spark, tbl)
    tbl.rebucket(spark, 16)
    assert tbl.current_version() == v0 + 1
    assert sorted(map(tuple, tbl.read(spark, version=v0).collect())) == before
