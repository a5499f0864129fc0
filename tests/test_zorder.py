"""Z-order compaction (lake/zorder.py + compact(zorder_cols=...)).

The Morton sort must (a) interleave bits correctly, (b) leave split base
files tight in EVERY participating dimension — a key scan AND a time
slice both prune files of the same compaction — and (c) change nothing
semantically (reads equal the linear-sort replay).
"""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable, _canon_stat_bound
from mysql_secure_agent_spark.lake.zorder import zvalue


def test_zvalue_bit_interleave(spark):
    # two 2-value axes with known ranks: (lo,lo)<(lo,hi)/(hi,lo)<(hi,hi)
    # and column 0 owns the more significant bit of each pair
    df = spark.createDataFrame(
        [(a, b) for a in (0, 15) for b in (0, 15)], "a bigint, b bigint"
    )
    types = {"a": "bigint", "b": "bigint"}
    bounds = {"a": (0, 15), "b": (0, 15)}
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zvalue(["a", "b"], types, bounds).alias("z")).collect()
    }
    zmax = got[(15, 15)]
    assert got[(0, 0)] == 0
    assert got[(15, 0)] > got[(0, 15)]  # col 0 more significant
    assert got[(15, 0)] + got[(0, 15)] == zmax  # disjoint bit positions
    # ranks are 16-bit: value 15 of a 0..15 axis maps to rank 65535
    assert zmax == sum(1 << i for i in range(32))


def test_zvalue_null_and_degenerate(spark):
    df = spark.createDataFrame([Row(a=None, b=7)], "a bigint, b bigint")
    z = df.select(
        zvalue(["a", "b"], {"a": "bigint", "b": "bigint"},
               {"a": (0, 10), "b": (7, 7)}).alias("z")
    ).first()["z"]
    assert z == 0  # NULL ranks 0; degenerate axis contributes 0
    with pytest.raises(ValueError, match="does not support"):
        zvalue(["s"], {"s": "string"}, {})


def test_zorder_compact_prunes_both_dimensions(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    tbl = LakeTable.create(
        str(tmp_path / "t"), schema, ["k"], n_buckets=1, stats_cols=["ts"]
    )
    # k and ts deliberately UNCORRELATED so a linear sort can serve only
    # one of the two dimensions
    rows = [
        Row(op="I", k=k, v=f"v{k}", ts=dt.datetime(2024, 1, 1 + (k * 7) % 28),
            source_lsn=k + 1)
        for k in range(512)
    ]
    cl = spark.createDataFrame(
        rows, "op string, k long, v string, ts timestamp, source_lsn long"
    )
    tbl.merge(spark, cl, "b0")
    tbl.compact(spark, zorder_cols=["k", "ts"], target_file_rows=64)
    commit = tbl.commit_at()
    entries = [e for es in commit.files.values() for e in es]
    total = len(entries)
    assert total >= 8

    k_pruned = len(tbl.candidate_paths(commit, key_range={"k": (10, 40)}))
    ts_pruned = len(
        tbl.candidate_paths(
            commit,
            key_range={
                "ts": (
                    _canon_stat_bound(dt.datetime(2024, 1, 3)),
                    _canon_stat_bound(dt.datetime(2024, 1, 5)),
                )
            },
        )
    )
    assert k_pruned < total, (k_pruned, total)
    assert ts_pruned < total, (ts_pruned, total)

    # semantics unchanged: both read paths equal the direct computation
    got = {r["k"] for r in tbl.read(spark, key_range={"k": (10, 40)}).collect()}
    assert got == set(range(10, 41))
    sl = {
        r["k"]
        for r in tbl.read_where(
            spark, {"ts": (dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5))}
        ).collect()
    }
    assert sl == {k for k in range(512) if 3 <= 1 + (k * 7) % 28 <= 5}


def test_zorder_validates(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t2"), schema, ["k"], n_buckets=1)
    cl = spark.createDataFrame(
        [Row(op="I", k=1, ts=dt.datetime(2024, 1, 1), source_lsn=1)],
        "op string, k long, ts timestamp, source_lsn long",
    )
    tbl.merge(spark, cl, "b0")
    with pytest.raises(ValueError, match="mutually exclusive"):
        tbl.compact(spark, sort_cols=["k"], zorder_cols=["ts"])
    with pytest.raises(ValueError, match="not in schema"):
        tbl.compact(spark, zorder_cols=["nope"])
