"""Driver-side Murmur3 parity + LakeTable point lookup."""

import random
import string

import pytest
from pyspark.sql import Row, functions as F

from mysql_secure_agent_spark.lake.bucketing import (
    bucket_for,
    hash_bytes,
    spark_hash_typed,
)
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sources.changelog import FeedSpec, write_feed
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline


def test_murmur3_parity_with_spark_hash(spark):
    """The pure-Python Murmur3 must equal F.hash for every key shape the
    table uses: strings (all byte lengths incl. multi-byte UTF-8 tails),
    ints, longs, and chained (string, int) composites."""
    rnd = random.Random(1234)
    strs = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcde",
        "c00000042",
        "naïve—utf8✓",
        "日本語テキスト",
    ] + ["".join(rnd.choices(string.printable, k=rnd.randint(0, 40))) for _ in range(60)]
    ints = [0, 1, -1, 42, -2147483648, 2147483647] + [
        rnd.randint(-(1 << 31), (1 << 31) - 1) for _ in range(40)
    ]
    longs = [0, 1, -1, (1 << 40), -(1 << 40), (1 << 62)] + [
        rnd.randint(-(1 << 62), 1 << 62) for _ in range(40)
    ]

    df = spark.createDataFrame(
        [Row(s=s, i=i, l=l) for s, i, l in zip(strs, ints * 3, longs * 3)],
        schema="s string, i int, l long",
    )
    got = df.select(
        F.hash("s").alias("hs"),
        F.hash("i").alias("hi"),
        F.hash("l").alias("hl"),
        F.hash("s", "i").alias("hsi"),
    ).collect()
    for row, s, i, l in zip(got, strs, ints * 3, longs * 3):
        assert row["hs"] == spark_hash_typed([s], ["string"]), repr(s)
        assert row["hi"] == spark_hash_typed([i], ["int"]), i
        assert row["hl"] == spark_hash_typed([l], ["bigint"]), l
        assert row["hsi"] == spark_hash_typed([s, i], ["string", "int"]), (s, i)


def test_murmur3_null_passthrough(spark):
    row = spark.createDataFrame(
        [Row(s=None, i=7)], schema="s string, i int"
    ).select(F.hash("s", "i")).collect()[0][0]
    assert row == spark_hash_typed([None, 7], ["string", "int"])


def test_spark_hash_bytes_tail_is_signed():
    # multi-byte UTF-8 puts bytes >= 0x80 in the unaligned tail — the signed
    # byte semantics is where a naive port diverges
    assert hash_bytes("é".encode("utf-8"), 42) != hash_bytes(b"\x43\xa9", 42)


def test_lookup_equals_filtered_read(spark, tmp_path):
    spec = FeedSpec(n_events=4000, n_convs=80, seed=77)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=4)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=16
    )
    CdcPipeline(table, feed).run_backfill(spark)

    full = table.read(spark).toPandas()
    some = full.sample(5, random_state=3)
    for _, r in some.iterrows():
        key = {"conv_id": r["conv_id"], "turn_idx": int(r["turn_idx"])}
        got = table.lookup(spark, key).toPandas()
        assert len(got) == 1
        assert got.iloc[0]["text"] == r["text"]

    # a missing key returns empty, not an error
    assert table.lookup(spark, {"conv_id": "zzz", "turn_idx": 0}).count() == 0

    # prefix keys (bucket cols only satisfied when bucketing on full key)
    with pytest.raises(KeyError):
        table.lookup(spark, {"conv_id": some.iloc[0]["conv_id"]})


def test_lookup_after_sorted_compaction(spark, tmp_path):
    spec = FeedSpec(n_events=3000, n_convs=50, seed=78)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=6)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    CdcPipeline(table, feed).run_stream(spark, str(tmp_path / "ckpt"))
    before = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    r = table.compact(spark)  # sort_within_buckets default ON
    assert not r["skipped"]
    after = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    k = before.iloc[17]
    got = table.lookup(
        spark, {"conv_id": k["conv_id"], "turn_idx": int(k["turn_idx"])}
    ).toPandas()
    assert len(got) == 1 and got.iloc[0]["text"] == k["text"]


def test_bucket_for_matches_table_bucketing(spark, tmp_path):
    """bucket_for must agree with the table's _bucket_expr for real keys —
    otherwise lookup reads the wrong bucket and silently returns empty."""
    spec = FeedSpec(n_events=1500, n_convs=40, seed=79)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=2)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=16
    )
    CdcPipeline(table, feed).run_backfill(spark)
    commit = table.commit_at(resolve=False)
    rows = (
        table.read(spark)
        .select(*commit.bucket_cols)
        .withColumn(
            "b", F.pmod(F.hash(*commit.bucket_cols), F.lit(commit.n_buckets))
        )
        .distinct()
        .collect()
    )
    types = dict(commit.schema)
    for r in rows:
        vals = [r[c] for c in commit.bucket_cols]
        assert (
            bucket_for(vals, [types[c] for c in commit.bucket_cols], commit.n_buckets)
            == r["b"]
        )
