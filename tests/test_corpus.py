"""Corpus-hygiene operators: decontamination, shuffle/shard, repetition."""

from pyspark.sql import functions as F

from mysql_secure_agent_spark.operators.corpus import (
    decontaminate,
    repetition_stats,
    shuffle_shard,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- decontaminate
def test_decontaminate_planted_overlap(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps")])
    tr = _docs(
        spark,
        [
            (1, "the quick brown fox ran away"),  # shares 2 trigrams
            (2, "completely different words entirely here now"),
            (3, "too short"),  # < 3 tokens → no shingles → clean
        ],
    )
    out = {r["id"]: r.asDict() for r in decontaminate(tr, ev, n=3).collect()}
    assert out[1]["overlap_shingles"] == 2  # "the quick brown", "quick brown fox"
    assert out[1]["contaminated"] is True
    assert out[2]["overlap_shingles"] == 0 and out[2]["contaminated"] is False
    assert out[3]["total_shingles"] == 0 and out[3]["contaminated"] is False
    assert out[3]["overlap_frac"] == 0.0


def test_decontaminate_threshold_mode(spark):
    ev = _docs(spark, [(100, "a b c")])
    # doc 1: 10 trigrams, 1 overlapping → frac 0.1
    tr = _docs(spark, [(1, "a b c d e f g h i j k l")])
    hit = decontaminate(tr, ev, n=3, threshold=0.2).collect()[0]
    assert hit["overlap_shingles"] == 1 and hit["contaminated"] is False
    hit = decontaminate(tr, ev, n=3, threshold=0.05).collect()[0]
    assert hit["contaminated"] is True


def test_decontaminate_counts_distinct_shingles_once(spark):
    # repeated shingle inside one doc counts once (shingles are distinct'd)
    ev = _docs(spark, [(100, "x y z")])
    tr = _docs(spark, [(1, "x y z x y z")])
    row = decontaminate(tr, ev, n=3).collect()[0]
    # distinct trigrams of "x y z x y z": x y z / y z x / z x y → 3 total
    assert row["total_shingles"] == 3
    assert row["overlap_shingles"] == 1


# -------------------------------------------------------------- shuffle_shard
def test_shuffle_shard_deterministic_and_bounded(spark):
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = shuffle_shard(docs, n_shards=8, seed=17).collect()
    b = shuffle_shard(docs, n_shards=8, seed=17).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    shards = {r["shard"] for r in a}
    assert shards <= set(range(8))
    assert len(shards) == 8  # 200 rows over 8 shards: all populated w.h.p.
    # different seed ⇒ different permutation
    c = {r["doc_id"]: r["sort_key"] for r in shuffle_shard(docs, seed=18).collect()}
    amap = {r["doc_id"]: r["sort_key"] for r in a}
    assert any(amap[k] != c[k] for k in amap)


def test_shuffle_shard_materialize_clusters_and_sorts(spark):
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = shuffle_shard(docs, n_shards=4, seed=7, materialize=True)
    assert out.rdd.getNumPartitions() == 4

    def _check(pidx, it):
        rows = list(it)
        keys = [(r["shard"], r["sort_key"]) for r in rows]
        return iter([(pidx, keys == sorted(keys), {r["shard"] for r in rows})])

    parts = out.rdd.mapPartitionsWithIndex(_check).collect()
    assert all(ok for _, ok, _ in parts)  # in-partition (shard, key) order
    seen: dict[int, int] = {}
    for pidx, _, shards in parts:  # each shard wholly inside one partition
        for s in shards:
            assert seen.setdefault(s, pidx) == pidx


# ----------------------------------------------------------- repetition_stats
def test_repetition_stats_values(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a a"),          # all same token; bigram "a a" ×3
            (2, "a b c d"),          # no repetition
            (3, "one"),              # single token: no bigrams
            (4, "x y x y x"),        # bigrams: "x y"×2, "y x"×2 → top 2/4
        ],
    )
    out = {r["id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert out[1]["dup_token_frac"] == 0.75 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["top_bigram_frac"] == 0.333333
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["n_tokens"] == 1
    assert out[4]["dup_token_frac"] == 0.6 and out[4]["top_bigram_frac"] == 0.5


# --------------------------------------------------------------- chunking
def test_chunk_documents_windows_and_overlap(spark):
    from mysql_secure_agent_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x"),               # 1 token -> one short chunk
            (3, "   "),             # blank -> no chunks
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, chunk_tokens=4, stride=2).collect()
    }
    # doc 1: starts 0,2,4,6
    assert [got[(1, i)]["chunk_text"] for i in range(4)] == [
        "a b c d", "c d e f", "e f g", "g",
    ]
    assert got[(1, 0)]["chunk_start"] == 0 and got[(1, 3)]["chunk_start"] == 6
    assert got[(1, 2)]["n_tokens"] == 3
    assert got[(2, 0)]["chunk_text"] == "x"
    assert not any(d == 3 for d, _ in got)


def test_chunk_documents_rejects_bad_params(spark):
    import pytest
    from mysql_secure_agent_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_chunk_documents_plan_zero_exchange_no_python(spark):
    """Chunking is embarrassingly parallel: zero shuffles, zero Python —
    the scan partitioning carries straight through the explode."""
    from mysql_secure_agent_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_tokens=2, stride=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
