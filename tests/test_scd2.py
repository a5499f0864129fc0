"""SCD-2 history operator: interval construction vs a sequential fold."""

from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.operators.scd2 import scd2_as_of, scd2_history

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("source_lsn", T.LongType(), False),
    ]
)

FEED = [
    # key 1: I -> U -> D -> I (re-insert after delete)
    ("I", 1, "a", 10),
    ("U", 1, "b", 20),
    ("D", 1, None, 30),
    ("I", 1, "c", 40),
    # key 2: open interval after one update
    ("I", 2, "x", 15),
    ("U", 2, "y", 25),
    # key 3: delete-first (row predates the feed) then nothing
    ("D", 3, None, 12),
    # key 4: single insert, still current
    ("I", 4, "q", 50),
]


def _history(spark):
    df = spark.createDataFrame(FEED, SCHEMA)
    return scd2_history(df, key_cols=["k"])


def test_intervals_and_currency(spark):
    rows = {
        (r.k, r.valid_from_lsn): (r.v, r.valid_to_lsn, r.is_current)
        for r in _history(spark).collect()
    }
    assert rows == {
        (1, 10): ("a", 20, False),
        (1, 20): ("b", 30, False),  # closed by the DELETE's lsn
        (1, 40): ("c", None, True),  # re-insert is current
        (2, 15): ("x", 25, False),
        (2, 25): ("y", None, True),
        (4, 50): ("q", None, True),
        # key 3 emits nothing: its only event is a delete
    }


def test_current_rows_match_last_image_semantics(spark):
    """is_current rows == the final-state reconcile (last image, no deleted
    keys) — the same contract LakeTable.read satisfies."""
    from mysql_secure_agent_spark.operators.dedup_changelog import last_image_wins

    df = spark.createDataFrame(FEED, SCHEMA)
    cur = {
        (r.k, r.v) for r in _history(spark).filter("is_current").collect()
    }
    last = last_image_wins(df, ["k"]).filter(F.col("op") != "D")
    assert cur == {(r.k, r.v) for r in last.collect()}


def test_as_of_point_in_time(spark):
    h = _history(spark)
    # at lsn 25: key1 = "b" (20..30), key2 = "y" (25..), key3 gone, key4 not yet
    state = {(r.k, r.v) for r in scd2_as_of(h, 25).collect()}
    assert state == {(1, "b"), (2, "y")}
    # at lsn 35: key1 deleted (30 closed "b", re-insert at 40 not yet valid)
    state = {(r.k, r.v) for r in scd2_as_of(h, 35).collect()}
    assert state == {(2, "y")}


def test_single_exchange_plan(spark):
    """History construction must cost exactly one shuffle."""
    plan = _history(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------- incremental sink


def _hist_rows(df):
    return {
        (r.k, r.valid_from_lsn): (r.v, r.valid_to_lsn, r.is_current)
        for r in df.collect()
    }


def test_incremental_history_matches_batch(spark, tmp_path):
    """merge_history over lsn-ordered micro-batches converges to the
    one-shot scd2_history of the whole feed — batch-split invariance is the
    correctness content (cross-batch interval closing, delete closing,
    re-insert after delete)."""
    from mysql_secure_agent_spark.operators.scd2 import (
        create_history_table,
        merge_history,
        read_history,
        scd2_history,
    )

    full = spark.createDataFrame(FEED, SCHEMA)
    src_schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    hist_tbl = create_history_table(
        str(tmp_path / "hist"), src_schema, ["k"], n_buckets=4
    )
    # split so closes cross batches: key1's D lands in batch 2, its
    # re-insert in batch 3; key2's update closes batch-1's open interval.
    for i, (lo, hi) in enumerate([(0, 15), (16, 30), (31, 99)]):
        part = full.filter(
            (F.col("source_lsn") >= lo) & (F.col("source_lsn") <= hi)
        )
        merge_history(spark, hist_tbl, part, f"b{i}")
    got = _hist_rows(read_history(spark, hist_tbl))
    want = _hist_rows(scd2_history(full, key_cols=["k"]))
    assert got == want


def test_incremental_history_idempotent_and_pruned(spark, tmp_path):
    from mysql_secure_agent_spark.operators.scd2 import (
        create_history_table,
        merge_history,
        read_history,
    )

    full = spark.createDataFrame(FEED, SCHEMA)
    src_schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    hist_tbl = create_history_table(
        str(tmp_path / "hist"), src_schema, ["k"], n_buckets=8
    )
    m1 = merge_history(spark, hist_tbl, full, "all")
    # base read pruned to the touched buckets only (4 distinct keys → ≤ 4)
    assert len(m1["history_buckets_pruned_read"]) <= 4
    before = _hist_rows(read_history(spark, hist_tbl))
    m2 = merge_history(spark, hist_tbl, full, "all")  # replay
    assert m2["skipped"] is True
    assert _hist_rows(read_history(spark, hist_tbl)) == before


def test_pipeline_history_sink_end_to_end(spark, tmp_path):
    """CdcPipeline(history_table=...): streamed feed (with a mid-feed ADD
    COLUMN) leaves (a) is_current history rows == the main table's live
    state, (b) the full history == the one-shot scd2_history of the decoded
    changelog."""
    from mysql_secure_agent_spark.lake import LakeTable
    from mysql_secure_agent_spark.operators.scd2 import (
        create_history_table,
        read_history,
        scd2_history,
    )
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA  # noqa: F401
    from mysql_secure_agent_spark.sources.changelog import (
        FeedSpec,
        generate_changelog,
        write_feed,
    )
    from mysql_secure_agent_spark.streaming import CdcPipeline

    spec = FeedSpec(n_events=3000, n_convs=60, seed=17, ddl_add_tool_at_frac=0.5)
    feed = str(tmp_path / "feed")
    write_feed(spec, feed, n_files=4, overwrite=True)
    init = T.StructType(
        [f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"]
    )
    tbl = LakeTable.create(
        str(tmp_path / "tbl"), init, PRIMARY_KEY, n_buckets=8, overwrite=True
    )
    # created WITHOUT `tool`: the pipeline mirrors the mid-feed ADD COLUMN
    # onto the history table (pre-DDL rows project it as NULL on read).
    hist_init = create_history_table(
        str(tmp_path / "hist2"), init, PRIMARY_KEY, n_buckets=8
    )
    pipe = CdcPipeline(
        tbl, feed, normalize=False, history_table=hist_init
    )
    pipe.run_stream(spark, str(tmp_path / "ckpt"))

    hist = read_history(spark, hist_init)
    # (a) current rows == live table state
    live = tbl.read(spark)
    cur = hist.filter("is_current").select(*live.columns)
    assert (
        cur.exceptAll(live).count() == 0 and live.exceptAll(cur).count() == 0
    )
    # (b) whole history == one-shot batch construction over the changelog
    cl, _ddl = generate_changelog(spec)
    full = spark.createDataFrame(
        cl[["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source_lsn"]]
    )
    want = scd2_history(full, key_cols=list(PRIMARY_KEY))
    got = hist.select(*want.columns)
    # pandas inference may type columns differently (int64 vs int) — align
    # the oracle's types to the table's before the set comparison.
    want = want.select(
        *[F.col(f.name).cast(f.dataType) for f in got.schema.fields]
    )
    assert (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    )
