"""Incrementally-maintained join view (lake/join_view.py).

Both delta paths are exercised: left-changefeed keys (insert/update/
delete of fact rows) and right-changefeed fan-out (a dim update
rewriting every referencing view row), plus: initial backfill on first
refresh, refresh idempotence via the ledger, the secondary-index-backed
reverse fk lookup, NULL fks, dim deletes (LEFT-join null-out), and the
full-recompute recovery path after the changefeed window is compacted
away. Ground truth everywhere = the plain join of both final states.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark.lake.index import SecondaryIndex
from mysql_secure_agent_spark.lake.join_view import JoinView
from mysql_secure_agent_spark.lake.table import LakeTable

FACT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)
DIM = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("tier", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path, fk_index=False):
    left = LakeTable.create(
        str(tmp_path / "fact"), FACT, ["conv_id", "turn_idx"], n_buckets=4
    )
    right = LakeTable.create(str(tmp_path / "dim"), DIM, ["user_id"], n_buckets=4)
    idx = (
        SecondaryIndex.create(str(tmp_path / "idx"), left, "user_id")
        if fk_index
        else None
    )
    view = JoinView.create(
        str(tmp_path / "view"), left, right, fk="user_id", fk_index=idx
    )
    return left, right, view


def _facts(spark, rows, lsn0=0):
    return spark.createDataFrame(
        [(op, c, t, u, x, lsn0 + i) for i, (op, c, t, u, x) in enumerate(rows)],
        "op string, conv_id string, turn_idx int, user_id long, text string, "
        "source_lsn long",
    )


def _dims(spark, rows, lsn0=0):
    return spark.createDataFrame(
        [(op, u, n, tr, lsn0 + i) for i, (op, u, n, tr) in enumerate(rows)],
        "op string, user_id long, user_name string, tier string, source_lsn long",
    )


def _expected(spark, left, right):
    l = left.read(spark)
    r = right.read(spark)
    return (
        l.join(r, "user_id", "left")
        .select("conv_id", "turn_idx", "user_id", "text", "user_name", "tier")
    )


def _assert_view_matches(spark, view, left, right):
    got = view.view.read(spark).select(
        "conv_id", "turn_idx", "user_id", "text", "user_name", "tier"
    )
    exp = _expected(spark, left, right)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_backfill_then_both_delta_paths(spark, tmp_path):
    left, right, view = _mk(spark, tmp_path)
    right.merge(spark, _dims(spark, [("U", 1, "ann", "gold"), ("U", 2, "bob", "free")]), "d1")
    left.merge(
        spark,
        _facts(spark, [("U", "c1", 0, 1, "hi"), ("U", "c1", 1, 2, "yo"),
                       ("U", "c2", 0, 1, "hey"), ("U", "c3", 0, None, "anon")]),
        "f1",
    )
    m = view.refresh(spark)
    assert not m.get("skipped")
    _assert_view_matches(spark, view, left, right)
    # NULL fk → view row with null dim columns
    anon = view.view.lookup(spark, {"conv_id": "c3", "turn_idx": 0}).first()
    assert anon.user_name is None

    # left-path delta: update one row, delete another, insert a third
    left.merge(
        spark,
        _facts(spark, [("U", "c1", 0, 2, "hi-edit"), ("D", "c2", 0, None, None),
                       ("U", "c4", 0, 2, "new")], lsn0=100),
        "f2",
    )
    view.refresh(spark)
    _assert_view_matches(spark, view, left, right)

    # right-path delta: dim update fans out to every referencing view row
    right.merge(spark, _dims(spark, [("U", 2, "bob", "gold")], lsn0=100), "d2")
    m = view.refresh(spark)
    _assert_view_matches(spark, view, left, right)
    rows = view.view.read(spark).filter(F.col("user_id") == 2).collect()
    assert rows and all(r.tier == "gold" for r in rows)

    # dim delete → LEFT join nulls, not view-row loss
    right.merge(spark, _dims(spark, [("D", 1, None, None)], lsn0=200), "d3")
    view.refresh(spark)
    _assert_view_matches(spark, view, left, right)
    r = view.view.lookup(spark, {"conv_id": "c1", "turn_idx": 0}).first()
    assert r is not None


def test_refresh_idempotent_and_skip(spark, tmp_path):
    left, right, view = _mk(spark, tmp_path)
    right.merge(spark, _dims(spark, [("U", 1, "ann", "gold")]), "d1")
    left.merge(spark, _facts(spark, [("U", "c1", 0, 1, "hi")]), "f1")
    view.refresh(spark)
    v = view.view.current_version()
    m = view.refresh(spark)
    assert m.get("skipped") and view.view.current_version() == v


def test_index_backed_reverse_lookup(spark, tmp_path):
    left, right, view = _mk(spark, tmp_path, fk_index=True)
    right.merge(spark, _dims(spark, [("U", u, f"u{u}", "free") for u in range(5)]), "d1")
    left.merge(
        spark,
        _facts(spark, [("U", f"c{i}", 0, i % 5, f"t{i}") for i in range(25)]),
        "f1",
    )
    view.refresh(spark)
    _assert_view_matches(spark, view, left, right)
    right.merge(spark, _dims(spark, [("U", 3, "u3", "vip")], lsn0=100), "d2")
    view.refresh(spark)
    _assert_view_matches(spark, view, left, right)
    hit = view.view.read(spark).filter(F.col("user_id") == 3).collect()
    assert hit and all(r.tier == "vip" for r in hit)


def test_full_recompute_after_window_compacted(spark, tmp_path):
    left, right, view = _mk(spark, tmp_path)
    right.merge(spark, _dims(spark, [("U", 1, "ann", "gold")]), "d1")
    left.merge(spark, _facts(spark, [("U", "c1", 0, 1, "a"), ("U", "c2", 0, 1, "b")]), "f1")
    view.refresh(spark)
    # rewrite history under the cursor: merge + delete + compact
    left.merge(spark, _facts(spark, [("D", "c2", 0, None, None)], lsn0=100), "f2")
    left.compact(spark)
    m = view.refresh(spark)
    assert m.get("rebuilt")
    _assert_view_matches(spark, view, left, right)
    assert view.view.lookup(spark, {"conv_id": "c2", "turn_idx": 0}).count() == 0


def test_create_rejects_colliding_columns(spark, tmp_path):
    left = LakeTable.create(str(tmp_path / "l"), FACT, ["conv_id", "turn_idx"])
    dim = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),  # collides
        ]
    )
    right = LakeTable.create(str(tmp_path / "r"), dim, ["user_id"])
    with pytest.raises(ValueError, match="collide"):
        JoinView.create(str(tmp_path / "v"), left, right, fk="user_id")


def test_join_view_over_streaming_pipeline(spark, tmp_path):
    """Composition: the fact table is fed by the real streaming pipeline
    (CdcPipeline over a file feed), the view refreshes after each drain —
    the deployment shape a production enrichment view runs in."""
    import pyspark.sql.types as T2

    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.sources.changelog import FeedSpec, write_feed
    from mysql_secure_agent_spark.streaming import CdcPipeline

    fact = LakeTable.create(
        str(tmp_path / "fact"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    dim_schema = T2.StructType(
        [
            T2.StructField("role", T2.StringType(), False),
            T2.StructField("role_rank", T2.IntegerType(), True),
        ]
    )
    dim = LakeTable.create(str(tmp_path / "dim"), dim_schema, ["role"], n_buckets=2)
    dim.merge(
        spark,
        spark.createDataFrame(
            [("U", r, i, i) for i, r in enumerate(["system", "user", "assistant", "tool"])],
            "op string, role string, role_rank int, source_lsn long",
        ),
        "dim-1",
    )
    view = JoinView.create(str(tmp_path / "view"), fact, dim, fk="role")

    spec = FeedSpec(n_events=3000, n_convs=80, seed=7)
    write_feed(spec, str(tmp_path / "feed"), n_files=4, overwrite=True)
    CdcPipeline(fact, str(tmp_path / "feed")).run_stream(
        spark, str(tmp_path / "ck")
    )
    view.refresh(spark)

    got = view.view.read(spark)
    exp = fact.read(spark).join(dim.read(spark), "role", "left")
    cols = sorted(got.columns)
    a, b = got.select(*cols), exp.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # dim update fans out through the refreshed view
    dim.merge(
        spark,
        spark.createDataFrame(
            [("U", "user", 99, 100)],
            "op string, role string, role_rank int, source_lsn long",
        ),
        "dim-2",
    )
    view.refresh(spark)
    rows = view.view.read(spark).filter(F.col("role") == "user").collect()
    assert rows and all(r.role_rank == 99 for r in rows)
