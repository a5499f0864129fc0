"""LakeTable.maintain(): one-call housekeeping in dependency order —
dependent refreshes BEFORE compaction (so incremental maintainers drain
the changefeed instead of hitting their rebuild path), then size-policy
compaction, expiry, vacuum. Correctness must be untouched throughout."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from mysql_secure_agent_spark.lake.index import SecondaryIndex
from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("cat", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def _merge(spark, tbl, lsns, tag):
    df = spark.createDataFrame(
        [("U", l % 20, f"c{l % 3}", f"v{l}", l) for l in lsns],
        "op string, id long, cat string, v string, source_lsn long",
    )
    tbl.merge(spark, df, tag)


def test_maintain_order_and_idempotence(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    idx = SecondaryIndex.create(str(tmp_path / "idx"), tbl, "cat")
    for i in range(6):
        _merge(spark, tbl, range(i * 20, (i + 1) * 20), f"b{i}")

    before = tbl.read(spark).orderBy("id").collect()
    m = tbl.maintain(
        spark, maintainers=(idx,), max_deltas=2, keep_last=3
    )
    # the index refresh ran INCREMENTALLY (not the rebuild path), because
    # it went before compaction collapsed the changefeed window
    assert m["maintainers"] and not m["maintainers"][0].get("rebuilt")
    assert m["compaction"].get("compacted_buckets"), m["compaction"]
    assert "vacuumed_files" in m

    # state and index lookups untouched by the whole pass
    after = tbl.read(spark).orderBy("id").collect()
    assert after == before
    # compaction committed a new version AFTER the in-pass refresh, so one
    # catch-up refresh runs (an empty window); the next one skips
    idx.refresh(spark)
    assert idx.refresh(spark).get("skipped")

    # a second maintain on a quiet table is a no-op end to end
    v = tbl.current_version()
    m2 = tbl.maintain(spark, maintainers=(idx,), max_deltas=2, keep_last=3)
    assert m2["compaction"].get("skipped")
    assert m2["maintainers"][0].get("skipped")
    assert tbl.read(spark).orderBy("id").collect() == before


def test_maintain_bounds_history(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    for i in range(10):
        _merge(spark, tbl, range(i * 10, (i + 1) * 10), f"b{i}")
    tbl.maintain(spark, keep_last=3, max_deltas=1)
    assert tbl.version_floor() >= tbl.current_version() - 3


def test_maintain_refreshes_ann_index_before_compaction(spark, tmp_path):
    """AnnIndex satisfies the maintainer protocol: maintain() refreshes it
    WHILE the changefeed window is intact, so it never falls through to the
    full-rebuild recovery path."""
    import numpy as np

    from mysql_secure_agent_spark.lake.ann_index import AnnIndex

    schema = T.StructType(
        [
            T.StructField("vid", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType()), True),
        ]
    )
    cl = "op string, vid long, emb array<float>, source_lsn long"
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["vid"], n_buckets=4)
    idx = AnnIndex.create(
        str(tmp_path / "ix"), tbl, "emb", n_planes=4, bands=2, n_buckets=4
    )

    def vec(i):
        return [float(np.cos(0.7 * i + 0.3 * d)) for d in range(6)]

    tbl.merge(
        spark,
        spark.createDataFrame([("I", i, vec(i), 100 + i) for i in range(8)], cl),
        "b1",
    )
    # max_deltas=1 forces a REAL compaction every cycle — the property
    # under test is that refresh-then-compact stays incremental ACROSS
    # cycles (read_changes skips cursor-consumed compaction bases)
    out = tbl.maintain(spark, maintainers=(idx,), keep_last=8, max_deltas=1)
    assert not out["maintainers"][0].get("skipped")
    assert not out["maintainers"][0].get("rebuild")
    assert not out["compaction"].get("skipped")  # compaction really ran
    # a second merge + maintain stays on the incremental path even though
    # the previous cycle compacted after its refresh
    tbl.merge(
        spark,
        spark.createDataFrame([("U", 1, [-x for x in vec(1)], 200)], cl),
        "b2",
    )
    out2 = tbl.maintain(spark, maintainers=(idx,), keep_last=8, max_deltas=1)
    assert not out2["maintainers"][0].get("skipped")
    assert not out2["maintainers"][0].get("rebuild")
    # and a third cycle, exercising a window that BEGINS at a compacted head
    tbl.merge(
        spark,
        spark.createDataFrame([("D", 3, None, 300)], cl),
        "b3",
    )
    out3 = tbl.maintain(spark, maintainers=(idx,), keep_last=8, max_deltas=1)
    assert not out3["maintainers"][0].get("rebuild")
    assert idx.table.read(spark).count() == 7 * 2  # 8 keys − 1 deleted
