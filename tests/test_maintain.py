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
