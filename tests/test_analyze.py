"""ANALYZE TABLE: stats computed over the RECONCILED state (not raw
images), portable min/max rendering, sidecar persistence + staleness."""

import pytest
from pyspark.sql import types as T

from mysql_secure_agent_spark.lake import LakeTable
from mysql_secure_agent_spark.lake.analyze import analyze_table, read_stats

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("txt", T.StringType(), True),
        T.StructField("amt", T.DoubleType(), True),
    ]
)

CL = "op string, k long, txt string, amt double, source_lsn long"


def _mk(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=4)
    rows = [("I", i, None if i % 3 == 0 else f"row {i}", float(i) / 4, 100 + i)
            for i in range(10)]
    # stale duplicate images + a delete: stats must see the reconciled state
    rows += [("U", 1, "updated", 99.5, 200), ("D", 2, None, None, 201)]
    tbl.merge(spark, spark.createDataFrame(rows, CL), "b1")
    return tbl


def test_stats_over_reconciled_state(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    got = {r.col_name: r for r in analyze_table(tbl, spark).collect()}
    # 10 inserts − 1 delete = 9 live rows, every column reports the same
    assert all(got[c].n_rows == 9 for c in ("k", "txt", "amt"))
    assert got["k"].ndv == 9
    assert got["k"].n_nulls == 0
    assert got["k"].min_val == "0" and got["k"].max_val == "9"
    # txt nulls: i % 3 == 0 → 0, 3, 6, 9 = 4 rows, minus none deleted with
    # null txt (2 had 'row 2'); k=1 updated away from 'row 1'
    assert got["txt"].n_nulls == 4
    assert got["amt"].max_val == "99.500000"  # fixed-scale decimal render
    assert got["amt"].min_val == "0.000000"


def test_approx_path_and_no_persist(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    got = {
        r.col_name: r
        for r in analyze_table(
            tbl, spark, columns=["k"], approx=True, persist=False
        ).collect()
    }
    # HLL at 9 values is exact in practice; accept a tight band anyway
    assert abs(got["k"].ndv - 9) <= 1


def test_sidecar_persist_and_read(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    analyze_table(tbl, spark, columns=["k", "amt"])
    doc = read_stats(tbl)
    assert doc["version"] == tbl.current_version()
    assert {c["col_name"] for c in doc["columns"]} == {"k", "amt"}
    # a later analyze at a newer version supersedes
    tbl.merge(
        spark,
        spark.createDataFrame([("I", 100, "x", 1.0, 300)], CL),
        "b2",
    )
    analyze_table(tbl, spark, columns=["k"])
    assert read_stats(tbl)["version"] == tbl.current_version()
    # pinned read still sees the old snapshot's stats
    assert read_stats(tbl, version=doc["version"])["version"] == doc["version"]


def test_unknown_column_raises(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    with pytest.raises(KeyError, match="nope"):
        analyze_table(tbl, spark, columns=["nope"])
