"""Drift verification (operators/validate.py + LakeTable.verify_against).

pt-table-checksum semantics: chunked order-insensitive checksums localize
drift to chunks; the row-level drill touches only drifted chunks. The
checksum math must be deterministic and permutation-invariant, and the
end-to-end flow must (a) pass on a faithfully replicated lake and (b)
pinpoint exactly the corrupted/missing/extra keys after tampering.
"""

import pytest
from pyspark.sql import Row, functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.operators.validate import (
    checksum_chunks,
    diff_chunks,
    diff_keys,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, n=n) for k, v, n in rows], "k long, v string, n long"
    )


BASE = [(i, f"v{i}", i * 10) for i in range(50)]


def test_checksum_permutation_invariant(spark):
    a = checksum_chunks(_df(spark, BASE), ["k"], n_chunks=8).collect()
    b = checksum_chunks(_df(spark, list(reversed(BASE))).repartition(7), ["k"], n_chunks=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["n_rows"] for r in a) == len(BASE)


def test_null_vs_empty_string_distinct(spark):
    a = _df(spark, [(1, None, 0)])
    b = _df(spark, [(1, "", 0)])
    d = diff_chunks(
        checksum_chunks(a, ["k"], n_chunks=4), checksum_chunks(b, ["k"], n_chunks=4)
    ).collect()
    assert len(d) == 1  # NULL must not hash like ''


def test_clean_tables_no_drift(spark):
    d = diff_chunks(
        checksum_chunks(_df(spark, BASE), ["k"], n_chunks=8),
        checksum_chunks(_df(spark, BASE), ["k"], n_chunks=8),
    ).collect()
    assert d == []


def test_diff_localizes_all_three_statuses(spark):
    left = BASE
    right = [(k, ("TAMPERED" if k == 7 else v), n) for k, v, n in BASE if k != 13]
    right.append((999, "extra", 0))
    lc = checksum_chunks(_df(spark, left), ["k"], n_chunks=16)
    rc = checksum_chunks(_df(spark, right), ["k"], n_chunks=16)
    chunks = [r["chunk"] for r in diff_chunks(lc, rc).collect()]
    assert chunks
    got = {
        r["k"]: r["status"]
        for r in diff_keys(
            _df(spark, left), _df(spark, right), ["k"], chunks, n_chunks=16
        ).collect()
    }
    assert got == {7: "changed", 13: "only_in_left", 999: "only_in_right"}


def test_diff_keys_requires_chunks(spark):
    with pytest.raises(ValueError):
        diff_keys(_df(spark, BASE), _df(spark, BASE), ["k"], [])


@pytest.fixture()
def lake(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["k"], n_buckets=4)
    cl = spark.createDataFrame(
        [Row(op="I", k=k, v=v, n=n, source_lsn=k + 1) for k, v, n in BASE],
        "op string, k long, v string, n long, source_lsn long",
    )
    tbl.merge(spark, cl, "b0")
    # one update and one delete so the reconciled state ≠ raw inserts
    tbl.merge(
        spark,
        spark.createDataFrame(
            [Row(op="U", k=3, v="v3b", n=31, source_lsn=100),
             Row(op="D", k=4, v=None, n=None, source_lsn=101)],
            "op string, k long, v string, n long, source_lsn long",
        ),
        "b1",
    )
    return tbl


def _expected(spark):
    rows = [(k, v, n) for k, v, n in BASE if k != 4]
    rows = [((3, "v3b", 31) if r[0] == 3 else r) for r in rows]
    return _df(spark, rows)


def test_verify_against_clean(spark, lake):
    out = lake.verify_against(spark, _expected(spark))
    assert out["match"] and out["diff"] is None


def test_verify_against_detects_and_localizes(spark, lake):
    tampered = _expected(spark).withColumn(
        "v", F.when(F.col("k") == 10, F.lit("oops")).otherwise(F.col("v"))
    ).filter(F.col("k") != 20)
    out = lake.verify_against(spark, tampered)
    assert not out["match"] and out["drifted_chunks"]
    got = {r["k"]: r["status"] for r in out["diff"].collect()}
    # lake is LEFT: tampered source lost key 20 and changed key 10
    assert got == {10: "changed", 20: "only_in_left"}


def test_verify_against_missing_key_col(spark, lake):
    with pytest.raises(ValueError, match="key columns"):
        lake.verify_against(spark, _df(spark, BASE).drop("k"))


def test_binary_columns_hash_by_bytes(spark):
    """Distinct binary payloads that both decode to U+FFFD under a lossy
    utf-8 cast must still checksum differently (hex rendering)."""
    a = spark.createDataFrame([(1, bytes([0xFE, 0xFF]))], "k long, b binary")
    b = spark.createDataFrame([(1, bytes([0xFF, 0xFE]))], "k long, b binary")
    d = diff_chunks(
        checksum_chunks(a, ["k"], n_chunks=4), checksum_chunks(b, ["k"], n_chunks=4)
    ).collect()
    assert len(d) == 1


# ------------------------------------------------------------ repair_from
def test_repair_from_converges_all_drift_classes(spark, tmp_path):
    """Extra row -> delete, missing row -> insert, changed row -> source
    image; one merge, then the re-checksum reads clean."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("x", T.DoubleType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["k"], n_buckets=4)
    good = spark.createDataFrame(
        [("I", i, f"v{i}", float(i), i) for i in range(30)],
        "op string, k long, v string, x double, source_lsn long",
    )
    tbl.merge(spark, good, "g")
    # drift: tamper k=3, delete k=7, add spurious k=99
    drift = spark.createDataFrame(
        [("U", 3, "TAMPERED", 3.0, 100), ("D", 7, None, None, 101),
         ("I", 99, "ghost", 0.0, 102)],
        "op string, k long, v string, x double, source_lsn long",
    )
    tbl.merge(spark, drift, "d")
    source = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(30)], "k long, v string, x double"
    )
    rep = tbl.repair_from(spark, source)
    assert not rep["match"] and rep["repaired"] == 3
    assert rep["repaired_match"]
    got = {(r["k"], r["v"], r["x"]) for r in tbl.read(spark).collect()}
    assert got == {(i, f"v{i}", float(i)) for i in range(30)}


def test_repair_from_clean_is_noop(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["k"], n_buckets=2)
    tbl.merge(
        spark,
        spark.createDataFrame([("I", 1, "a", 1)], "op string, k long, v string, source_lsn long"),
        "g",
    )
    v = tbl.current_version()
    rep = tbl.repair_from(spark, spark.createDataFrame([(1, "a")], "k long, v string"))
    assert rep["match"] and rep["repaired"] == 0
    assert tbl.current_version() == v  # no commit happened


def test_repair_from_refuses_partial_source(spark, tmp_path):
    import pyspark.sql.types as T
    import pytest

    schema = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["k"], n_buckets=2)
    with pytest.raises(ValueError, match="lacks table columns"):
        tbl.repair_from(spark, spark.createDataFrame([(1,)], "k long"))
