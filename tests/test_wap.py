"""Write-audit-publish (WAP): staged merges, audits, publish/abort.

The Iceberg ``wap.id`` workflow (stage a snapshot invisibly, audit it,
cherry-pick or drop it) re-expressed over this commit log. The reference
agent has no audit gate — it applies every decoded event directly
(Updater.java:148-186); WAP is the lake-side contract a production ingest
adds so a poisoned batch never becomes readable state.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)
CL = "op string, id long, v string, n long, source_lsn long"


def _batch(spark, rows):
    return spark.createDataFrame(rows, CL)


def _mk(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    rows = [("I", i, f"base{i}", i * 10, i + 1) for i in range(20)]
    tbl.merge(spark, _batch(spark, rows), "b0")
    return tbl


def _state(spark, tbl):
    return sorted(
        (r["id"], r["v"], r["n"]) for r in tbl.read(spark).collect()
    )


def test_stage_is_invisible_until_publish(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    before = _state(spark, tbl)
    v_before = tbl.current_version()
    m = tbl.merge(
        spark,
        _batch(spark, [("U", 3, "staged", 333, 100), ("D", 4, None, None, 101)]),
        "b1",
        wap_id="audit-1",
    )
    assert m["staged"] and m["wap_id"] == "audit-1"
    # readers see nothing; the staged state sees parent + delta
    assert _state(spark, tbl) == before
    assert tbl.current_version() == v_before
    staged = sorted(
        (r["id"], r["v"], r["n"])
        for r in tbl.read_staged(spark, "audit-1").collect()
    )
    assert (3, "staged", 333) in staged
    assert all(i != 4 for i, _, _ in staged)
    assert tbl.staged_ids() == ["audit-1"]

    out = tbl.publish_staged("audit-1")
    assert not out["skipped"] and out["version"] == v_before + 1
    assert _state(spark, tbl) == staged
    assert tbl.staged_ids() == []


def test_publish_equals_direct_merge(spark, tmp_path):
    rows = [("U", i % 7, f"x{i}", i, 1000 + i) for i in range(50)]
    a = _mk(spark, tmp_path / "a")
    a.merge(spark, _batch(spark, rows), "b1")
    b = _mk(spark, tmp_path / "b")
    b.merge(spark, _batch(spark, rows), "b1", wap_id="w")
    b.publish_staged("w")
    assert _state(spark, a) == _state(spark, b)


def test_audit_counts_violations_null_is_violation(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.merge(
        spark,
        _batch(
            spark,
            [
                ("U", 1, "ok", 5, 200),
                ("U", 2, None, -1, 201),  # null v AND negative n
                ("U", 5, "neg", -7, 202),
            ],
        ),
        "b1",
        wap_id="w",
    )
    audit = tbl.audit_staged(
        spark, "w", {"v_not_null": "v IS NOT NULL", "n_nonneg": "n >= 0"}
    )
    assert audit["rows"] == 20
    assert audit["violations"] == {"v_not_null": 1, "n_nonneg": 2}
    assert not audit["passed"]
    # clean batch passes
    tbl.abort_staged("w")
    tbl.merge(spark, _batch(spark, [("U", 1, "ok", 5, 300)]), "b2", wap_id="w2")
    assert tbl.audit_staged(spark, "w2", {"v_not_null": "v IS NOT NULL"})[
        "passed"
    ]


def test_abort_reclaims_files_and_leaves_state(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    before = _state(spark, tbl)
    tbl.merge(
        spark, _batch(spark, [("U", 1, "bad", None, 400)]), "b1", wap_id="w"
    )
    removed = tbl.abort_staged("w")
    assert removed > 0
    assert _state(spark, tbl) == before
    assert tbl.staged_ids() == []
    # the batch can be re-staged (or merged directly) after the abort —
    # its id was never registered
    m = tbl.merge(spark, _batch(spark, [("U", 1, "good", 1, 401)]), "b1")
    assert not m.get("skipped")


def test_vacuum_never_sweeps_staged_data(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.merge(
        spark, _batch(spark, [("U", 9, "pending", 9, 500)]), "b1", wap_id="w"
    )
    assert tbl.vacuum() == 0  # staged delta is live, not an orphan
    staged = tbl.read_staged(spark, "w")
    assert staged.filter("id = 9 AND v = 'pending'").count() == 1
    tbl.publish_staged("w")
    assert tbl.read(spark).filter("v = 'pending'").count() == 1


def test_publish_rebases_onto_later_head(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.merge(
        spark, _batch(spark, [("U", 1, "staged1", 11, 600)]), "b1", wap_id="w"
    )
    # an independent merge lands while the audit runs
    tbl.merge(spark, _batch(spark, [("U", 2, "direct2", 22, 601)]), "b2")
    out = tbl.publish_staged("w")
    assert not out["skipped"]
    st = dict((i, (v, n)) for i, v, n in _state(spark, tbl))
    assert st[1] == ("staged1", 11) and st[2] == ("direct2", 22)


def test_publish_exactly_once_and_replay_skip(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    rows = [("U", 1, "once", 1, 700)]
    tbl.merge(spark, _batch(spark, rows), "b1", wap_id="w")
    tbl.publish_staged("w")
    v = tbl.current_version()
    # replaying the same batch: direct merge skips ...
    assert tbl.merge(spark, _batch(spark, rows), "b1")["skipped"]
    # ... a re-stage of the same batch_id skips at stage time ...
    assert tbl.merge(spark, _batch(spark, rows), "b1", wap_id="w2")["skipped"]
    # ... and a stale staged copy publishes as a skip with file reclaim
    tbl.merge(spark, _batch(spark, rows), "b1x", wap_id="w3")
    tbl.merge(spark, _batch(spark, rows), "b1x")  # direct merge wins the race
    out = tbl.publish_staged("w3")
    assert out["skipped"]
    assert tbl.staged_ids() == []
    assert tbl.current_version() == v + 1  # b1x once + nothing from skips


def test_duplicate_wap_id_refused(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.merge(spark, _batch(spark, [("U", 1, "a", 1, 800)]), "b1", wap_id="w")
    with pytest.raises(FileExistsError):
        tbl.merge(
            spark, _batch(spark, [("U", 2, "b", 2, 801)]), "b2", wap_id="w"
        )
    tbl.abort_staged("w")


def test_publish_refused_after_layout_change(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.merge(spark, _batch(spark, [("U", 1, "a", 1, 900)]), "b1", wap_id="w")
    tbl.rebucket(spark, 8)
    with pytest.raises(ValueError, match="layout/schema changed"):
        tbl.publish_staged("w")
    tbl.abort_staged("w")
    assert tbl.staged_ids() == []
