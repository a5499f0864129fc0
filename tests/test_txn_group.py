"""Cross-table transaction-consistency groups: atomic multi-table publish,
torn-read prevention, crash recovery at every boundary (lake/txn_group.py).

The reference's single-threaded sink is trivially transaction-consistent
(one Updater loop, ``Updater.java:148-186``); these tests prove the
distributed demux restores that contract with two-phase staged publishes.
"""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.lake.txn_group import TransactionGroup
from mysql_secure_agent_spark.schemas import (
    CHANGELOG_SCHEMA,
    PRIMARY_KEY,
    TRANSCRIPT_SCHEMA,
)
from mysql_secure_agent_spark.sources.changelog import FeedSpec, generate_changelog
from mysql_secure_agent_spark.streaming.demux import MultiTablePipeline


def _feeds(seed_a=71, seed_b=73, n=1200):
    cl_a, _ = generate_changelog(FeedSpec(n_events=n, n_convs=40, seed=seed_a))
    cl_b, _ = generate_changelog(FeedSpec(n_events=n, n_convs=40, seed=seed_b))
    return cl_a, cl_b


def _mk_tables(tmp_path):
    return {
        ref: LakeTable.create(
            str(tmp_path / ref.replace(".", "_")),
            TRANSCRIPT_SCHEMA,
            PRIMARY_KEY,
            n_buckets=8,
            overwrite=True,
        )
        for ref in ("main.a", "main.b")
    }


def _spark_cl(spark, pdf):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf, CHANGELOG_SCHEMA)


def _halves(pdf):
    cut = len(pdf) // 2
    return pdf.iloc[:cut], pdf.iloc[cut:]


def _assert_matches_oracle(spark, table, cl_pdf):
    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = oracle.replay(cl_pdf)
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )


def test_atomic_group_happy_path(spark, tmp_path):
    """Two tables, two groups; final states match the oracle, every group
    seals a done marker, and the consistent snapshot equals the live head."""
    cl_a, cl_b = _feeds()
    tables = _mk_tables(tmp_path)
    txg = TransactionGroup(tables, str(tmp_path / "coord"))
    for i, (pa, pb) in enumerate(zip(_halves(cl_a), _halves(cl_b))):
        r = txg.commit_batch(
            spark, {"main.a": _spark_cl(spark, pa), "main.b": _spark_cl(spark, pb)}, i
        )
        assert not r["skipped"] and set(r["versions"]) == {"main.a", "main.b"}
    _assert_matches_oracle(spark, tables["main.a"], cl_a)
    _assert_matches_oracle(spark, tables["main.b"], cl_b)
    vs = txg.consistent_versions()
    for ref, t in tables.items():
        assert vs[ref] == t.current_version()
        # consistent read == live read once sealed
        assert txg.read_consistent(spark, ref).count() == t.read(spark).count()


def test_torn_read_prevented_and_recovered(spark, tmp_path):
    """Crash BETWEEN the two publishes: the raw heads are torn (a advanced,
    b not), but read_consistent still serves the previous sealed snapshot
    for BOTH tables; recover() completes the group (redo) and the snapshot
    advances to the converged state."""
    cl_a, cl_b = _feeds()
    tables = _mk_tables(tmp_path)
    txg = TransactionGroup(tables, str(tmp_path / "coord"))
    a1, a2 = _halves(cl_a)
    b1, b2 = _halves(cl_b)
    txg.commit_batch(spark, {"main.a": _spark_cl(spark, a1), "main.b": _spark_cl(spark, b1)}, 0)
    snap0 = txg.consistent_versions()
    rows0 = {r: txg.read_consistent(spark, r).count() for r in tables}

    real_publish = tables["main.b"].publish_staged
    calls = {"n": 0}

    def crashing_publish(wap_id):
        calls["n"] += 1
        raise RuntimeError("injected crash before table b's publish")

    tables["main.b"].publish_staged = crashing_publish
    with pytest.raises(RuntimeError, match="injected crash"):
        txg.commit_batch(
            spark, {"main.a": _spark_cl(spark, a2), "main.b": _spark_cl(spark, b2)}, 1
        )
    tables["main.b"].publish_staged = real_publish
    assert calls["n"] == 1

    # raw heads ARE torn: a published group 1, b did not
    va = tables["main.a"].current_version()
    vb = tables["main.b"].current_version()
    assert va > snap0["main.a"] and vb == snap0["main.b"]
    # ...but the consistent snapshot is still group 0 for BOTH tables
    assert txg.consistent_versions() == snap0
    for r in tables:
        assert txg.read_consistent(spark, r).count() == rows0[r]

    # recovery = redo: the decided group completes idempotently
    rec = txg.recover()
    assert rec["settled"] == ["000000000001"]
    assert tables["main.b"].current_version() > snap0["main.b"]
    _assert_matches_oracle(spark, tables["main.a"], cl_a)
    _assert_matches_oracle(spark, tables["main.b"], cl_b)
    vs = txg.consistent_versions()
    assert vs["main.a"] == tables["main.a"].current_version()
    assert vs["main.b"] == tables["main.b"].current_version()
    # a replay of the recovered group is a pure skip
    r = txg.commit_batch(
        spark, {"main.a": _spark_cl(spark, a2), "main.b": _spark_cl(spark, b2)}, 1
    )
    assert r["skipped"]


def test_crash_before_decision_aborts_stage(spark, tmp_path):
    """A stage with no intent marker (crash before the decision) is an
    UNDO: recovery reclaims the staged files and the retried group applies
    cleanly from scratch."""
    cl_a, cl_b = _feeds(n=600)
    tables = _mk_tables(tmp_path)
    txg = TransactionGroup(tables, str(tmp_path / "coord"))
    # simulate: table a staged, then crash before the intent marker
    tables["main.a"].merge(
        spark, _spark_cl(spark, cl_a), batch_id="0.main.a", wap_id="txg-000000000000"
    )
    assert tables["main.a"].staged_ids() == ["txg-000000000000"]
    rec = txg.recover()
    assert rec["aborted_files"] > 0 and tables["main.a"].staged_ids() == []
    # the retried group now runs end to end (no FileExistsError on restage)
    r = txg.commit_batch(
        spark, {"main.a": _spark_cl(spark, cl_a), "main.b": _spark_cl(spark, cl_b)}, 0
    )
    assert not r["skipped"]
    _assert_matches_oracle(spark, tables["main.a"], cl_a)
    _assert_matches_oracle(spark, tables["main.b"], cl_b)


def test_nonmember_table_pins_in_snapshot(spark, tmp_path):
    """A group touching only table a still seals a snapshot covering table
    b (pinned at its current version) — read_consistent never KeyErrors on
    a quiet table."""
    cl_a, cl_b = _feeds(n=600)
    tables = _mk_tables(tmp_path)
    txg = TransactionGroup(tables, str(tmp_path / "coord"))
    txg.commit_batch(
        spark, {"main.a": _spark_cl(spark, cl_a), "main.b": _spark_cl(spark, cl_b)}, 0
    )
    vb = tables["main.b"].current_version()
    txg.commit_batch(spark, {"main.a": _spark_cl(spark, cl_a)}, 1)
    vs = txg.consistent_versions()
    assert vs["main.b"] == vb == tables["main.b"].current_version()
    assert txg.read_consistent(spark, "main.b").count() > 0


def test_demux_atomic_stream_end_to_end(spark, tmp_path):
    """MultiTablePipeline(coord_dir=...) over a real multi-batch stream:
    per-table finals match the oracle and every epoch sealed a group."""
    import pyarrow  # noqa: F401  (parquet writer)

    specs = {
        "main.a": FeedSpec(n_events=1500, n_convs=50, seed=81),
        "main.b": FeedSpec(n_events=1200, n_convs=40, seed=83),
    }
    frames = []
    for ref, spec in specs.items():
        cl, _ = generate_changelog(spec)
        cl["table_ref"] = ref
        frames.append(cl)
    feed = pd.concat(frames).sort_values("source_lsn").reset_index(drop=True)
    feed["ts"] = feed["ts"].astype("datetime64[us]")
    data_dir = tmp_path / "feed" / "data"
    os.makedirs(data_dir)
    for i, idx in enumerate(np.array_split(np.arange(len(feed)), 4)):
        feed.iloc[idx].to_parquet(data_dir / f"f{i:04d}.parquet", index=False)

    tables = _mk_tables(tmp_path)
    pipe = MultiTablePipeline(
        tables, str(tmp_path / "feed"), coord_dir=str(tmp_path / "coord")
    )
    pipe.run_stream(spark, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    for ref, spec in specs.items():
        _assert_matches_oracle(spark, tables[ref], generate_changelog(spec)[0])
    done = sorted(
        n for n in os.listdir(tmp_path / "coord" / "groups") if n.endswith(".done.json")
    )
    assert len(done) == 2  # 4 files / maxFilesPerTrigger=2 → 2 epochs
    vs = pipe.txn_group.consistent_versions()
    for ref, t in tables.items():
        assert vs[ref] == t.current_version()
