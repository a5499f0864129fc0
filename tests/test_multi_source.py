"""Multi-source (sharded) ingest: N feeds → one table, GtidSet watermark.

The reference tails exactly one server (one BinlogPosition in AgentState,
``state/AgentState.java:14-17``); a sharded fleet needs a per-source
watermark — MySQL's ``gtid_executed``. These tests prove convergence to the
sequential oracle over the union of shard logs, exactly-once across drains,
and new-shard pickup.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_secure_agent_spark import oracle
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
from mysql_secure_agent_spark.sources.changelog import (
    FeedSpec,
    generate_changelog,
    write_feed,
)
from mysql_secure_agent_spark.state import GtidSet
from mysql_secure_agent_spark.streaming.multi_source import LSN_BITS, MultiSourceIngest


def _shard_specs():
    # disjoint key spaces per shard (conv_prefix), independent lsn sequences
    return {
        "shard-a": FeedSpec(n_events=2500, n_convs=60, seed=11, conv_prefix="a"),
        "shard-b": FeedSpec(n_events=1800, n_convs=40, seed=22, conv_prefix="b"),
        "shard-c": FeedSpec(n_events=900, n_convs=25, seed=33, conv_prefix="d"),
    }


def _write_shards(tmp_path, specs):
    feeds = {}
    for s, spec in specs.items():
        d = str(tmp_path / s)
        write_feed(spec, d, n_files=4)
        feeds[s] = d
    return feeds


def _oracle_state(specs):
    """Sequential replay over the union of shard logs with namespaced lsns
    (key spaces disjoint ⇒ cross-shard interleaving is irrelevant)."""
    parts = []
    for i, s in enumerate(sorted(specs)):
        cl, _ = generate_changelog(specs[s])
        cl = cl.copy()
        cl["source_lsn"] = cl["source_lsn"] + (i << LSN_BITS)
        parts.append(cl)
    return oracle.replay(pd.concat(parts, ignore_index=True))


def test_gtidset_roundtrip_and_semantics():
    g = GtidSet()
    g.advance("b", 10)
    g.advance("a", 5)
    g.advance("a", 3)  # no regression
    assert g.sources == {"a": 5, "b": 10}
    assert g.covers("a", 5) and not g.covers("a", 6) and not g.covers("zz", 0)
    s = g.to_string()
    assert s == "a:1-5,b:1-10"
    assert GtidSet.from_string(s).sources == g.sources
    g2 = GtidSet({"a": 7, "c": 1})
    g.merge(g2)
    assert g.sources == {"a": 7, "b": 10, "c": 1}


def test_multi_source_run_once_converges_and_skips(spark, tmp_path):
    specs = _shard_specs()
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    ing = MultiSourceIngest(table, feeds)

    m = ing.run_once(spark, state)
    assert not m.get("skipped")
    # gtid_executed covers every shard's full log
    g = GtidSet.load(state)
    assert g.sources == {s: specs[s].n_events for s in specs}

    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = _oracle_state(specs)[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # second drain: nothing new — metric-level skip, no new commit
    v = table.current_version()
    m2 = ing.run_once(spark, state)
    assert m2["skipped"] and table.current_version() == v


def test_multi_source_crash_between_commit_and_state_is_exactly_once(spark, tmp_path):
    """Crash AFTER the table commit but BEFORE the gtid save: the re-drain
    reads the same window, derives the same batch id, and the commit log
    skips it — state then catches up. Exactly-once effect."""
    specs = {
        "s0": FeedSpec(n_events=1200, n_convs=30, seed=5, conv_prefix="x"),
        "s1": FeedSpec(n_events=800, n_convs=20, seed=6, conv_prefix="y"),
    }
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    ing = MultiSourceIngest(table, feeds)
    ing.run_once(spark, state)
    v = table.current_version()

    # simulate the crash point: roll the state file back (commit survived)
    GtidSet().save(state)
    m = ing.run_once(spark, state)
    assert m.get("skipped") in (None, True) or m["batch_id"].startswith("msrc:")
    assert table.current_version() == v  # no duplicate commit
    assert GtidSet.load(state).sources == {s: specs[s].n_events for s in specs}

    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = _oracle_state(specs)[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_multi_source_new_shard_joins(spark, tmp_path):
    specs = {
        "s0": FeedSpec(n_events=1000, n_convs=25, seed=7, conv_prefix="x"),
    }
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    MultiSourceIngest(table, feeds).run_once(spark, state)

    # a new shard appears; its index extends the fleet and its watermark is
    # empty → full drain of just the new feed
    specs["s1"] = FeedSpec(n_events=700, n_convs=15, seed=8, conv_prefix="y")
    feeds.update(_write_shards(tmp_path, {"s1": specs["s1"]}))
    MultiSourceIngest(table, feeds).run_once(spark, state)

    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = _oracle_state(specs)[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_multi_source_streaming_equals_batch(spark, tmp_path):
    specs = {
        "s0": FeedSpec(n_events=1500, n_convs=40, seed=9, conv_prefix="x"),
        "s1": FeedSpec(n_events=1100, n_convs=30, seed=10, conv_prefix="y"),
    }
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    ing = MultiSourceIngest(table, feeds)
    r = ing.run_streams(spark, str(tmp_path / "ckpt"), state)
    assert r["batches"] >= 2
    assert GtidSet.load(state).sources == {s: specs[s].n_events for s in specs}

    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = _oracle_state(specs)[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # resume over the same checkpoints + state: a no-op (all batches replayed
    # or filtered), table state unchanged
    v = table.current_version()
    ing.run_streams(spark, str(tmp_path / "ckpt"), state)
    assert table.current_version() == v


def test_lsn_namespacing_keeps_per_key_order():
    # two shards, same per-source lsn values: global lsns must not collide
    # and must preserve per-source order
    from pyspark.sql import functions as F  # noqa: F401

    assert (1 << LSN_BITS) > 10**10  # headroom above the target event count
    a = [(0 << LSN_BITS) + x for x in (1, 2, 3)]
    b = [(1 << LSN_BITS) + x for x in (1, 2, 3)]
    assert a == sorted(a) and b == sorted(b)
    assert set(a).isdisjoint(b)


def test_multi_source_concurrent_drain_gtid_integrity(spark, tmp_path):
    """Concurrent per-shard queries (the r4 parallel drain): shards'
    micro-batches interleave commits through the optimistic commit lock.
    Final state must equal the sequential oracle, the GtidSet must cover
    every shard exactly, versions must be contiguous (no lost/duplicated
    pointer swing), and every shard batch id must be applied exactly once."""
    specs = _shard_specs()
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    ing = MultiSourceIngest(table, feeds)
    # mfpt=1 over 4 files/shard -> 4 micro-batches per shard, maximally
    # interleaved across the three concurrent queries
    r = ing.run_streams(
        spark, str(tmp_path / "ckpt"), state, max_files_per_trigger=1
    )
    assert r["batches"] == 12

    g = GtidSet.load(state)
    assert g.sources == {s: specs[s].n_events for s in specs}

    # contiguous version chain, each commit's parent is its predecessor
    head = table.commit_at(resolve=False)
    assert head.version == 12
    versions = []
    c = head
    while c.parent is not None:
        versions.append(c.version)
        c = table.commit_at(version=c.parent, resolve=False)
    assert versions == list(range(12, 0, -1))

    # every shard epoch applied exactly once
    applied = head.applied_batches
    assert len(applied) == 12 and len(set(applied.values())) == 12

    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    exp = _oracle_state(specs)[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_concurrent_merges_serialize_commits(spark, tmp_path):
    """Two driver threads merging DIFFERENT batches at once: the data
    writes overlap, the commit-pointer swings serialize — both batches land
    with distinct versions and the union state is correct."""
    import threading

    from mysql_secure_agent_spark.sources.changelog import generate_changelog

    spec_a = FeedSpec(n_events=800, n_convs=20, seed=41, conv_prefix="p")
    spec_b = FeedSpec(n_events=600, n_convs=15, seed=42, conv_prefix="q")
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    frames = {}
    for name, spec in (("a", spec_a), ("b", spec_b)):
        cl, _ = generate_changelog(spec)
        frames[name] = spark.createDataFrame(cl)

    results, errors = {}, []

    def worker(name):
        try:
            results[name] = table.merge(spark, frames[name], f"batch-{name}")
        except Exception as e:  # pragma: no cover - surfaced by assert below
            errors.append((name, e))

    ts = [threading.Thread(target=worker, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert {results["a"]["version"], results["b"]["version"]} == {1, 2}

    cl_a, _ = generate_changelog(spec_a)
    cl_b, _ = generate_changelog(spec_b)
    import pandas as _pd

    cl_b = cl_b.copy()
    # disjoint key spaces: offset shard-b lsns so the union replay is
    # well-ordered (order across shards is irrelevant for disjoint keys)
    cl_b["source_lsn"] = cl_b["source_lsn"] + (1 << LSN_BITS)
    exp = oracle.replay(_pd.concat([cl_a, cl_b], ignore_index=True))
    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )

    # replaying either batch id skips without a new version
    v = table.current_version()
    assert table.merge(spark, frames["a"], "batch-a")["skipped"]
    assert table.current_version() == v


def test_concurrent_same_batch_merge_preserves_winner_files(spark, tmp_path):
    """Two driver threads merging the SAME batch_id (a replay racing an
    in-flight first attempt): exactly one commits, the loser reports
    skipped — and, critically, the loser's cleanup must not clobber the
    winner's committed files (attempt-unique staging dirs; a shared
    batch-keyed dir would be overwritten and then rmtree'd by the loser)."""
    import threading

    from mysql_secure_agent_spark.sources.changelog import generate_changelog

    spec = FeedSpec(n_events=800, n_convs=20, seed=43, conv_prefix="r")
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    cl, _ = generate_changelog(spec)
    frame = spark.createDataFrame(cl)

    results, errors = {}, []

    def worker(name):
        try:
            results[name] = table.merge(spark, frame, "same-batch")
        except Exception as e:  # pragma: no cover - surfaced by assert below
            errors.append((name, e))

    ts = [threading.Thread(target=worker, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    skips = [r for r in results.values() if r.get("skipped")]
    commits = [r for r in results.values() if not r.get("skipped")]
    assert len(commits) == 1 and len(skips) == 1
    assert table.current_version() == 1

    # every committed file must still exist and be readable end to end
    resolved = table.commit_at()
    for entries in resolved.files.values():
        for e in entries:
            assert os.path.exists(os.path.join(table.root, e["path"])), e["path"]
    exp = oracle.replay(generate_changelog(spec)[0])
    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )
    # the loser's orphaned staging dir (if any) is reclaimable maintenance
    table.vacuum()
    assert table.read(spark).count() == len(got)


def test_new_shard_sorting_earlier_keeps_indices(spark, tmp_path):
    """A shard id that SORTS BEFORE existing ones must get a fresh index,
    not steal index 0 (which would collide its global-lsn namespace with
    already-committed data and make changefeed cursors skip its files)."""
    import json

    specs = {"s1": FeedSpec(n_events=900, n_convs=20, seed=13, conv_prefix="x")}
    feeds = _write_shards(tmp_path, specs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=8
    )
    state = str(tmp_path / "gtid.json")
    MultiSourceIngest(table, feeds).run_once(spark, state)
    cursor = (0 << LSN_BITS) + specs["s1"].n_events  # ceiling after drain 1

    # 'a0' sorts before 's1' — with sorted-order assignment it would take
    # index 0 and emit lsns BELOW the cursor
    specs["a0"] = FeedSpec(n_events=500, n_convs=12, seed=14, conv_prefix="y")
    feeds.update(_write_shards(tmp_path, {"a0": specs["a0"]}))
    ing2 = MultiSourceIngest(table, feeds)
    assert ing2.source_index == {"s1": 0, "a0": 1}
    with open(os.path.join(table.root, "_sources.json")) as f:
        assert json.load(f) == {"s1": 0, "a0": 1}
    ing2.run_once(spark, state)

    # an incremental reader whose cursor predates the new shard SEES it
    delta = table.read_changes(spark, since_lsn=cursor)
    assert delta.filter(F.col("conv_id").startswith("y")).count() > 0

    got = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    # oracle namespacing order differs (first-seen vs sorted) — final state
    # is namespace-independent for disjoint key spaces, so map explicitly
    parts = []
    for i, s in enumerate(["s1", "a0"]):
        cl, _ = generate_changelog(specs[s])
        cl = cl.copy()
        cl["source_lsn"] = cl["source_lsn"] + (i << LSN_BITS)
        parts.append(cl)
    exp = oracle.replay(pd.concat(parts, ignore_index=True))
    pd.testing.assert_frame_equal(
        got, exp[got.columns.tolist()].reset_index(drop=True), check_dtype=False
    )
