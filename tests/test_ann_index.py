"""Persisted ANN index over a CDC-maintained embedding table: O(delta)
refresh from the changefeed, band-bucket correctness vs a direct signature
recompute, stale-entry deletion when vectors move/are deleted, rebuild
recovery, and search parity against the per-query LSH plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.lake import LakeTable
from mysql_secure_agent_spark.lake.ann_index import AnnIndex
from mysql_secure_agent_spark.operators.similarity import _plane_matrix

DIM = 8
R = 4  # planes per band
B = 2  # bands

SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("emb", T.ArrayType(T.FloatType()), True),
    ]
)

CL_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("vid", T.LongType(), False),
        T.StructField("emb", T.ArrayType(T.FloatType()), True),
        T.StructField("source_lsn", T.LongType(), False),
    ]
)


def _vec(i: int) -> list[float]:
    """Deterministic unit-ish vector per id (no RNG)."""
    return [float(np.cos(0.7 * i + 0.3 * d) + 0.01 * d) for d in range(DIM)]


def _expected_buckets(v: list[float]) -> set[int]:
    x = np.array([v], dtype=np.float64)
    m = _plane_matrix(B * R, DIM)
    bits = (x @ m) >= 0
    w = 1 << np.arange(R)
    return {
        int(b * (1 << R) + (bits[0, b * R : (b + 1) * R] @ w)) for b in range(B)
    }


def _mk(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["vid"], n_buckets=8)
    idx = AnnIndex.create(
        str(tmp_path / "ix"), tbl, "emb", n_planes=R, bands=B, n_buckets=8
    )
    return tbl, idx


def _batch(spark, rows):
    return spark.createDataFrame(rows, CL_SCHEMA)


def _index_pairs(spark, idx):
    return {(r.band_bucket, r.vid) for r in idx.table.read(spark).collect()}


def _expected_pairs(state: dict[int, list[float]]) -> set[tuple[int, int]]:
    return {
        (b, vid)
        for vid, v in state.items()
        if v is not None
        for b in _expected_buckets(v)
    }


def test_refresh_matches_signature_recompute(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    state = {i: _vec(i) for i in range(20)}
    tbl.merge(
        spark,
        _batch(spark, [("I", i, v, 100 + i) for i, v in state.items()]),
        "b1",
    )
    m = idx.refresh(spark)
    assert not m.get("skipped")
    assert _index_pairs(spark, idx) == _expected_pairs(state)
    # every vector contributes exactly B entries (band ids live in disjoint
    # ranges band*2^r + sig, so the per-vector bucket set can never collapse
    # across bands — a shrunken entry count means entries were LOST)
    assert len(_expected_pairs(state)) == 20 * B
    assert len(_index_pairs(spark, idx)) == 20 * B
    # idle refresh is a cheap skip
    assert idx.refresh(spark)["skipped"] is True


def test_incremental_moves_and_deletes(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    state = {i: _vec(i) for i in range(20)}
    tbl.merge(
        spark,
        _batch(spark, [("I", i, v, 100 + i) for i, v in state.items()]),
        "b1",
    )
    idx.refresh(spark)
    # batch 2: negate some vectors (flips every signature bit → buckets
    # move), delete others, null one, insert a fresh one
    moves = [1, 3, 5]
    dels = [2, 7]
    rows = []
    for i in moves:
        state[i] = [-x for x in state[i]]
        rows.append(("U", i, state[i], 200 + i))
    for i in dels:
        state[i] = None
        rows.append(("D", i, None, 220 + i))
    state[9] = None
    rows.append(("U", 9, None, 230))  # vector nulled: entries must go
    state[50] = _vec(50)
    rows.append(("I", 50, state[50], 240))
    tbl.merge(spark, _batch(spark, rows), "b2")
    m = idx.refresh(spark)
    assert not m.get("skipped") and not m.get("rebuild")
    assert _index_pairs(spark, idx) == _expected_pairs(state)


def test_refresh_idempotent_replay(spark, tmp_path):
    """A crashed-and-retried refresh converges: the cursor rides the batch
    id, so the retry recomputes the SAME delta and the merge dedupes it."""
    tbl, idx = _mk(spark, tmp_path)
    state = {i: _vec(i) for i in range(10)}
    tbl.merge(
        spark, _batch(spark, [("I", i, v, 100 + i) for i, v in state.items()]), "b1"
    )
    idx.refresh(spark)
    tbl.merge(spark, _batch(spark, [("U", 1, [-x for x in state[1]], 200)]), "b2")
    state[1] = [-x for x in state[1]]
    m1 = idx.refresh(spark)
    # simulate the retry of the same window: cursor unchanged → skip
    m2 = idx.refresh(spark)
    assert m2.get("skipped")
    assert _index_pairs(spark, idx) == _expected_pairs(state)
    assert not m1.get("skipped")


def test_rebuild_after_expiry(spark, tmp_path):
    """Cursor snapshot expired → refresh falls back to a full rebuild and
    still converges to the recomputed truth."""
    tbl, idx = _mk(spark, tmp_path)
    state = {i: _vec(i) for i in range(12)}
    tbl.merge(
        spark, _batch(spark, [("I", i, v, 100 + i) for i, v in state.items()]), "b1"
    )
    idx.refresh(spark)
    for step in range(3):
        i = step + 1
        state[i] = [-x for x in state[i]]
        tbl.merge(spark, _batch(spark, [("U", i, state[i], 300 + step)]), f"m{step}")
    tbl.expire_versions(keep_last=1)
    m = idx.refresh(spark)
    assert m.get("rebuild") is True
    assert _index_pairs(spark, idx) == _expected_pairs(state)


def test_search_exact_cosine_and_liveness(spark, tmp_path):
    """search returns exact cosines on CURRENT vectors; deleted keys never
    surface even when their index entries are stale."""
    tbl, idx = _mk(spark, tmp_path)
    state = {i: _vec(i) for i in range(30)}
    tbl.merge(
        spark, _batch(spark, [("I", i, v, 100 + i) for i, v in state.items()]), "b1"
    )
    idx.refresh(spark)
    # delete key 4 WITHOUT refreshing: its entries are stale in the index
    tbl.merge(spark, _batch(spark, [("D", 4, None, 500)]), "b2")
    del state[4]

    queries = spark.createDataFrame(
        [(0, [float(x) for x in _vec(0)])], "query_id long, query_vec array<float>"
    )
    out = idx.search(spark, queries, k=5).collect()
    assert len(out) > 0
    got_ids = [r.vid for r in out]
    assert 4 not in got_ids  # tombstone dropped by the main read
    # parity: expected = exact cosine over corpus rows sharing any band
    # bucket with the query, top-k by (cosine desc, vid asc)
    qb = _expected_buckets(state[0]) if 0 in state else set()
    cands = [
        vid
        for vid, v in state.items()
        if v is not None and _expected_buckets(v) & qb
    ]
    q = np.array(state[0], dtype=np.float64)

    def cos(v):
        a = np.array(v, dtype=np.float64)
        return round(float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q))), 6)

    exp = sorted(((cos(state[v]), v) for v in cands), key=lambda t: (-t[0], t[1]))[:5]
    assert [(r.cosine, r.vid) for r in out] == [(c, v) for c, v in exp]
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


def test_search_empty_probe(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(spark, _batch(spark, [("I", 1, _vec(1), 100)]), "b1")
    idx.refresh(spark)
    queries = spark.createDataFrame([], "query_id long, query_vec array<float>")
    assert idx.search(spark, queries, k=3).count() == 0


def test_create_rejects_non_array_column(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["vid"], n_buckets=8)
    with pytest.raises(ValueError, match="embedding array"):
        AnnIndex.create(str(tmp_path / "ix2"), tbl, "vid")


def test_ann_index_fed_by_live_pipeline(spark, tmp_path):
    """The full A+B path: a binlog-shaped feed carrying a MySQL 9.0 VECTOR
    column streams through CdcPipeline into the lake, and the ANN index
    follows via incremental refresh — entries equal a signature recompute
    over the sequential-replay ground truth after EACH drop."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_secure_agent_spark.functions.mysql_codecs import (
        LONGLONG,
        VECTOR,
        ColumnSpec,
        encode_typed_rows,
    )
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    codec_schema = [ColumnSpec("vid", LONGLONG), ColumnSpec("emb", VECTOR)]
    tbl_schema = T.StructType(
        [
            T.StructField("vid", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType()), True),
        ]
    )

    def write_drop(feed_dir, evs, fname):
        os.makedirs(os.path.join(feed_dir, "data"), exist_ok=True)
        payload = encode_typed_rows(codec_schema, [e[1] for e in evs])
        pdf = pd.DataFrame(
            {
                "op": [e[0] for e in evs],
                "payload": payload,
                "source_lsn": [e[2] for e in evs],
                "binlog_file": "mysql-bin.000001",
                "binlog_pos": [e[2] + 4 for e in evs],
            }
        )
        schema = pa.schema(
            [
                ("op", pa.string()),
                ("payload", pa.binary()),
                ("source_lsn", pa.int64()),
                ("binlog_file", pa.string()),
                ("binlog_pos", pa.int64()),
            ]
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(feed_dir, "data", fname),
        )

    feed = str(tmp_path / "feed")
    tbl = LakeTable.create(str(tmp_path / "t"), tbl_schema, ["vid"], n_buckets=8)
    idx = AnnIndex.create(
        str(tmp_path / "ix"), tbl, "emb", n_planes=R, bands=B, n_buckets=8
    )
    pipe = CdcPipeline(tbl, feed, normalize=False, raw_schema=codec_schema)
    ckpt = str(tmp_path / "ckpt")

    state = {i: _vec(i) for i in range(15)}
    write_drop(
        feed,
        [("I", {"vid": i, "emb": v}, 100 + i) for i, v in state.items()],
        "feed-00000.parquet",
    )
    pipe.run_stream(spark, ckpt)
    idx.refresh(spark)
    assert _index_pairs(spark, idx) == _expected_pairs(state)

    # second drop: moves + a delete, new stream run over the same checkpoint
    state[2] = [-x for x in state[2]]
    state[11] = None
    write_drop(
        feed,
        [
            ("U", {"vid": 2, "emb": state[2]}, 200),
            ("D", {"vid": 11}, 201),
        ],
        "feed-00001.parquet",
    )
    pipe.run_stream(spark, ckpt)
    m = idx.refresh(spark)
    assert not m.get("rebuild") and not m.get("skipped")
    assert _index_pairs(spark, idx) == _expected_pairs(state)
