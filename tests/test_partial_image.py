"""binlog_row_image=MINIMAL end-to-end: wire bitmaps → presence masks →
partial-image fold → merge with base fallback.

The reference assumes FULL row images (RowParser.java parses one shared
included-columns bitmap; Updater.java:148-186 replaces whole rows), so
MINIMAL support is engine-beyond-reference surface: semantics are checked
against a brute-force sequential apply (the reference's single-threaded
event loop, extended with per-column patching).
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from mysql_secure_agent_spark.operators.partial_image import (
    fold_partial_images,
    resolve_against_base,
)
from mysql_secure_agent_spark.sources.binlog_packets import (
    EXT_DELETE_ROWS,
    EXT_UPDATE_ROWS,
    EXT_WRITE_ROWS,
    TABLE_MAP_EVENT,
    packets_to_changelog,
    parse_event_body,
)


# ------------------------------------------------------ wire-level MINIMAL
def _tmap() -> bytes:
    # table 9: cols = LONG id, VARCHAR(20) name, LONG score
    body = (9).to_bytes(6, "little") + b"\x00\x00"
    body += bytes([1]) + b"s\x00"
    body += bytes([1]) + b"t\x00"
    body += bytes([3])
    body += bytes([0x03, 0x0F, 0x03])
    body += bytes([2])  # metadata block length
    body += (20).to_bytes(2, "little")  # VARCHAR max len
    body += bytes([0x07])  # nullability (unused)
    return body


def _img(included: list[int], values: dict[int, object]) -> bytes:
    """One row image over `included` column indexes; values[col] may be None
    (explicit NULL → null-bitmap bit) or absent columns simply not listed."""
    nulls = 0
    for pos, col in enumerate(included):
        if values.get(col) is None:
            nulls |= 1 << pos
    out = bytes([nulls])
    for col in included:
        v = values.get(col)
        if v is None:
            continue
        if col in (0, 2):  # LONG
            out += int(v).to_bytes(4, "little", signed=True)
        else:  # VARCHAR
            b = str(v).encode()
            out += bytes([len(b)]) + b
    return out


def _bitmap(included: list[int]) -> bytes:
    b = 0
    for c in included:
        b |= 1 << c
    return bytes([b])


def _update_body(old_inc, old_vals, new_inc, new_vals) -> bytes:
    body = (9).to_bytes(6, "little") + b"\x00\x00"
    body += (2).to_bytes(2, "little")
    body += bytes([3])
    body += _bitmap(old_inc) + _bitmap(new_inc)
    body += _img(old_inc, old_vals) + _img(new_inc, new_vals)
    return body


def _single_body(kind_inc, vals) -> bytes:
    body = (9).to_bytes(6, "little") + b"\x00\x00"
    body += (2).to_bytes(2, "little")
    body += bytes([3])
    body += _bitmap(kind_inc)
    body += _img(kind_inc, vals)
    return body


def test_minimal_update_uses_per_image_bitmaps():
    """MINIMAL UPDATE: before-image = PK only, after-image = PK + changed
    column; each must be parsed with its own bitmap or the cursor desyncs."""
    maps = {}
    parse_event_body(_tmap(), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(
        _update_body([0], {0: 1}, [0, 2], {0: 1, 2: 99}), EXT_UPDATE_ROWS, maps
    )
    assert ev.included_columns_old == [0]
    assert ev.included_columns == [0, 2]
    assert ev.old_rows == [[1]]
    assert ev.new_rows == [[1, 99]]


def test_minimal_update_explicit_null_in_after_image():
    maps = {}
    parse_event_body(_tmap(), TABLE_MAP_EVENT, maps)
    ev = parse_event_body(
        _update_body([0], {0: 5}, [0, 1], {0: 5, 1: None}), EXT_UPDATE_ROWS, maps
    )
    assert ev.new_rows == [[5, None]]


def test_packets_to_changelog_emits_presence():
    packets = [
        (TABLE_MAP_EVENT, _tmap()),
        (EXT_WRITE_ROWS, _single_body([0, 1, 2], {0: 1, 1: "a", 2: 10})),
        (EXT_UPDATE_ROWS, _update_body([0], {0: 1}, [0, 2], {0: 1, 2: 20})),
        (EXT_DELETE_ROWS, _single_body([0], {0: 1})),
    ]
    df = packets_to_changelog(packets, "s", "t", ["id", "name", "score"],
                              emit_presence=True)
    assert list(df["_present"]) == [["id", "name", "score"], ["id", "score"], ["id"]]
    assert df.loc[1, "name"] is None or pd.isna(df.loc[1, "name"])
    assert df.loc[1, "score"] == 20


def test_packets_to_changelog_pk_from_before_image():
    """TRUE MySQL MINIMAL contract: the UPDATE's after-image carries ONLY the
    SET columns — the PK travels in the before-image. The emitter must merge
    unchanged before-image columns in, or every such update emits a NULL key
    and the keyed merge collapses them onto garbage keys."""
    packets = [
        (TABLE_MAP_EVENT, _tmap()),
        (EXT_WRITE_ROWS, _single_body([0, 1, 2], {0: 7, 1: "a", 2: 10})),
        # UPDATE t SET score=33 WHERE id=7 → before={id}, after={score} ONLY
        (EXT_UPDATE_ROWS, _update_body([0], {0: 7}, [2], {2: 33})),
    ]
    df = packets_to_changelog(
        packets, "s", "t", ["id", "name", "score"], emit_presence=True
    )
    u = df.iloc[1]
    assert u["op"] == "U" and u["id"] == 7 and u["score"] == 33
    assert pd.isna(u["name"])
    assert list(u["_present"]) == ["id", "score"]
    # a PK change: both images present, after-image key wins
    packets2 = [
        (TABLE_MAP_EVENT, _tmap()),
        (EXT_UPDATE_ROWS, _update_body([0], {0: 7}, [0, 2], {0: 8, 2: 1})),
    ]
    df2 = packets_to_changelog(packets2, "s", "t", ["id", "name", "score"],
                               emit_presence=True)
    assert df2.iloc[0]["id"] == 8


# ------------------------------------------------------------ fold semantics
SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("source_lsn", T.LongType()),
        T.StructField("_present", T.ArrayType(T.StringType())),
    ]
)


def _fold(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["id"]: r.asDict()
        for r in fold_partial_images(df, ["id"], ["name", "score"]).collect()
    }


def test_fold_last_present_per_column(spark):
    out = _fold(
        spark,
        [
            ("I", 1, "a", 10, 1, ["name", "score"]),
            ("U", 1, None, 20, 2, ["score"]),   # name absent, not nulled
            ("U", 1, "b", None, 3, ["name"]),   # score absent, keeps 20
        ],
    )
    r = out[1]
    assert r["op"] == "U"
    assert (r["name"], r["name_set"]) == ("b", True)
    assert (r["score"], r["score_set"]) == (20, True)
    assert r["_base_applies"] is True and r["source_lsn"] == 3


def test_fold_present_null_overwrites(spark):
    out = _fold(
        spark,
        [
            ("I", 1, "a", 10, 1, ["name", "score"]),
            ("U", 1, None, None, 2, ["name"]),  # explicit NULL name
        ],
    )
    r = out[1]
    assert r["name"] is None and r["name_set"] is True
    assert r["score"] == 10 and r["score_set"] is True


def test_fold_delete_voids_prior_images(spark):
    out = _fold(
        spark,
        [
            ("I", 1, "a", 10, 1, ["name", "score"]),
            ("D", 1, None, None, 2, []),
            ("I", 1, None, 30, 3, ["score"]),  # re-created: name resets, no base
        ],
    )
    r = out[1]
    assert r["op"] == "U"
    assert r["name_set"] is False and r["_base_applies"] is False
    assert (r["score"], r["score_set"]) == (30, True)


def test_fold_final_delete(spark):
    out = _fold(
        spark,
        [
            ("U", 1, "x", None, 5, ["name"]),
            ("D", 1, None, None, 6, []),
        ],
    )
    assert out[1]["op"] == "D"


def test_resolve_against_base(spark):
    batch = spark.createDataFrame(
        [
            ("U", 1, None, 50, 10, ["score"]),          # name from base
            ("U", 2, None, None, 11, ["name"]),          # explicit NULL name
            ("U", 3, None, 7, 12, ["score"]),            # no base row at all
        ],
        SCHEMA,
    )
    folded = fold_partial_images(batch, ["id"], ["name", "score"])
    base = spark.createDataFrame(
        [(1, "base1", 1), (2, "base2", 2)], "id long, name string, score long"
    )
    out = {
        r["id"]: r.asDict()
        for r in resolve_against_base(folded, base, ["id"], ["name", "score"]).collect()
    }
    assert (out[1]["name"], out[1]["score"]) == ("base1", 50)
    assert out[2]["name"] is None and out[2]["score"] == 2
    assert out[3]["name"] is None and out[3]["score"] == 7


# ------------------------------------------------- merge_partial end-to-end
def _brute_apply(events):
    """The reference's single-threaded loop, extended per-column: apply each
    partial image in lsn order against a dict state."""
    state: dict[int, dict] = {}
    for op, key, patch, present in events:
        if op == "D":
            state.pop(key, None)
            continue
        row = state.get(key, {"name": None, "score": None})
        if key not in state:
            row = {"name": None, "score": None}
        for c in present:
            row[c] = patch[c]
        state[key] = row
    return state


def _feed(n=400, keys=23):
    """Deterministic partial-image feed: inserts full, updates partial
    (rotating presence, including explicit NULLs), periodic deletes."""
    events = []
    for lsn in range(1, n + 1):
        key = (lsn * 7) % keys
        m = lsn % 10
        if m == 0:
            events.append(("D", key, {}, []))
        elif m in (1, 2):
            events.append(
                ("I", key, {"name": f"n{lsn}", "score": lsn}, ["name", "score"])
            )
        elif m in (3, 4, 5):
            events.append(("U", key, {"score": lsn * 2}, ["score"]))
        elif m in (6, 7):
            events.append(("U", key, {"name": f"u{lsn}"}, ["name"]))
        else:
            events.append(("U", key, {"name": None}, ["name"]))  # explicit NULL
    return events


def _to_rows(events, lsn0=0):
    rows = []
    for i, (op, key, patch, present) in enumerate(events):
        rows.append(
            (
                op,
                key,
                patch.get("name"),
                patch.get("score"),
                lsn0 + i + 1,
                list(present),
            )
        )
    return rows


@pytest.mark.parametrize("n_batches", [1, 3])
def test_merge_partial_matches_sequential_apply(spark, tmp_path, n_batches):
    from mysql_secure_agent_spark.lake.table import LakeTable

    events = _feed()
    rows = _to_rows(events)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.LongType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["id"], n_buckets=4)
    step = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * step : (b + 1) * step]
        m = tbl.merge_partial(
            spark, spark.createDataFrame(chunk, SCHEMA), f"pb-{b}"
        )
        assert m.get("partial_image") is True

    got = {
        r["id"]: (r["name"], r["score"]) for r in tbl.read(spark).collect()
    }
    want = {k: (v["name"], v["score"]) for k, v in _brute_apply(events).items()}
    assert got == want


def test_merge_partial_batch_split_invariance(spark, tmp_path):
    """1-batch and 3-batch replays of the same feed land identical state —
    the base-fallback makes the fold associative across micro-batches."""
    from mysql_secure_agent_spark.lake.table import LakeTable

    rows = _to_rows(_feed(n=200))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.LongType(), True),
        ]
    )
    states = []
    for n_batches, name in [(1, "a"), (3, "b")]:
        tbl = LakeTable.create(str(tmp_path / name), schema, ["id"], n_buckets=4)
        step = (len(rows) + n_batches - 1) // n_batches
        for b in range(n_batches):
            tbl.merge_partial(
                spark,
                spark.createDataFrame(rows[b * step : (b + 1) * step], SCHEMA),
                f"x-{b}",
            )
        states.append(sorted(map(tuple, tbl.read(spark).collect())))
    assert states[0] == states[1]


def test_merge_partial_idempotent_replay(spark, tmp_path):
    from mysql_secure_agent_spark.lake.table import LakeTable

    rows = _to_rows(_feed(n=50))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.LongType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["id"], n_buckets=4)
    df = spark.createDataFrame(rows, SCHEMA)
    tbl.merge_partial(spark, df, "same-batch")
    before = sorted(map(tuple, tbl.read(spark).collect()))
    assert tbl.merge_partial(spark, df, "same-batch")["skipped"] is True
    assert sorted(map(tuple, tbl.read(spark).collect())) == before


def test_pipeline_minimal_stream_equals_sequential_apply(spark, tmp_path):
    """End-to-end streaming MINIMAL mode: a transcript-shaped partial feed
    drained through CdcPipeline(row_image='minimal') in 3 in-order
    micro-batches lands the same state as a sequential per-event patch
    apply."""
    import os
    import pandas as pd
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    cols = ["role", "text", "tool"]
    events = []
    for lsn in range(1, 241):
        key = (f"c{(lsn * 5) % 11}", lsn % 4)
        m = lsn % 8
        if m == 0:
            events.append(("D", key, {}, []))
        elif m in (1, 2):
            events.append(
                ("I", key, {"role": "user", "text": f"t{lsn}", "tool": None},
                 ["role", "text", "tool"])
            )
        elif m in (3, 4):
            events.append(("U", key, {"text": f"edit{lsn}"}, ["text"]))
        elif m == 5:
            events.append(("U", key, {"tool": f"bash{lsn}"}, ["tool"]))
        else:
            events.append(("U", key, {"tool": None}, ["tool"]))  # explicit NULL

    feed_dir = tmp_path / "feed"
    (feed_dir / "data").mkdir(parents=True)
    per_file = 80
    for fi in range(3):
        chunk = events[fi * per_file : (fi + 1) * per_file]
        recs = []
        for i, (op, (cid, tix), patch, present) in enumerate(chunk):
            recs.append(
                {
                    "op": op,
                    "conv_id": cid,
                    "turn_idx": tix,
                    "role": patch.get("role"),
                    "text": patch.get("text"),
                    "tool": patch.get("tool"),
                    "ts": None,
                    "source_lsn": fi * per_file + i + 1,
                    "binlog_file": "bin.000001",
                    "binlog_pos": fi * per_file + i + 1,
                    "_present": list(present),
                }
            )
        p = str(feed_dir / "data" / f"part-{fi:03d}.parquet")
        pdf = pd.DataFrame(recs).astype({"turn_idx": "int32"})
        pdf["ts"] = pd.Series(pd.NaT, index=pdf.index, dtype="datetime64[us]")
        pdf.to_parquet(p)
        os.utime(p, (1_700_000_000 + fi, 1_700_000_000 + fi))

    tbl = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4
    )
    pipe = CdcPipeline(
        tbl, str(feed_dir), normalize=False, row_image="minimal"
    )
    pipe.run_stream(spark, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in tbl.read(spark).collect()
    }
    state: dict[tuple, dict] = {}
    for op, key, patch, present in events:
        if op == "D":
            state.pop(key, None)
            continue
        row = state.get(key) or {c: None for c in cols}
        for c in present:
            row[c] = patch[c]
        state[key] = row
    want = {k: tuple(v[c] for c in cols) for k, v in state.items()}
    assert got == want


def test_pipeline_minimal_rejects_raw(spark, tmp_path):
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    tbl = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=2
    )
    with pytest.raises(ValueError, match="minimal"):
        CdcPipeline(tbl, str(tmp_path), raw=True, row_image="minimal")


def test_fold_plan_has_partial_aggregation(spark):
    """The fold must plan map-side combine (partial_max BEFORE the exchange)
    and no window: hot keys collapse inside scan tasks at 10^10 events.
    (Struct-typed max uses SortAggregate — the partial/final split, not the
    agg implementation, is the scale property.)"""
    df = spark.createDataFrame([], SCHEMA)
    plan = fold_partial_images(df, ["id"], ["name", "score"])._jdf.queryExecution(
    ).executedPlan().toString()
    pre_exchange = plan.split("Exchange hashpartitioning")[-1]
    assert "partial_max" in pre_exchange
    assert "Window" not in plan


def test_pipeline_noblob_stream_equals_sequential_apply(spark, tmp_path):
    """binlog_row_image=NOBLOB end to end: every image re-sends ALL non-blob
    columns (their current values), blob/text columns appear only when
    changed — the exact presence pattern the server emits under NOBLOB.
    A strict subset case of the partial-image path; this proves the mode
    alias routes correctly and re-sent unchanged values are harmless."""
    import os
    import pandas as pd
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    cols = ["role", "text", "tool"]
    blob_cols = {"text", "tool"}  # TEXT-typed in the transcript schema
    state: dict[tuple, dict] = {}
    events = []
    for lsn in range(1, 241):
        key = (f"c{(lsn * 5) % 11}", lsn % 4)
        m = lsn % 8
        if m == 0:
            events.append(("D", key, {}, []))
            state.pop(key, None)
            continue
        if m in (1, 2) or key not in state:
            row = {"role": f"r{lsn % 3}", "text": f"t{lsn}", "tool": None}
            events.append(("I", key, dict(row), list(cols)))
            state[key] = row
            continue
        row = dict(state[key])
        if m in (3, 4):
            changed = {"text": f"edit{lsn}"}
        elif m == 5:
            changed = {"tool": f"bash{lsn}", "role": f"r{lsn % 3}"}
        else:
            changed = {"tool": None}  # blob set to explicit NULL
        row.update(changed)
        # NOBLOB image: all non-blob cols (current values) + changed blobs
        present = [c for c in cols if c not in blob_cols or c in changed]
        events.append(("U", key, {c: row[c] for c in present}, present))
        state[key] = row

    feed_dir = tmp_path / "feed"
    (feed_dir / "data").mkdir(parents=True)
    per_file = 80
    for fi in range(3):
        chunk = events[fi * per_file : (fi + 1) * per_file]
        recs = []
        for i, (op, (cid, tix), patch, present) in enumerate(chunk):
            recs.append(
                {
                    "op": op,
                    "conv_id": cid,
                    "turn_idx": tix,
                    "role": patch.get("role"),
                    "text": patch.get("text"),
                    "tool": patch.get("tool"),
                    "ts": None,
                    "source_lsn": fi * per_file + i + 1,
                    "binlog_file": "bin.000001",
                    "binlog_pos": fi * per_file + i + 1,
                    "_present": list(present),
                }
            )
        p = str(feed_dir / "data" / f"part-{fi:03d}.parquet")
        pdf = pd.DataFrame(recs).astype({"turn_idx": "int32"})
        pdf["ts"] = pd.Series(pd.NaT, index=pdf.index, dtype="datetime64[us]")
        pdf.to_parquet(p)
        os.utime(p, (1_700_000_000 + fi, 1_700_000_000 + fi))

    tbl = LakeTable.create(
        str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4
    )
    pipe = CdcPipeline(tbl, str(feed_dir), normalize=False, row_image="noblob")
    pipe.run_stream(spark, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in tbl.read(spark).collect()
    }
    want = {k: tuple(v[c] for c in cols) for k, v in state.items()}
    assert got == want


def test_pipeline_noblob_rejects_history_table(spark, tmp_path):
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.operators.scd2 import create_history_table
    from mysql_secure_agent_spark.schemas import PRIMARY_KEY, TRANSCRIPT_SCHEMA
    from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

    tbl = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, PRIMARY_KEY, n_buckets=4
    )
    hist = create_history_table(str(tmp_path / "h"), TRANSCRIPT_SCHEMA, PRIMARY_KEY)
    with pytest.raises(ValueError, match="noblob"):
        CdcPipeline(tbl, str(tmp_path), row_image="noblob", history_table=hist)
