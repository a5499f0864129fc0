"""PARTIAL_UPDATE_ROWS_EVENT (0x27, binlog_row_value_options=PARTIAL_JSON,
WL#2955): JSON diff vector decode + application. The reference predates the
event type (it would hit the discard branch, BinlogClient.java:191-195);
layouts follow the public MySQL source (sql/json_diff.cc write_binary,
Rows_log_event::unpack_current_row)."""

from __future__ import annotations

import json

import pytest

from mysql_secure_agent_spark.functions.json_binary import (
    encode_json_binary,
    parse_json_binary,
)
from mysql_secure_agent_spark.functions.json_patch import (
    DIFF_INSERT,
    DIFF_REMOVE,
    DIFF_REPLACE,
    JsonPatchError,
    apply_json_diffs,
    parse_json_path,
)
from mysql_secure_agent_spark.sources.binlog_packets import (
    PARTIAL_UPDATE_ROWS_EVENT,
    TABLE_MAP_EVENT,
    parse_event_body,
)


# ----------------------------------------------------------------- paths
def test_parse_json_path():
    assert parse_json_path("$") == []
    assert parse_json_path("$.a") == ["a"]
    assert parse_json_path("$.a.b[3].c") == ["a", "b", 3, "c"]
    assert parse_json_path('$."key with space"[0]') == ["key with space", 0]
    assert parse_json_path('$."k\\"q"') == ['k"q']
    for bad in ("a.b", "$.", "$[*]", "$.a[1:2]", "$**.b"):
        with pytest.raises(JsonPatchError):
            parse_json_path(bad)


# ----------------------------------------------------------------- apply
def test_apply_replace_insert_remove():
    doc = {"a": 1, "b": [10, 20, 30], "c": {"d": "x"}}
    out = apply_json_diffs(
        doc,
        [
            (DIFF_REPLACE, "$.a", 2),
            (DIFF_INSERT, "$.b[1]", 15),
            (DIFF_REMOVE, "$.c.d", None),
            (DIFF_INSERT, "$.e", [1, 2]),
        ],
    )
    assert out == {"a": 2, "b": [10, 15, 20, 30], "c": {}, "e": [1, 2]}
    # original untouched
    assert doc == {"a": 1, "b": [10, 20, 30], "c": {"d": "x"}}


def test_apply_array_semantics():
    # insert past the end appends (Json_array::insert_alias)
    assert apply_json_diffs([1], [(DIFF_INSERT, "$[9]", 7)]) == [1, 7]
    assert apply_json_diffs([1, 2], [(DIFF_REMOVE, "$[0]", None)]) == [2]
    assert apply_json_diffs({"a": []}, [(DIFF_INSERT, "$.a[0]", "x")]) == {
        "a": ["x"]
    }


def test_apply_root_replace_and_empty():
    assert apply_json_diffs({"a": 1}, [(DIFF_REPLACE, "$", [9])]) == [9]
    assert apply_json_diffs({"a": 1}, []) == {"a": 1}


def test_apply_errors_are_loud():
    with pytest.raises(JsonPatchError):
        apply_json_diffs({}, [(DIFF_REPLACE, "$.missing", 1)])
    with pytest.raises(JsonPatchError):
        apply_json_diffs({"a": 1}, [(DIFF_INSERT, "$.a", 2)])  # exists
    with pytest.raises(JsonPatchError):
        apply_json_diffs({"a": 1}, [(DIFF_REMOVE, "$.b", None)])
    with pytest.raises(JsonPatchError):
        apply_json_diffs([], [(DIFF_REPLACE, "$[0]", 1)])


# ------------------------------------------------------------- wire layer
def _packed(n: int) -> bytes:
    assert n < 0xFB
    return bytes([n])


def _tmap_json() -> bytes:
    # table 9: (id LONG, doc JSON(meta=4))
    return (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + bytes([1]) + b"s\x00" + bytes([1]) + b"t\x00"
        + _packed(2) + bytes([0x03, 0xF5])
        + _packed(1) + bytes([4])  # JSON pack length
        + bytes([0x03])
    )


def _diff_bytes(op: int, path: str, value=None) -> bytes:
    out = bytes([op]) + _packed(len(path)) + path.encode()
    if op != DIFF_REMOVE:
        vb = encode_json_binary(value)
        out += _packed(len(vb)) + vb
    return out


def _full_img(i: int, doc) -> bytes:
    jb = encode_json_binary(doc)
    return (
        bytes([0])  # null bitmap
        + i.to_bytes(4, "little", signed=True)
        + len(jb).to_bytes(4, "little")
        + jb
    )


def _partial_img(i: int, diffs: bytes, value_options: int = 1,
                 partial_bitmap: bytes = b"\x01") -> bytes:
    return (
        _packed(value_options)
        + (partial_bitmap if value_options & 1 else b"")
        + bytes([0])  # null bitmap
        + i.to_bytes(4, "little", signed=True)
        + len(diffs).to_bytes(4, "little")
        + diffs
    )


def _partial_event(rows: list[bytes]) -> bytes:
    return (
        (9).to_bytes(6, "little") + b"\x00\x00"
        + (2).to_bytes(2, "little")
        + _packed(2) + bytes([0x03]) + bytes([0x03])  # both bitmaps: id+doc
        + b"".join(rows)
    )


def test_partial_update_materializes_diffs():
    maps = {}
    parse_event_body(_tmap_json(), TABLE_MAP_EVENT, maps)
    before = {"t": "signup", "v": 1.5, "tags": ["a", "b"]}
    diffs = (
        _diff_bytes(DIFF_REPLACE, "$.v", 2.25)
        + _diff_bytes(DIFF_INSERT, "$.tags[1]", "mid")
        + _diff_bytes(DIFF_REMOVE, "$.t")
    )
    body = _partial_event([_full_img(7, before) + _partial_img(7, diffs)])
    ev = parse_event_body(body, PARTIAL_UPDATE_ROWS_EVENT, maps)
    assert ev.kind == "update"
    assert json.loads(ev.old_rows[0][1]) == before
    assert json.loads(ev.new_rows[0][1]) == {
        "v": 2.25,
        "tags": ["a", "mid", "b"],
    }


def test_partial_update_empty_diff_keeps_before():
    maps = {}
    parse_event_body(_tmap_json(), TABLE_MAP_EVENT, maps)
    before = {"k": 1}
    body = _partial_event([_full_img(1, before) + _partial_img(1, b"")])
    ev = parse_event_body(body, PARTIAL_UPDATE_ROWS_EVENT, maps)
    assert json.loads(ev.new_rows[0][1]) == before


def test_partial_update_value_options_zero_is_full_doc():
    maps = {}
    parse_event_body(_tmap_json(), TABLE_MAP_EVENT, maps)
    after = {"full": True}
    body = _partial_event(
        [_full_img(1, {"old": 1})
         + _packed(0)  # value_options without PARTIAL_JSON bit
         + _full_img(1, after)]
    )
    ev = parse_event_body(body, PARTIAL_UPDATE_ROWS_EVENT, maps)
    assert json.loads(ev.new_rows[0][1]) == after


def test_partial_update_multi_row():
    maps = {}
    parse_event_body(_tmap_json(), TABLE_MAP_EVENT, maps)
    rows = []
    for i in range(3):
        before = {"n": i}
        rows.append(
            _full_img(i, before)
            + _partial_img(i, _diff_bytes(DIFF_REPLACE, "$.n", i * 10))
        )
    ev = parse_event_body(_partial_event(rows), PARTIAL_UPDATE_ROWS_EVENT, maps)
    assert [json.loads(r[1])["n"] for r in ev.new_rows] == [0, 10, 20]
    assert [r[0] for r in ev.new_rows] == [0, 1, 2]


def test_partial_against_null_before_raises():
    maps = {}
    parse_event_body(_tmap_json(), TABLE_MAP_EVENT, maps)
    null_before = bytes([2]) + (1).to_bytes(4, "little", signed=True)  # doc NULL
    body = _partial_event(
        [null_before + _partial_img(1, _diff_bytes(DIFF_REPLACE, "$.x", 1))]
    )
    with pytest.raises(ValueError, match="NULL before-image"):
        parse_event_body(body, PARTIAL_UPDATE_ROWS_EVENT, maps)


def test_encode_json_binary_roundtrip():
    cases = [
        None, True, False, 7, -5, 40000, -(2 ** 33), 3.5, "", "héllo",
        {"a": 1, "b": [True, None, "x"]},
        [[1, 2], {"k": {"n": 0.25}}],
    ]
    for c in cases:
        assert json.loads(parse_json_binary(encode_json_binary(c))) == c


# --------------------------------------------- MINIMAL merge-time apply
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from mysql_secure_agent_spark.functions.json_patch import (  # noqa: E402
    apply_serialized_patches,
)
from mysql_secure_agent_spark.operators.partial_image import (  # noqa: E402
    fold_partial_images,
    resolve_against_base,
)

FOLD_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("doc", T.StringType()),
        T.StructField("doc_patch", T.StringType()),
        T.StructField("source_lsn", T.LongType()),
        T.StructField("_present", T.ArrayType(T.StringType())),
    ]
)


def _p(*diffs) -> str:
    return json.dumps([list(d) for d in diffs])


def _fold_rows(spark, rows):
    df = spark.createDataFrame(rows, FOLD_SCHEMA)
    out = fold_partial_images(
        df, ["id"], ["doc"], json_patch_cols=["doc"]
    ).collect()
    return {r["id"]: r.asDict() for r in out}


def test_fold_patch_composition(spark):
    out = _fold_rows(
        spark,
        [
            # key 1: full image then two patches → patches survive, ordered
            ("I", 1, '{"a":1}', None, 10, ["doc"]),
            ("U", 1, None, _p((DIFF_REPLACE, "$.a", 2)), 11, []),
            ("U", 1, None, _p((DIFF_INSERT, "$.b", 9)), 12, []),
            # key 2: patches only → apply against base
            ("U", 2, None, _p((DIFF_REPLACE, "$.x", 5)), 20, []),
            # key 3: patch, then delete, then full, then patch:
            # pre-delete patch void, post-full patch survives
            ("U", 3, None, _p((DIFF_REPLACE, "$.k", 0)), 30, []),
            ("D", 3, None, None, 31, []),
            ("I", 3, '{"k":1}', None, 32, ["doc"]),
            ("U", 3, None, _p((DIFF_REPLACE, "$.k", 7)), 33, []),
        ],
    )
    assert out[1]["doc"] == '{"a":1}' and out[1]["doc_set"]
    assert out[1]["doc_patches"] == [
        _p((DIFF_REPLACE, "$.a", 2)), _p((DIFF_INSERT, "$.b", 9))
    ]
    assert not out[2]["doc_set"] and out[2]["doc_patches"] == [
        _p((DIFF_REPLACE, "$.x", 5))
    ]
    assert out[3]["doc"] == '{"k":1}' and not out[3]["_base_applies"]
    assert out[3]["doc_patches"] == [_p((DIFF_REPLACE, "$.k", 7))]


def test_resolve_applies_patches(spark):
    df = spark.createDataFrame(
        [
            ("I", 1, '{"a":1}', None, 10, ["doc"]),
            ("U", 1, None, _p((DIFF_REPLACE, "$.a", 2)), 11, []),
            ("U", 2, None, _p((DIFF_INSERT, "$.y", True)), 20, []),
        ],
        FOLD_SCHEMA,
    )
    folded = fold_partial_images(df, ["id"], ["doc"], json_patch_cols=["doc"])
    base = spark.createDataFrame(
        [(2, '{"x":0}'), (9, '{"z":1}')], "id long, doc string"
    )
    got = {
        r["id"]: r["doc"]
        for r in resolve_against_base(
            folded, base, ["id"], ["doc"], json_patch_cols=["doc"]
        ).collect()
    }
    # key 1: in-batch full image + patch; key 2: base image + patch
    assert json.loads(got[1]) == {"a": 2}
    assert json.loads(got[2]) == {"x": 0, "y": True}


def test_resolve_patch_against_missing_base_raises(spark):
    df = spark.createDataFrame(
        [("U", 5, None, _p((DIFF_REPLACE, "$.a", 1)), 1, [])], FOLD_SCHEMA
    )
    folded = fold_partial_images(df, ["id"], ["doc"], json_patch_cols=["doc"])
    base = spark.createDataFrame([], "id long, doc string")
    out = resolve_against_base(folded, base, ["id"], ["doc"],
                               json_patch_cols=["doc"])
    with pytest.raises(Exception, match="missing/NULL document"):
        out.collect()


def test_merge_partial_json_cross_batch(spark, tmp_path):
    """Patches split across micro-batches apply against the merged base:
    batch 0 inserts full docs, batches 1-2 ship only diffs; final state
    equals a sequential python replay of the same patch stream."""
    from mysql_secure_agent_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("doc", T.StringType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["id"], n_buckets=4)

    docs = {i: {"n": i, "tags": []} for i in range(20)}
    batches: list[list] = [[], [], []]
    lsn = 0
    for i in range(20):
        lsn += 1
        batches[0].append(("I", i, json.dumps(docs[i]), None, lsn, ["doc"]))
    replay = {i: json.dumps(docs[i]) for i in docs}
    rng_ops = []
    for b in (1, 2):
        for i in range(20):
            lsn += 1
            diffs = [
                (DIFF_REPLACE, "$.n", i * 100 + b),
                (DIFF_INSERT, "$.tags[0]", f"b{b}"),
            ]
            p = _p(*diffs)
            batches[b].append(("U", i, None, p, lsn, []))
            rng_ops.append((i, p))
            replay[i] = apply_serialized_patches(replay[i], [p])
    for bi, rows in enumerate(batches):
        tbl.merge_partial(spark, spark.createDataFrame(rows, FOLD_SCHEMA),
                          f"jp-{bi}")
    got = {r["id"]: r["doc"] for r in tbl.read(spark).collect()}
    assert {k: json.loads(v) for k, v in got.items()} == {
        k: json.loads(v) for k, v in replay.items()
    }


def test_wire_minimal_partial_json_to_merge(spark, tmp_path):
    """Full wire→lake path under binlog_row_image=MINIMAL: the before-image
    carries only the PK, so the decoder cannot materialize — it emits
    {col}_patch and merge_partial applies the diffs against base."""
    from mysql_secure_agent_spark.lake.table import LakeTable
    from mysql_secure_agent_spark.sources.binlog_packets import (
        EXT_WRITE_ROWS,
        packets_to_changelog,
    )

    def write_img(i, doc):
        jb = encode_json_binary(doc)
        return (
            bytes([0]) + i.to_bytes(4, "little", signed=True)
            + len(jb).to_bytes(4, "little") + jb
        )

    def write_ev(img):
        return (
            (9).to_bytes(6, "little") + b"\x00\x00"
            + (2).to_bytes(2, "little") + _packed(2) + bytes([0x03]) + img
        )

    def min_update_ev(i, diffs):
        # before bitmap: id only (0x01); after bitmap: id+doc (0x03)
        before = bytes([0]) + i.to_bytes(4, "little", signed=True)
        after = (
            _packed(1) + b"\x01" + bytes([0])
            + i.to_bytes(4, "little", signed=True)
            + len(diffs).to_bytes(4, "little") + diffs
        )
        return (
            (9).to_bytes(6, "little") + b"\x00\x00"
            + (2).to_bytes(2, "little") + _packed(2)
            + bytes([0x01]) + bytes([0x03]) + before + after
        )

    packets = [
        (TABLE_MAP_EVENT, _tmap_json()),
        (EXT_WRITE_ROWS, write_ev(write_img(1, {"s": "a", "hits": 0}))),
        (PARTIAL_UPDATE_ROWS_EVENT, min_update_ev(
            1, _diff_bytes(DIFF_REPLACE, "$.hits", 1))),
        (PARTIAL_UPDATE_ROWS_EVENT, min_update_ev(
            1, _diff_bytes(DIFF_INSERT, "$.new", "x")
            + _diff_bytes(DIFF_REMOVE, "$.s"))),
    ]
    cl = packets_to_changelog(packets, "s", "t", ["id", "doc"],
                              emit_presence=True)
    assert "doc_patch" in cl.columns
    assert cl["doc_patch"].notna().sum() == 2

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("doc", T.StringType(), True),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "t"), schema, ["id"], n_buckets=2)
    sdf = spark.createDataFrame(
        [tuple(r) for r in cl[["op", "id", "doc", "doc_patch",
                               "source_lsn", "_present"]].itertuples(index=False)],
        FOLD_SCHEMA,
    )
    tbl.merge_partial(spark, sdf, "w0")
    got = json.loads(tbl.read(spark).collect()[0]["doc"])
    assert got == {"hits": 1, "new": "x"}
