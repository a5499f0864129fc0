"""Unit tests: anonymization (golden vectors), config selection, keyset
pagination, binary row-image decode, text analysis."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mysql_secure_agent_spark.config import ColumnConfig, Config, SchemaConfig, TableConfig
from mysql_secure_agent_spark.functions.anonymize import anonymize, anonymize_col
from mysql_secure_agent_spark.functions.decode import (
    decode_payload_block,
    decode_raw_feed,
    encode_frame,
    encode_row,
)
from mysql_secure_agent_spark.functions.text_analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from mysql_secure_agent_spark.operators.keyset import keyset_after, page_after, snapshot_pages
from mysql_secure_agent_spark.schemas import RAW_CHANGELOG_SCHEMA


# --------------------------------------------------------------- anonymize P4
def test_anonymize_golden_vectors(spark):
    """Reference golden vectors: UpdaterSpec.java:183-202 — salt 'sodium
    chloride' PREPENDED (Updater.java:111, Hash.java:22-30)."""
    df = spark.createDataFrame([("1",), ("2",)], "v string")
    got = [r[0] for r in df.select(anonymize_col("v", "sodium chloride")).collect()]
    assert got == [
        "AnZXUjEr5i2a57kXUtI6dXftv+E=",
        "jUdn9gOx372QFiYR9zRyZp0VQEw=",
    ]


def test_anonymize_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("x",)], "v string")
    got = [r[0] for r in df.select(anonymize_col("v", "s")).collect()]
    assert got[0] is None and got[1] is not None


def test_anonymize_df_only_listed_columns(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    out = anonymize(df, ["y", "missing"], "salt").collect()[0]
    assert out["x"] == "a" and out["y"] != "b"


# ------------------------------------------------------------------ config P1
def test_config_column_selection_semantics():
    """Config.columnsToSync semantics — config/Config.java:44-65,
    ConfigSpec.java:148-179: explicit flag wins, default for the rest."""
    tc = TableConfig(
        select_other_columns=True,
        columns={"secret": ColumnConfig(selected=False), "text": ColumnConfig()},
    )
    assert tc.selected_columns(["conv_id", "secret", "text"]) == ["conv_id", "text"]
    tc2 = TableConfig(
        select_other_columns=False,
        columns={"conv_id": ColumnConfig(selected=True)},
    )
    assert tc2.selected_columns(["conv_id", "text"]) == ["conv_id"]


def test_config_table_selection_semantics():
    """Table/schema include-exclude — config/Config.java:67-79,
    ConfigSpec.java:77-146."""
    cfg = Config(
        schemas={
            "s1": SchemaConfig(
                selected=True,
                select_other_tables=False,
                tables={"t1": TableConfig(selected=True)},
            ),
            "s2": SchemaConfig(selected=False),
        },
        select_other_schemas=True,
    )
    assert cfg.table_selected("s1", "t1")
    assert not cfg.table_selected("s1", "t2")  # select_other_tables=False
    assert not cfg.table_selected("s2", "anything")  # schema deselected
    assert cfg.table_selected("s3", "t")  # select_other_schemas default


def test_config_json_roundtrip_and_hash_cols():
    cfg = Config.from_json(
        '{"crypto_salt": "sodium chloride", "schemas": {"s": {"tables": {"t": '
        '{"columns": {"text": {"hash": true}, "x": {"selected": false}}}}}}}'
    )
    tc = cfg.table_config("s", "t")
    assert cfg.crypto_salt == "sodium chloride"
    assert tc.hashed_columns(["text", "x"]) == ["text"]
    assert tc.selected_columns(["text", "x", "other"]) == ["text", "other"]


# ------------------------------------------------------------------ keyset S2
def test_keyset_predicate_matches_lexicographic_order(spark):
    rows = [(a, b) for a in range(5) for b in range(5)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = sorted(
        (r["a"], r["b"])
        for r in df.filter(keyset_after(["a", "b"], [2, 3])).collect()
    )
    assert got == sorted(t for t in rows if t > (2, 3))


def test_snapshot_pages_cover_everything_in_order(spark):
    rows = [(i % 7, i) for i in range(53)]
    df = spark.createDataFrame(rows, "a int, b int")
    seen = []
    for page in snapshot_pages(df, ["a", "b"], page_size=10):
        page_rows = page.orderBy("a", "b").collect()  # test-side inspection only
        assert len(page_rows) <= 10
        seen.extend((r["a"], r["b"]) for r in page_rows)
    assert seen == sorted(rows)  # full coverage, keyset order, no dups


def test_page_after_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "a int")
    page = page_after(df, ["a"], [41], 5).collect()
    assert [r["a"] for r in page] == [42, 43, 44, 45, 46]


# ------------------------------------------------------------------ decode S9
def test_decode_roundtrip_block():
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c2", None, "c4"],
            "turn_idx": [0, 5, None, -3],
            "role": ["user", None, "tool", "assistant"],
            "text": ["héllo wörld", "", None, "x" * 70000],  # >64KiB text
            "tool": [None, "search", None, "browser"],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:01", "2026-01-02", None, "1999-12-31 23:59:59"],
                format="mixed",
            ),
        }
    )
    payload = encode_frame(pdf)
    out = decode_payload_block(payload)
    assert out["conv_id"].tolist()[:2] == ["c1", "c2"]
    assert out["conv_id"][2] is None
    assert out["turn_idx"].tolist()[:2] == [0, 5]
    assert pd.isna(out["turn_idx"][2])
    assert out["turn_idx"][3] == -3  # sign-extension (RowParser.java:188-189 analog)
    assert out["text"][0] == "héllo wörld"
    assert out["text"][1] == ""  # empty string ≠ null
    assert out["text"][2] is None
    assert len(out["text"][3]) == 70000
    assert out["ts"][0] == pd.Timestamp("2026-01-01 00:00:01")
    assert pd.isna(out["ts"][2])


def test_decode_raw_feed_spark(spark):
    rows = [
        ("I", encode_row("c1", 0, "user", "hi", None, 1_700_000_000_000_000), 1, "f1", 4),
        ("U", encode_row("c1", 0, "user", "hi v2", "search", 1_700_000_001_000_000), 2, "f1", 5),
        ("D", encode_row("c1", 1, None, None, None, None), 3, "f1", 6),
    ]
    raw = spark.createDataFrame(rows, RAW_CHANGELOG_SCHEMA)
    out = decode_raw_feed(raw).orderBy("source_lsn").collect()
    assert [r["text"] for r in out] == ["hi", "hi v2", None]
    assert [r["turn_idx"] for r in out] == [0, 0, 1]
    assert out[1]["tool"] == "search"
    assert out[0]["op"] == "I" and out[2]["op"] == "D"


# ----------------------------------------------------------- text analysis
def test_token_counts(spark):
    df = spark.createDataFrame([("one two  three",), ("",), ("a-b c3",)], "text string")
    got = df.select(
        token_count().alias("wc"), bpe_ish_token_count().alias("bc")
    ).collect()
    assert [r["wc"] for r in got] == [3, 0, 2]
    assert got[2]["bc"] == 5  # a, -, b, c, 3


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in a house",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy plugh",),
        ],
        "text string",
    )
    got = df.select(lang_id().alias("l"), quality_score().alias("q")).collect()
    assert [r["l"] for r in got] == ["en", "de", "und"]
    assert all(0.0 <= r["q"] <= 1.0 for r in got)


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma",), ("gamma beta  alpha",), ("alpha beta delta",)],
        "text string",
    )
    f = [r[0] for r in df.select(doc_fingerprint()).collect()]
    assert f[0] == f[1] and f[0] != f[2]
