"""Schema-driven raw-feed CDC: a non-transcript MySQL-typed table (decimal /
date / enum / blob columns) flows through the SAME pipeline — binary row
images → columnar codec decode (mysql_codecs) → dedup → bucketed merge —
and converges to the sequential-replay state. This is the general form of
the S9 path: the reference decodes ANY TABLE_MAP schema
(RowParser.java:115-168), not just one fixed table.
"""

import datetime as dt
import os
from decimal import Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.types as T

from mysql_secure_agent_spark.functions.mysql_codecs import (
    BLOB, DATE, ENUM, LONGLONG, NEWDECIMAL, VARCHAR, VECTOR,
    ColumnSpec, encode_typed_rows,
)
from mysql_secure_agent_spark.lake.table import LakeTable
from mysql_secure_agent_spark.streaming.pipeline import CdcPipeline

CODEC_SCHEMA = [
    ColumnSpec("acct_id", LONGLONG),
    ColumnSpec("amt", NEWDECIMAL, {"precision": 12, "scale": 2}),
    ColumnSpec("opened", DATE),
    ColumnSpec("status", ENUM, {"labels": ["new", "active", "closed"]}),
    ColumnSpec("note", VARCHAR, {"max_len": 100}),
    ColumnSpec("doc", BLOB, {"len_bytes": 2}),
    # MySQL 9.0 VECTOR: embedding column riding the same CDC feed
    ColumnSpec("emb", VECTOR),
]

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("acct_id", T.LongType(), False),
        T.StructField("amt", T.DecimalType(12, 2), True),
        T.StructField("opened", T.DateType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("note", T.StringType(), True),
        T.StructField("doc", T.BinaryType(), True),
        T.StructField("emb", T.ArrayType(T.FloatType(), True), True),
    ]
)


def _events():
    """Deterministic changelog over 40 accounts: inserts, updates, deletes."""
    evs = []
    lsn = 0
    for rnd in range(4):
        for a in range(40):
            lsn += 1
            if rnd == 3 and a % 7 == 0:
                evs.append(("D", {"acct_id": a}, lsn))
                continue
            evs.append(
                (
                    "I" if rnd == 0 else "U",
                    {
                        "acct_id": a,
                        "amt": Decimal(a * 100 + rnd) / 4 * (-1 if a % 5 == 0 else 1),
                        "opened": dt.date(2020, 1, 1) + dt.timedelta(days=a * 10 + rnd),
                        "status": ["new", "active", "closed"][(a + rnd) % 3],
                        "note": None if a % 6 == 0 else f"acct {a} r{rnd}",
                        "doc": bytes([a % 256, rnd]),
                        # exact in float32 so equality asserts are lossless
                        "emb": None if a % 9 == 0 else [float(a), rnd * 0.5, a * 0.25],
                    },
                    lsn,
                )
            )
    return evs


def _write_raw_feed(feed_dir, evs, n_files=4):
    os.makedirs(os.path.join(feed_dir, "data"))
    rows = [e[1] for e in evs]
    payload = encode_typed_rows(CODEC_SCHEMA, rows)
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
    chunk = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        pq.write_table(
            pa.Table.from_pandas(part, schema=schema, preserve_index=False),
            os.path.join(feed_dir, "data", f"feed-{i:05d}.parquet"),
        )


def test_typed_raw_feed_matches_sequential_replay(spark, tmp_path):
    evs = _events()
    feed = str(tmp_path / "feed")
    _write_raw_feed(feed, evs)
    table = LakeTable.create(
        str(tmp_path / "tbl"), TABLE_SCHEMA, ["acct_id"], n_buckets=8
    )
    pipe = CdcPipeline(table, feed, normalize=False, raw_schema=CODEC_SCHEMA)
    pipe.run_stream(spark, str(tmp_path / "ckpt"))

    # sequential dict replay = ground truth
    state = {}
    for op, row, _lsn in evs:
        if op == "D":
            state.pop(row["acct_id"], None)
        else:
            state[row["acct_id"]] = row
    got = table.read(spark).orderBy("acct_id").toPandas()
    assert len(got) == len(state)
    for r in got.to_dict("records"):
        exp = state[r["acct_id"]]
        assert r["amt"] == exp["amt"].quantize(Decimal("0.01"))
        assert r["opened"] == exp["opened"]
        assert r["status"] == exp["status"]
        assert r["note"] == exp["note"]
        assert bytes(r["doc"]) == exp["doc"]
        if exp["emb"] is None:
            assert r["emb"] is None
        else:
            assert list(r["emb"]) == exp["emb"]
