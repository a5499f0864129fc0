"""Table integrity checker (lake/fsck.py): clean tables verify, every
corruption class is named (missing file, size drift, undecodable bloom,
broken manifest reference), and the deep tier catches what the shallow
tier cannot — manifest lsn claims contradicted by footers and bloom
false negatives that would silently break point lookups."""

import base64
import json
import os
import zlib

import pyspark.sql.types as T
from pyspark.sql import functions as F

from mysql_secure_agent_spark.lake.fsck import verify
from mysql_secure_agent_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    tbl = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=4)
    df = spark.createDataFrame(
        [("U", i, f"v{i}", i) for i in range(40)],
        "op string, id long, v string, source_lsn long",
    )
    tbl.merge(spark, df, "b1")
    tbl.merge(
        spark,
        spark.createDataFrame(
            [("U", i, f"w{i}", 100 + i) for i in range(10)],
            "op string, id long, v string, source_lsn long",
        ),
        "b2",
    )
    return tbl


def _first_file(tbl):
    c = tbl.commit_at()
    for _, es in sorted(c.files.items()):
        for e in es:
            return os.path.join(tbl.root, e["path"])
    raise AssertionError("no files")


def test_clean_table_verifies(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    r = verify(tbl)
    assert r["ok"], r["errors"]
    assert r["checked"]["files"] > 0 and r["checked"]["commits"] >= 2
    rd = verify(tbl, spark=spark, deep=True)
    assert rd["ok"], rd["errors"]


def test_missing_and_resized_files_detected(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    p = _first_file(tbl)
    data = open(p, "rb").read()
    os.remove(p)
    r = verify(tbl)
    assert not r["ok"] and any("missing on disk" in e for e in r["errors"])
    with open(p, "wb") as f:
        f.write(data + b"x")  # size drift
    r = verify(tbl)
    assert not r["ok"] and any("size" in e for e in r["errors"])


def test_undecodable_bloom_and_bad_manifest_ref(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    c = tbl.commit_at(resolve=False)
    mname = c.manifests[0]
    mpath = tbl._manifest_path(mname)
    m = json.loads(open(mpath).read())
    for es in m["add"].values():
        for e in es:
            if "key_bloom" in e:
                e["key_bloom"]["z"] = "!!!notbase64!!!"
    open(mpath, "w").write(json.dumps(m))
    if hasattr(tbl, "_manifest_cache"):
        tbl._manifest_cache.clear()
    r = verify(tbl)
    assert not r["ok"] and any("bloom undecodable" in e for e in r["errors"])
    os.remove(mpath)
    r = verify(tbl)
    assert not r["ok"]


def test_deep_catches_bloom_false_negative_and_lsn_drift(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    c = tbl.commit_at(resolve=False)
    mpath = tbl._manifest_path(c.manifests[0])
    m = json.loads(open(mpath).read())
    # swap in an EMPTY bloom (all keys become false negatives) and shrink
    # one lsn claim so the footer contradicts it
    empty = base64.b64encode(zlib.compress(bytes(4096))).decode()
    poisoned = 0
    for es in m["add"].values():
        for e in es:
            if "key_bloom" in e and not poisoned:
                e["key_bloom"]["z"] = empty
                if e.get("lsn_max") is not None:
                    e["lsn_max"] = e["lsn_min"] - 1 if e["lsn_min"] else 0
                poisoned = 1
    assert poisoned
    open(mpath, "w").write(json.dumps(m))
    if hasattr(tbl, "_manifest_cache"):
        tbl._manifest_cache.clear()
    r = verify(tbl, spark=spark, deep=True)
    assert not r["ok"]
    assert any("FALSE NEGATIVE" in e for e in r["errors"]), r["errors"]


def test_fsck_method_delegate(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    assert tbl.fsck()["ok"]
    assert tbl.fsck(spark=spark, deep=True)["ok"]
